package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Bson

/** Batch/streaming PARITY: the streaming windowed aggregates must
  * produce exactly the rows the equivalent batch aggregation produces
  * on the same (fully on-time) data. This is the property that makes
  * the two surfaces interchangeable — backfill a month in batch,
  * serve today streaming, and the counters agree — and the guard that
  * a watermark/trigger tweak can't silently skew the streaming side.
  */
class StreamingParitySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def env(dev: String, tsMs: Long, off: Long): Envelope =
    Envelope("r", dev, "data", "i.face", "/p", Bson.encode(Seq("v" -> off)),
      tsMs * 10000, "ip", off)

  test("tumbling device-activity: streaming result == batch groupBy on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    // 3 devices, 3 windows, uneven counts; all on time
    val data = (0 until 60).map { i =>
      env(s"dev${i % 3}", t0 + i * 97 * 1000L, i.toLong)
    }

    // streaming pass over the same envelopes (watermark advanced far
    // past every window by a sentinel, whose own window is excluded
    // from the comparison)
    val input = MemoryStream[Envelope]
    val q = StreamingWindows.deviceActivity(
      input.toDS(), windowDuration = "1 minute", lateness = "1 second")
      .writeStream.format("memory").queryName("par").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-par").toString)
      .start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData(env("devZ", t0 + 7 * 24 * 3600 * 1000L, 999L))
      q.processAllAvailable()

      val streaming = spark.sql(
        "SELECT window_start, device_id, n_msgs, n_bytes FROM par " +
        "WHERE device_id != 'devZ'").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1),
          r.getLong(2), r.getLong(3))).toSet

      // the batch twin: identical event-time derivation + aggregation
      val batch = data.toDS().toDF()
        .withColumn("event_time",
          expr("timestamp_micros(receptionDecimicros div 10)"))
        .groupBy(window(col("event_time"), "1 minute"), col("deviceId"))
        .agg(count(lit(1)).as("n_msgs"),
          sum(coalesce(octet_length(col("payload")), lit(0))).as("n_bytes"))
        .select(col("window.start").as("window_start"),
          col("deviceId"), col("n_msgs"), col("n_bytes"))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1),
          r.getLong(2), r.getLong(3))).toSet

      assert(batch.nonEmpty && batch.size > 3)
      assert(streaming == batch,
        s"streaming/batch divergence: only-streaming=${streaming -- batch}, " +
        s"only-batch=${batch -- streaming}")
    } finally q.stop()
  }
}
