package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup: duplicates within the watermark delay
  * collapse to the first occurrence, distinct payloads all pass, and
  * dedup state is evicted past the watermark (bounded memory on an
  * unbounded stream).
  */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def env(payload: String, tsMs: Long, off: Long): Envelope =
    Envelope("r", s"dev-$off", "data", "i.face", "/p",
      payload.getBytes("UTF-8"), tsMs * 10000, "ip", off)

  test("duplicates within the watermark collapse to first occurrence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Envelope]
    val deduped = StreamingDedup.exactDedup(input.toDS(), delay = "1 minute")
    val q = deduped.writeStream
      .format("memory").queryName("sdedup").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdedup").toString)
      .start()
    try {
      val t0 = 1700000000000L
      input.addData(
        env("the same document", t0 + 1000, 1),
        env("the same document", t0 + 2000, 2), // dup, same batch
        env("a different document", t0 + 3000, 3))
      q.processAllAvailable()
      // a dup arriving in a LATER batch, still inside the delay
      input.addData(env("the same document", t0 + 10000, 4))
      q.processAllAvailable()
      // distinct content after the dup window — passes
      input.addData(env("a third document", t0 + 20000, 5))
      q.processAllAvailable()
      // advance the watermark well past t0 + delay (event time drives
      // the watermark; the extra batch lets it commit), evicting the
      // first document's dedup state...
      input.addData(env("watermark pusher", t0 + 600000, 6))
      q.processAllAvailable()
      input.addData(env("watermark pusher 2", t0 + 700000, 7))
      q.processAllAvailable()
      // ...so the SAME payload re-appearing after eviction is emitted
      // again — this is the bounded-memory trade: state (and therefore
      // dup suppression) only spans the watermark delay
      input.addData(env("the same document", t0 + 710000, 8))
      q.processAllAvailable()

      val out = spark.table("sdedup")
        .select("deviceId", "offset").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
      // offsets 2 and 4 (the duplicates) never surface; offset 8 (the
      // post-eviction re-arrival of offset 1's payload) DOES
      assert(out.map(_._2).toSeq == Seq(1L, 3L, 5L, 6L, 7L, 8L))
    } finally q.stop()
  }
}
