package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming HLL: the register state equals the batch registers over
  * everything ever streamed (parity by literal code reuse), and the
  * engine's own state metrics prove the ≤ m bound — all-time distinct
  * counting with no watermark and no growth.
  */
class StreamingSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream registers equal batch registers; state stays within m rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val regs = StreamingSketch.hllRegisters(input.toDS().toDF("user_id"))
    val q = regs.writeStream
      .format("memory").queryName("shll").outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-shll").toString)
      .start()
    try {
      val batch1 = (0L until 400L)
      val batch2 = (300L until 900L) // overlaps batch1 — dups must not matter
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()

      val got = spark.table("shll").collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
      val want = graft.queries.SketchQueries.registersOf(
          (batch1 ++ batch2).toDF("user_id")
            .select(lit("g").as("g"), col("user_id")), "g")
        .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
      assert(got == want, "streaming registers diverged from batch")

      // the engine's own metrics: aggregation state ≤ m = 64 rows
      // after 900 distinct keys
      val stateRows = q.lastProgress.stateOperators.asScala
        .map(_.numRowsTotal).sum
      assert(stateRows <= 64,
        s"sketch state should be bounded by m=64 registers, got $stateRows")
      assert(stateRows > 0, "no state rows reported — metric read is wrong")
    } finally q.stop()
  }

  test("stream CMS counters equal batch counters across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val cms = StreamingSketch.cmsCounters(input.toDS().toDF("user_id"))
    val q = cms.writeStream
      .format("memory").queryName("scms").outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-scms").toString)
      .start()
    try {
      val b1 = (0L until 200L) ++ (0L until 50L) // repeats count, unlike HLL
      val b2 = (100L until 300L)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("scms").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = graft.queries.SketchQueries.cmsOf(
          (b1 ++ b2).toDF("user_id")).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, "streaming counters diverged from batch")
      val stateRows = q.lastProgress.stateOperators.asScala
        .map(_.numRowsTotal).sum
      assert(stateRows <= 512 && stateRows > 0,
        s"CMS state should be bounded by d*w=512 counters, got $stateRows")
    } finally q.stop()
  }

  test("stream tug-of-war sums equal the batch build; state stays within d rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val z = StreamingSketch.amsZ(input.toDS().toDF("user_id"))
    val q = z.writeStream
      .format("memory").queryName("sams").outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sams").toString)
      .start()
    try {
      val batch1 = (0L until 300L).map(_ % 40) // repeated keys: F2 > N
      val batch2 = (0L until 500L).map(i => (i * 7) % 60)
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("sams").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val want = graft.queries.SketchQueries.amsOf(
          (batch1 ++ batch2).toDF("user_id"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == want, "streaming tug-of-war sums diverged from batch")
      assert(got.size == 24, s"expected d=24 sums, got ${got.size}")
      val stateRows = q.lastProgress.stateOperators.asScala
        .map(_.numRowsTotal).sum
      assert(stateRows <= 24,
        s"AMS state should be bounded by d=24 rows, got $stateRows")
    } finally q.stop()
  }

  test("daily registers emit per closed window and match the batch build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val regs = StreamingSketch.dailyHllRegisters(
      input.toDS().toDF("event_time", "user_id"), delay = "1 hour")
    val q = regs.writeStream
      .format("memory").queryName("sdhll").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdhll").toString)
      .start()
    try {
      val day1 = 1700006400000L // some UTC midnight + offset inside day 1
      def ts(ms: Long) = new java.sql.Timestamp(ms)
      val d1Users = (0L until 300L)
      input.addData(d1Users.map(u => (ts(day1 + u), u)): _*)
      q.processAllAvailable()
      assert(spark.table("sdhll").count() == 0,
        "open window must not emit in append mode")
      // day-2 data two days later pushes the watermark past day-1
      input.addData((ts(day1 + 2L * 86400000L), 1L))
      q.processAllAvailable()
      val emitted = spark.table("sdhll").collect()
      assert(emitted.nonEmpty, "day-1 window never closed")
      assert(emitted.map(_.getTimestamp(0)).distinct.length == 1,
        "only the closed day should have emitted")
      val got = emitted.map(r => r.getInt(1) -> r.getInt(2)).toMap
      val want = graft.queries.SketchQueries.registersOf(
          d1Users.toDF("user_id").select(lit("g").as("g"), col("user_id")),
          "g").collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
      assert(got == want, "closed-day registers diverged from batch")
    } finally q.stop()
  }

  private implicit class ArrOps[T](a: Array[T]) {
    def asScala: Seq[T] = a.toSeq
  }
}
