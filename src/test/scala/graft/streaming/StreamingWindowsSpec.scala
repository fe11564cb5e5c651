package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Bson

/** Watermarked event-time windows over the envelope stream: append
  * mode emits a window exactly once after the watermark passes its
  * end + lateness, and data later than the watermark bound is
  * dropped — the semantics that keep streaming state bounded.
  */
class StreamingWindowsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def env(dev: String, tsMs: Long, off: Long): Envelope =
    Envelope("r", dev, "data", "i.face", "/p", Bson.encode(Seq("v" -> off)),
      tsMs * 10000, "ip", off)

  test("tumbling windows finalize on watermark and drop late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Envelope]
    val windowed = StreamingWindows.deviceActivity(
      input.toDS(), windowDuration = "1 minute", lateness = "30 seconds")
    val q = windowed.writeStream
      .format("memory").queryName("wnd").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-wnd").toString)
      .start()
    try {
      val t0 = 1700000000000L // window [t0, t0+60s)
      // 3 messages for devA and 1 for devB inside window 1
      input.addData(env("devA", t0 + 1000, 1), env("devA", t0 + 2000, 2),
        env("devB", t0 + 3000, 3), env("devA", t0 + 4000, 4))
      q.processAllAvailable()
      // nothing emitted yet: watermark has not passed window end
      assert(spark.sql("SELECT count(*) FROM wnd").head().getLong(0) == 0)

      // advance event time far past window1 end + lateness
      input.addData(env("devA", t0 + 10 * 60 * 1000, 5))
      q.processAllAvailable()
      // a LATE straggler for window 1, behind the watermark: dropped
      input.addData(env("devA", t0 + 5000, 6))
      q.processAllAvailable()
      // one more advance so any (incorrectly accepted) late row would flush
      input.addData(env("devA", t0 + 30 * 60 * 1000, 7))
      q.processAllAvailable()

      val rows = spark.sql(
        "SELECT device_id, n_msgs FROM wnd ORDER BY device_id").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // window 1 finalized exactly once with the on-time counts only
      assert(rows.count(_._1 == "devA") >= 1)
      val w1A = rows.filter(_ == ("devA", 3L))
      assert(w1A.length == 1) // 3 on-time msgs; the late 4th was dropped
      assert(rows.contains(("devB", 1L)))
    } finally q.stop()
  }

  test("session windows merge within the gap, split across it, finalize once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Envelope]
    val sessions = StreamingWindows.deviceSessions(
      input.toDS(), gap = "1 minute", lateness = "0 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("sess").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sess").toString)
      .start()
    try {
      val t0 = 1700000000000L
      // burst 1: three events within the 1-min gap of each other;
      // then silence > gap; burst 2: one event
      input.addData(env("devA", t0, 1), env("devA", t0 + 20000, 2),
        env("devA", t0 + 40000, 3))
      q.processAllAvailable()
      input.addData(env("devA", t0 + 5 * 60 * 1000, 4))
      q.processAllAvailable()
      // watermark is still at burst 2's event time - lateness, which
      // is past burst 1's session end -> burst 1 finalized; push the
      // watermark past burst 2's end too
      input.addData(env("devA", t0 + 20 * 60 * 1000, 5))
      q.processAllAvailable()
      input.addData(env("devA", t0 + 40 * 60 * 1000, 6))
      q.processAllAvailable()

      val rows = spark.sql(
        "SELECT session_start, session_end, n_msgs FROM sess ORDER BY session_start")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime,
          r.getLong(2)))
      // burst 1 is ONE session of 3 msgs spanning [t0, last+gap)
      assert(rows.head == ((t0, t0 + 40000 + 60000, 3L)))
      // burst 2 finalized separately (the >gap silence split them)
      assert(rows.exists(r =>
        r._1 == t0 + 5 * 60 * 1000 && r._3 == 1L))
    } finally q.stop()
  }

  test("events exactly one gap apart MERGE into one session (boundary lock)") {
    import spark.implicits._
    // Locks the boundary rule the batch w_session DuckDB oracle
    // encodes: session_window merges gap windows that touch, so a
    // silence of exactly `gap` does NOT split — only > gap does.
    val t0 = 1700000000000L
    val gapMs = 60 * 1000L
    val exact = StreamingWindows.deviceSessions(
      Seq(env("d", t0, 1), env("d", t0 + gapMs, 2)).toDS(),
      gap = "1 minute", lateness = "0 seconds").collect()
    assert(exact.length == 1 && exact.head.getAs[Long]("n_msgs") == 2L)
    val past = StreamingWindows.deviceSessions(
      Seq(env("d", t0, 1), env("d", t0 + gapMs + 1, 2)).toDS(),
      gap = "1 minute", lateness = "0 seconds").collect()
    assert(past.length == 2) // 1ms beyond the gap splits
  }

  test("hopping windows assign each event to overlapping windows") {
    import spark.implicits._
    // batch-mode sanity over the same plan shape (no watermark wait)
    val events = Seq(env("d", 1700000000000L + 90 * 1000, 1)).toDS()
    val rows = StreamingWindows.deviceActivityHopping(
      events, "2 minutes", "1 minute", "0 seconds")
      .collect()
    assert(rows.length == 2) // 2-min window sliding by 1 min → 2 windows
  }
}
