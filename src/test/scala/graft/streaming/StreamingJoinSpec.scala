package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Bson

/** Stream-stream interval join: matches emit exactly once, only
  * within the horizon and the device equi-key, and rows behind the
  * watermark are evicted instead of joining late.
  */
class StreamingJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def env(dev: String, tsMs: Long, off: Long): Envelope =
    Envelope("r", dev, "data", "i.face", "/p", Bson.encode(Seq("v" -> off)),
      tsMs * 10000, "ip", off)

  test("interval join pairs same-device follow-ups inside the horizon only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val triggers = MemoryStream[Envelope]
    val activity = MemoryStream[Envelope]
    val joined = StreamingJoins.followWithin(
      triggers.toDS(), activity.toDS(),
      horizon = "2 hours", lateness = "10 minutes")
    val q = joined.writeStream
      .format("memory").queryName("ssj").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ssj").toString)
      .start()
    try {
      val t0 = 1700000000000L
      triggers.addData(env("devA", t0, 100))
      activity.addData(
        env("devA", t0 + 10 * 60 * 1000, 1), // in-horizon follow-up
        env("devA", t0 - 1000, 2),           // BEFORE the trigger: no match
        env("devA", t0 + 3 * 60 * 60 * 1000, 3), // past the 2h horizon
        env("devB", t0 + 5 * 60 * 1000, 4))  // other device: no match
      q.processAllAvailable()

      val rows = spark.sql(
        "SELECT device_id, trigger_offset, act_offset FROM ssj").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSet == Set(("devA", 100L, 1L)),
        s"expected exactly the in-horizon same-device pair, got ${rows.toList}")
    } finally q.stop()
  }

  test("watermark evicts buffered state: stale activity cannot join late") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val triggers = MemoryStream[Envelope]
    val activity = MemoryStream[Envelope]
    val joined = StreamingJoins.followWithin(
      triggers.toDS(), activity.toDS(),
      horizon = "2 hours", lateness = "10 minutes")
    val q = joined.writeStream
      .format("memory").queryName("ssj2").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ssj2").toString)
      .start()
    try {
      val t0 = 1700000000000L
      // advance BOTH watermarks a day past t0 (each side's watermark
      // is its own max event time minus lateness)
      triggers.addData(env("devA", t0 + 24 * 60 * 60 * 1000, 900))
      activity.addData(env("devA", t0 + 24 * 60 * 60 * 1000 + 1000, 901))
      q.processAllAvailable()
      val afterAdvance = spark.sql("SELECT count(*) FROM ssj2")
        .head().getLong(0)

      // a trigger far BEHIND the watermark: its whole match horizon is
      // already evicted/evictable — fresh in-horizon activity for it
      // must NOT produce the pair (the late trigger is dropped)
      triggers.addData(env("devA", t0, 910))
      activity.addData(env("devA", t0 + 5 * 60 * 1000, 911))
      q.processAllAvailable()

      val rows = spark.sql(
        "SELECT trigger_offset, act_offset FROM ssj2").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(!rows.contains((910L, 911L)),
        s"a trigger behind the watermark must not join: ${rows.toList}")
      // the watermark-advancing pair itself DID join (in horizon)
      assert(rows.contains((900L, 901L)))
      assert(afterAdvance == 1L)
    } finally q.stop()
  }
}
