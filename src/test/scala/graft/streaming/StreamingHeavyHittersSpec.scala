package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MgSummary

/** Streaming heavy hitters: state bounded by construction (≤ cap
  * entries however many distinct keys stream in), exact-regime parity
  * with the one-shot batch cut, MG bounds in the overflow regime, and
  * a deterministic fold for a fixed batch sequence.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def keyOf(i: Long, keys: Int): Long =
    if (i % 4 == 0) 7L else (i * 2654435761L) % 1000003L % keys

  private def runOnce(cap: Int, keys: Int,
      batches: Seq[Range]): (Long, Seq[(Long, Long)]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val snaps = StreamingHeavyHitters.heavySnapshots(
      input.toDS().toDF("g", "k"), cap)
    val name = s"smg_${System.nanoTime()}"
    val q = snaps.writeStream
      .format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-smg").toString)
      .start()
    try {
      batches.foreach { b =>
        input.addData(b.map(i => ("g", keyOf(i.toLong, keys))): _*)
        q.processAllAvailable()
      }
      val last = spark.table(name).collect().last
      (last.getLong(1),
        last.getSeq[Row](2).map(r => (r.getLong(0), r.getLong(1))).toSeq)
    } finally q.stop()
  }

  test("exact regime: streamed heavy cut equals the batch one-shot cut") {
    val keys = 50 // < cap → exact counts in state
    val batches = Seq(0 until 3000, 3000 until 6000, 6000 until 9000)
    val (entries, heavy) = runOnce(cap = 256, keys, batches)
    val exact = (0L until 9000L).map(keyOf(_, keys))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(entries == exact.size.toLong,
      "below-capacity state must hold every distinct key exactly")
    // replay the one-shot cut: t = (K+1)-st largest, survivors above
    val sorted = exact.toSeq.sortBy { case (k, c) => (-c, k) }
    val t = if (sorted.size > MgSummary.K) sorted(MgSummary.K)._2 else 0L
    val want = sorted.takeWhile(_._2 > t).map { case (k, c) => (k, c - t) }
    assert(heavy == want, s"stream cut diverged:\n$heavy\nvs\n$want")
  }

  test("overflow regime: state stays ≤ cap and MG bounds hold") {
    val cap = 64
    val keys = 2000 // ≫ cap
    val n = 12000L
    val batches = Seq(0 until 4000, 4000 until 8000, 8000 until 12000)
    val (entries, heavy) = runOnce(cap, keys, batches)
    assert(entries <= cap, s"state $entries entries exceeds cap $cap")
    val exact = (0L until n).map(keyOf(_, keys))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val eps = n.toDouble / (cap + 1)
    // the heavy cut reports lower bounds: lb ≤ exact, and the one
    // guaranteed-heavy key (7, ~25% of the stream) must be on top
    heavy.foreach { case (k, lb) =>
      assert(lb <= exact(k), s"overcount on $k")
    }
    assert(heavy.headOption.exists(_._1 == 7L),
      s"the dominant key is missing from the cut: $heavy")
    assert(exact(7L) - heavy.head._2 <= 2 * eps,
      "dominant key's lower bound drifted beyond the merge envelope")
  }

  test("a fixed batch sequence reproduces the snapshot bit-identically") {
    val batches = Seq(0 until 2000, 2000 until 5000)
    val a = runOnce(48, 900, batches)
    val b = runOnce(48, 900, batches)
    assert(a == b, s"fold not deterministic: $a vs $b")
  }
}
