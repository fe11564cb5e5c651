package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming quantile sketch: state bounded by construction
  * (≤ Cap·(levels+2) items however much streams in), total weight
  * tracks the exact count, the estimates stay inside a pinned rank
  * envelope against the exact percentiles of everything fed, and the
  * fold is deterministic for a fixed batch sequence.
  */
class StreamingQuantileSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // deterministic pseudo-random values: a Weyl-ish integer walk
  private def valueOf(i: Long): Long = (i * 2654435761L) % 100000L

  private def runOnce(cap: Int, batches: Seq[Range]): Array[(String, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val snaps = StreamingQuantile.quantileSnapshots(
      input.toDS().toDF("g", "v", "uid"), cap)
    val name = s"squant_${System.nanoTime()}"
    val q = snaps.writeStream
      .format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-squant").toString)
      .start()
    try {
      batches.foreach { b =>
        input.addData(b.map(i => ("g", valueOf(i.toLong), i.toLong)): _*)
        q.processAllAvailable()
      }
      // the LAST emitted snapshot per group (update mode re-emits)
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .lastOption.toArray
    } finally q.stop()
  }

  test("state bound, weight fidelity, and rank envelope over 12k streamed values") {
    val cap = 64
    val batches = Seq(0 until 4000, 4000 until 8000, 8000 until 12000)
    val Array((_, skItems, wTot, p50, p90, p99)) = runOnce(cap, batches)
    val n = 12000L

    // state bounded by construction: ≤ cap·(log2(n/cap)+2) items
    val bound = cap * (math.ceil(math.log(n.toDouble / cap) / math.log(2)) + 2)
    assert(skItems <= bound, s"state $skItems items exceeds bound $bound")
    assert(skItems >= cap / 2, s"suspiciously small sketch: $skItems")

    // total weight tracks the exact count (±1 per odd compaction)
    assert(math.abs(wTot - n) <= n / 100,
      s"weight drifted: w_tot=$wTot vs n=$n")

    // rank envelope: each estimate's true rank within 2.5% of target
    val sorted = (0L until n).map(valueOf).sorted
    for ((p, est) <- Seq((50, p50), (90, p90), (99, p99))) {
      val rank = sorted.count(_ <= est).toDouble / n * 100
      assert(math.abs(rank - p) <= 2.5,
        s"p$p estimate $est has true rank $rank%")
    }
  }

  test("a fixed batch sequence reproduces the sketch bit-identically") {
    val batches = Seq(0 until 1000, 1000 until 3000)
    val a = runOnce(32, batches)
    val b = runOnce(32, batches)
    assert(a.sameElements(b), s"fold not deterministic: ${a.toSeq} vs ${b.toSeq}")
  }

  test("the compaction sweep preserves order statistics on a tiny case") {
    import StreamingQuantile.KllItem
    // 8 items at level 0 with cap 8: odd ranks 1,3,5,7 survive at level 1
    val items = (1L to 8L).map(v => KllItem(v, v, 0))
    val out = StreamingQuantile.compact(items, 8)
    assert(out.map(_.v).sorted == Seq(1L, 3L, 5L, 7L))
    assert(out.forall(_.lvl == 1))
    // under cap: untouched
    val small = (1L to 7L).map(v => KllItem(v, v, 0))
    assert(StreamingQuantile.compact(small, 8).toSet == small.toSet)
  }
}
