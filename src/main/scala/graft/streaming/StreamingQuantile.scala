package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming quantile sketch — all-time percentiles over an unbounded
  * stream with STATE BOUNDED BY CONSTRUCTION, the fourth sketch in
  * the [[StreamingSketch]] family (distinct count, frequency, set
  * intersection, now percentiles).
  *
  * The batch quantile sketch ([[graft.queries.QuantileSketch]]) is a
  * fixed-depth merge tree over hash-assigned buffers — a shape that
  * needs the whole input, so unlike HLL/CMS the streaming twin cannot
  * literally reuse the batch builder. It runs the SEQUENTIAL form of
  * the same compaction rule instead (classic KLL/MRL): values land in
  * the level-0 buffer; a level reaching [[Cap]] items sorts by the
  * (v, uid) total order, keeps the odd ranks, and promotes them one
  * level up (weight 2^lvl doubles) — cascading upward. State per
  * group is therefore ≤ Cap·(log2(n/Cap)+2) weighted items BY
  * CONSTRUCTION however many events ever arrive, and total weight
  * tracks the exact count to within ±1 per odd-sized compaction.
  *
  * Determinism: the fold sorts each micro-batch's values before
  * inserting, so a fixed batch sequence produces a bit-identical
  * sketch (the iterator order Spark hands a group is not part of the
  * contract). Order ACROSS batches does affect which items survive —
  * the standard KLL property; the accuracy envelope, not item
  * identity, is the guarantee (pinned in StreamingQuantileSpec
  * alongside the state bound).
  */
object StreamingQuantile {

  /** Per-level buffer capacity (the batch sketch's K). */
  val Cap = 256

  case class KllItem(v: Long, uid: Long, lvl: Int)
  case class KllState(items: Seq[KllItem])
  case class In(g: String, v: Long, uid: Long)
  case class Snapshot(g: String, sk_items: Long, w_tot: Long,
      p50_est: Long, p90_est: Long, p99_est: Long)

  /** One deterministic compaction sweep: any level holding ≥ cap
    * items keeps its odd ranks (by the (v, uid) total order) promoted
    * one level up, cascading until every level is under cap. */
  private[streaming] def compact(all: Seq[KllItem], cap: Int): Seq[KllItem] = {
    val levels = scala.collection.mutable.Map.empty[Int,
      scala.collection.mutable.ArrayBuffer[KllItem]]
    all.foreach { it =>
      levels.getOrElseUpdate(it.lvl,
        scala.collection.mutable.ArrayBuffer.empty[KllItem]) += it
    }
    var l = 0
    var maxL = if (levels.isEmpty) -1 else levels.keysIterator.max
    while (l <= maxL) {
      val buf = levels.getOrElse(l,
        scala.collection.mutable.ArrayBuffer.empty[KllItem])
      if (buf.length >= cap) {
        val kept = buf.sortBy(it => (it.v, it.uid)).zipWithIndex
          .collect { case (it, i) if i % 2 == 0 => // odd 1-based ranks
            KllItem(it.v, it.uid, l + 1) }
        levels(l) = scala.collection.mutable.ArrayBuffer.empty[KllItem]
        levels.getOrElseUpdate(l + 1,
          scala.collection.mutable.ArrayBuffer.empty[KllItem]) ++= kept
        maxL = math.max(maxL, l + 1)
      }
      l += 1
    }
    levels.values.flatten.toVector.sortBy(it => (it.lvl, it.v, it.uid))
  }

  /** Weighted nearest-rank read of the in-state items. */
  private[streaming] def snapshotOf(g: String, items: Seq[KllItem]): Snapshot = {
    val sorted = items.sortBy(it => (it.v, it.uid))
    val wtot = sorted.iterator.map(it => 1L << it.lvl).sum
    def estOf(p: Int): Long = {
      var cum = 0L
      val hit = sorted.find { it => cum += 1L << it.lvl; cum * 100 >= wtot * p }
      hit.map(_.v).getOrElse(0L)
    }
    Snapshot(g, items.length.toLong, wtot, estOf(50), estOf(90), estOf(99))
  }

  private def fold(cap: Int)(g: String, rows: Iterator[In],
      state: GroupState[KllState]): Snapshot = {
    val prev = if (state.exists) state.get.items else Seq.empty[KllItem]
    // sort the batch before inserting — the engine's group-iterator
    // order is not deterministic, the fold's output must be
    val incoming = rows.toVector.sortBy(r => (r.v, r.uid))
      .map(r => KllItem(r.v, r.uid, 0))
    val items = compact(prev ++ incoming, cap)
    state.update(KllState(items))
    snapshotOf(g, items)
  }

  /** Per-group all-time quantile snapshots of a streaming frame with
    * columns (g string, v long, uid long); update output mode. */
  def quantileSnapshots(events: DataFrame, cap: Int = Cap): Dataset[Snapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("g"), col("v"), col("uid")).as[In]
      .groupByKey(_.g)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold(cap))
  }
}
