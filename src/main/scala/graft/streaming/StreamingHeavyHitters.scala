package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.MgSummary

/** Streaming Misra–Gries heavy hitters — all-time top keys over an
  * unbounded stream with STATE BOUNDED BY CONSTRUCTION, the fifth
  * member of the [[StreamingSketch]] family (distinct count,
  * frequency, intersections, percentiles, now heavy hitters).
  *
  * The state per group is the MG summary itself: ≤ [[MgSummary.Cap]]
  * (key → count) entries however many distinct keys ever arrive. Each
  * micro-batch is counted EXACTLY first (a batch-local map), then
  * pointwise-summed into the state with the canonical MG reduction —
  * the same [[MgSummary]] arithmetic the Catalyst aggregate runs, so
  * stream/batch parity holds by construction in the exact regime and
  * the ε = 1/(Cap+1) bound holds in the overflow regime (both pinned
  * in StreamingHeavyHittersSpec).
  *
  * Determinism: the batch-local counting is order-invariant (exact
  * sums), so a fixed batch sequence produces a bit-identical summary
  * — the group-iterator order Spark hands the fold is not part of the
  * contract. Order ACROSS batches affects which sub-threshold keys
  * survive in the overflow regime — the standard MG property; the
  * frequency-bound envelope, not entry identity, is the guarantee.
  */
object StreamingHeavyHitters {

  case class In(g: String, k: Long)
  case class MgState(pairs: Seq[(Long, Long)])
  case class Snapshot(g: String, entries: Long, heavy: Seq[(Long, Long)])

  /** Top-[[MgSummary.K]] cut of a summary via the one-shot rule —
    * (key, lower-bound count) pairs in (count desc, key asc) order. */
  private[streaming] def heavyOf(m: MgSummary.Summary): Seq[(Long, Long)] = {
    val t = MgSummary.kthLargest(m, MgSummary.K + 1)
    MgSummary.sorted(m).takeWhile { case (_, c) => c > t }
      .map { case (k, c) => (k, c - t) }
  }

  private def fold(cap: Int)(g: String, rows: Iterator[In],
      state: GroupState[MgState]): Snapshot = {
    val m = MgSummary.empty
    if (state.exists) state.get.pairs.foreach { case (k, c) => m.update(k, c) }
    // exact batch-local counts first (order-invariant), then ONE
    // canonical merge — never a per-row decrement mid-batch
    val batch = MgSummary.empty
    rows.foreach(r => batch.update(r.k, batch.getOrElse(r.k, 0L) + 1L))
    MgSummary.mergeInto(m, batch, cap)
    state.update(MgState(MgSummary.sorted(m)))
    Snapshot(g, m.size.toLong, heavyOf(m))
  }

  /** Per-group all-time heavy-hitter snapshots of a streaming frame
    * with columns (g string, k long); update output mode. */
  def heavySnapshots(events: DataFrame,
      cap: Int = MgSummary.Cap): Dataset[Snapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("g"), col("k")).as[In]
      .groupByKey(_.g)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold(cap))
  }
}
