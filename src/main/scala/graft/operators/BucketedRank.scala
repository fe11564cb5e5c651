package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank WITHOUT a data-sized single window partition —
  * the two-phase decomposition behind the packing pipeline
  * (`tx_pack`/`tx_pad_buckets`), extracted because a bare
  * `row_number().over(Window.orderBy(...))` is the one plan shape
  * guaranteed to die at 100 TB: every row funnels through a single
  * task's sort.
  *
  * Decomposition (exact, not approximate):
  *   1. assign each row a bucket that is MONOTONE in the rank order
  *      (all of bucket b's rows precede all of bucket b+1's);
  *   2. count rows per bucket and exclusive-prefix the counts — the
  *      ONLY unpartitioned window, over one row per bucket (tiny by
  *      construction);
  *   3. rank locally within each bucket (partitioned P ways) and add
  *      the broadcast bucket offset: global rank = offset + local.
  *
  * The rank is bucket-count-invariant, so the bucket count can scale
  * with the session (like [[TwoPhaseTopK.shards]]) without affecting
  * cross-engine parity — oracles replay a plain global row_number().
  *
  * Skew caveat: rows carrying ONE value all land in that value's
  * bucket (monotonicity requires it — their mutual order is decided
  * by the tie-break inside one partition). Range-bucketing a
  * key whose distribution is a point mass degrades to the global
  * window; the callers here rank aggregated dimensions (per-user
  * totals, document lengths) where the value spread is the point of
  * the query.
  */
object BucketedRank {

  /** Bucket count tied to session parallelism — the same signal
    * [[TwoPhaseTopK.shards]] uses, floored so small local runs keep
    * the shapes the plans were tuned at. */
  def buckets(df: DataFrame): Int =
    math.max(32, df.sparkSession.sparkContext.defaultParallelism)

  /** Add exact global rank `rankName` ordered by `order`, given a
    * precomputed `bucket` column that is monotone in that order. */
  def withRank(df: DataFrame, bucket: Column, order: Seq[Column],
      rankName: String): DataFrame = {
    val bucketed = df.withColumn("__brk_bk", bucket)
    val counts = bucketed.groupBy(col("__brk_bk"))
      .agg(count(lit(1)).as("__brk_cnt"))
    val offW = Window.orderBy(col("__brk_bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // one row per distinct bucket — the tiny table the global window
    // is allowed to run on
    val offsets = counts
      .withColumn("__brk_off", coalesce(sum(col("__brk_cnt")).over(offW),
        lit(0L)))
      .select(col("__brk_bk"), col("__brk_off"))
    val local = Window.partitionBy(col("__brk_bk")).orderBy(order: _*)
    bucketed
      .withColumn("__brk_lr", row_number().over(local))
      .join(broadcast(offsets), Seq("__brk_bk"))
      .withColumn(rankName, col("__brk_off") + col("__brk_lr"))
      .drop("__brk_bk", "__brk_off", "__brk_lr")
  }

  /** Add exact global rank ordered by (`value`, then `tieBreak`) for
    * an integral value column: deterministic range buckets against
    * broadcast min/max bounds — no sampled RangePartitioner, so the
    * assignment is stable across runs and engines. */
  def byRange(df: DataFrame, value: Column, tieBreak: Seq[Column],
      rankName: String): DataFrame = {
    val n = buckets(df)
    val bounds = df.agg(min(value).cast("long").as("__brk_mn"),
      max(value).cast("long").as("__brk_mx"))
    // divide by the bucket WIDTH rather than multiplying by the
    // bucket count first: (v − mn) · n overflows Long once the value
    // range nears 2⁶³/n, silently breaking bucket monotonicity. The
    // width form is overflow-free (both operands ≤ the range), still
    // monotone, and keeps the ≤ n-buckets invariant:
    // (mx − mn) div ((mx − mn) div n + 1) < n.
    df.withColumn("__brk_v", value.cast("long"))
      .crossJoin(broadcast(bounds))
      .withColumn("__brk_rbk",
        expr(s"(__brk_v - __brk_mn) div" +
          s" ((__brk_mx - __brk_mn) div $n + 1)"))
      .transform(d => withRank(d, col("__brk_rbk"),
        value.cast("long") +: tieBreak, rankName))
      .drop("__brk_v", "__brk_mn", "__brk_mx", "__brk_rbk")
  }
}
