package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming HyperLogLog — all-time distinct counting over an
  * unbounded stream with STATE BOUNDED BY CONSTRUCTION.
  *
  * This is the third state-bounding strategy in the engine's
  * streaming family, and the only one that never discards
  * information:
  *   - [[StreamingDedup]] bounds state by watermark EVICTION (old
  *     keys forgotten — correct only within the horizon);
  *   - [[StreamingGate]] bounds election state by TTL;
  *   - a sketch bounds state SUBLINEARLY BY DESIGN: the aggregation
  *     state is ≤ m register rows however many events ever arrive,
  *     so all-time semantics need no horizon at all.
  *
  * The register builder is literally
  * [[graft.queries.SketchQueries.registersOf]] — the batch query's
  * own code running under the streaming planner (groupBy + max is an
  * incremental-friendly aggregation), so stream/batch parity holds by
  * construction and is pinned by StreamingSketchSpec, which also
  * asserts the ≤ m state bound from the engine's own state-operator
  * metrics.
  */
object StreamingSketch {

  /** All-time distinct-user_id HLL registers of a streaming frame
    * carrying a `user_id` column. Run in update/complete output mode;
    * the sink sees ≤ m rows. */
  def hllRegisters(events: DataFrame): DataFrame =
    graft.queries.SketchQueries.registersOf(
      events.select(lit("g").as("g"), col("user_id")), "g")
      .select(col("bucket"), col("rho"))

  /** All-time Count-Min counters of the same stream — the frequency
    * twin: state is ≤ d·w counter rows by construction (sum is as
    * incremental-friendly as max). */
  def cmsCounters(events: DataFrame): DataFrame =
    graft.queries.SketchQueries.cmsOf(events.select(col("user_id")))

  /** All-time tug-of-war sums (AMS F₂ / self-join size) of the same
    * stream — state is d integer rows BY CONSTRUCTION: the sketch IS
    * a sum, the single most incremental-friendly aggregation there
    * is. Run in update/complete mode; the sink sees ≤ d rows. */
  def amsZ(events: DataFrame): DataFrame =
    graft.queries.SketchQueries.amsOf(events.select(col("user_id")))

  /** Daily distinct-user registers on a stream — the windowed twin of
    * the batch `w_hll_daily`: per event-time day one 64-register
    * sketch, watermark-bounded state (open windows × 64 rows — the
    * sketch bounds the per-window state, the watermark bounds the
    * window count). Append mode emits each day's registers once the
    * watermark closes it. */
  def dailyHllRegisters(events: DataFrame,
      delay: String = "1 hour"): DataFrame =
    graft.queries.SketchQueries.registersOf(
      events.withWatermark("event_time", delay)
        .select(window(col("event_time"), "1 day").as("g"), col("user_id")),
      "g")
      .select(col("g.start").as("day"), col("bucket"), col("rho"))
}
