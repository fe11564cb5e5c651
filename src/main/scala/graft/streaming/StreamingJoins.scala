package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream joins over the envelope stream — the Structured
  * Streaming twin of the batch bucketed range join
  * (`RelationalQueries.q_range_join`): correlate each event on one
  * stream with the events that follow it on another stream within a
  * bounded event-time horizon.
  *
  * The two ingredients that make this run with BOUNDED state on an
  * unbounded stream: a watermark on BOTH sides (so either side can
  * evict buffered rows the other side can no longer match) and a
  * RANGE condition tying the two event-time columns together (so the
  * engine can derive how long a buffered row stays joinable). Without
  * the range bound, stream-stream state grows with stream history —
  * the streaming analogue of the batch nested-loop interval-join
  * trap the bucketed q_range_join exists to avoid.
  */
object StreamingJoins {

  /** Inner interval join: for every envelope on `triggers` (e.g. the
    * error stream), the envelopes on `activity` for the SAME device
    * within (trigger_time, trigger_time + horizon]. Equi-key on
    * device bounds the hash side; the time-range predicate bounds
    * retention — a buffered trigger row is dropped once the activity
    * watermark passes its horizon, a buffered activity row once the
    * trigger watermark passes its own timestamp.
    */
  def followWithin(
      triggers: Dataset[Envelope],
      activity: Dataset[Envelope],
      horizon: String = "2 hours",
      lateness: String = "10 minutes"): DataFrame = {
    val t = StreamingWindows.withEventTime(triggers, lateness)
      .select(col("deviceId").as("trigger_device"),
        col("event_time").as("trigger_time"),
        col("offset").as("trigger_offset"))
    val a = StreamingWindows.withEventTime(activity, lateness)
      .select(col("deviceId").as("act_device"),
        col("event_time").as("act_time"),
        col("offset").as("act_offset"))
    t.join(a,
      col("trigger_device") === col("act_device") &&
      col("act_time") > col("trigger_time") &&
      col("act_time") <= col("trigger_time") + expr(s"INTERVAL $horizon"))
      .select(col("trigger_device").as("device_id"),
        col("trigger_offset"), col("act_offset"),
        col("trigger_time"), col("act_time"))
  }
}
