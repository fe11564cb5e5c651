package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregates over the envelope stream — the
  * Structured Streaming form of the batch windowed queries
  * (`queries/WindowedQueries.scala`): watermarked tumbling/hopping
  * device-activity counters that finalize once event time passes the
  * window end plus the allowed lateness, so append-mode sinks emit
  * each window exactly once and late stragglers are dropped instead
  * of corrupting closed windows.
  */
object StreamingWindows {

  /** Shared preamble: derive the event-time column from the envelope's
    * decimicrosecond reception stamp and bound lateness with a
    * watermark. One definition so a future change to the decimicros→µs
    * conversion applies to every windowed stream at once.
    */
  private[streaming] def withEventTime(envelopes: Dataset[Envelope], lateness: String): DataFrame =
    envelopes.toDF()
      .withColumn("event_time",
        expr("timestamp_micros(receptionDecimicros div 10)"))
      .withWatermark("event_time", lateness)

  /** Per-(window, device) message and byte counters over tumbling
    * event-time windows. `lateness` bounds state: windows older than
    * watermark - lateness are evicted from the state store, which is
    * what keeps unbounded streams at a bounded memory footprint.
    */
  def deviceActivity(
      envelopes: Dataset[Envelope],
      windowDuration: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    withEventTime(envelopes, lateness)
      .groupBy(window(col("event_time"), windowDuration), col("deviceId"))
      .agg(count(lit(1)).as("n_msgs"),
        sum(coalesce(octet_length(col("payload")), lit(0))).as("n_bytes"))
      .select(col("window.start").as("window_start"),
        col("deviceId").as("device_id"), col("n_msgs"), col("n_bytes"))

  /** Hopping (sliding) variant: each event lands in
    * window/slide overlapping windows.
    */
  def deviceActivityHopping(
      envelopes: Dataset[Envelope],
      windowDuration: String,
      slide: String,
      lateness: String = "10 minutes"): DataFrame =
    withEventTime(envelopes, lateness)
      .groupBy(window(col("event_time"), windowDuration, slide), col("deviceId"))
      .agg(count(lit(1)).as("n_msgs"))
      .select(col("window.start").as("window_start"),
        col("deviceId").as("device_id"), col("n_msgs"))

  /** Session variant (the streaming twin of the batch `w_session`
    * query): per-device activity bursts separated by more than `gap`
    * of event-time silence (gap windows that merely touch still
    * merge). A session stays OPEN in the state store
    * while events keep arriving within the gap; it finalizes — and
    * append mode emits it exactly once — when the watermark passes
    * session end, so state is bounded by (active devices × open
    * sessions), not stream history.
    */
  def deviceSessions(
      envelopes: Dataset[Envelope],
      gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    withEventTime(envelopes, lateness)
      .groupBy(session_window(col("event_time"), gap), col("deviceId"))
      .agg(count(lit(1)).as("n_msgs"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("deviceId").as("device_id"), col("n_msgs"))
}
