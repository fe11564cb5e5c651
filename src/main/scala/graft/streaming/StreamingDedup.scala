package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for a continuous document/ingest
  * feed — the streaming twin of the batch `dd_exact_dedup` operator.
  *
  * Uses `dropDuplicatesWithinWatermark` on the content digest:
  * duplicates arriving within the watermark delay of each other are
  * collapsed to the first occurrence, and dedup state older than the
  * watermark is evicted — so state stays bounded by (arrival rate ×
  * delay), not by stream history. That bounded-state trade is the
  * only correct shape at 100 TB/day: global-history exact dedup of an
  * unbounded stream is a batch job over the accumulated corpus (the
  * `dd_exact_dedup` query), not a streaming operator.
  */
object StreamingDedup {

  /** Collapse exact-duplicate payloads per realm within the watermark
    * window. Emits the first-seen row for each (realm, md5(payload)).
    */
  def exactDedup(
      envelopes: Dataset[Envelope],
      delay: String = "10 minutes"): DataFrame =
    envelopes.toDF()
      .withColumn("event_time",
        expr("timestamp_micros(receptionDecimicros div 10)"))
      .withColumn("content_hash", md5(col("payload")))
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark("realm", "content_hash")
}
