package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the corpus-delta dedup
  * ([[graft.queries.IncrementalDedup]]): a STREAM of newly-crawled
  * documents judged against the persisted corpus signature state,
  * live, without ever reading corpus text.
  *
  * Shape — every stage is the scale-correct one:
  *  - signatures are the SAME map-side construction the batch path
  *    uses ([[graft.queries.DedupPipeline.shingleArraysOf]] /
  *    `bandKeyArray`, shared definitions — the two paths cannot
  *    drift), computed per micro-batch with no state;
  *  - candidate generation is a stream-static EQUI join of the
  *    stream's exploded band keys against the persisted band table
  *    (the static side can be the bucketized serving layout, in
  *    which case only the stream side shuffles);
  *  - exact-Jaccard verification joins the persisted signature
  *    arrays, again stream-static;
  *  - the per-document verdict ("did ANY candidate verify") is a
  *    watermarked event-time-windowed aggregation — bounded state,
  *    append output; a verdict emits once the watermark passes its
  *    window, i.e. the stream's own lateness horizon is the verdict
  *    latency.
  *
  * Within-increment duplicates are out of scope for the live path
  * (the batch `dd_incremental` judges those at absorb time); the
  * stream's verdict is dup-of-corpus vs keeper, the decision a live
  * ingest gate actually needs.
  */
object StreamingIncrementalDedup {

  /** Verdict stream over streaming `docs` (doc_id, text, lang,
    * ingest_ts) against the persisted `corpusBands` (doc_id,
    * band_key) and `corpusArrs` (doc_id, lang, arr) state. Emits
    * (window_start, doc_id, verdict) in append mode.
    */
  def verdicts(docs: DataFrame, corpusBands: DataFrame,
      corpusArrs: DataFrame, windowDur: String = "10 seconds",
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val arrs = graft.queries.DedupPipeline.shingleArraysOf(
      docs.withWatermark("ingest_ts", watermarkDelay))
    val exploded = arrs.select(col("doc_id"), col("ingest_ts"),
      col("arr"), explode(graft.queries.DedupPipeline.bandKeyArray)
        .as("band_key"))
    val staticSide = corpusBands
      .join(corpusArrs.select(col("doc_id"), col("arr").as("arr_b")),
        Seq("doc_id"))
      .select(col("band_key"), col("arr_b"))
    // left outer: keeper docs must survive to the verdict aggregation
    val joined = exploded
      .join(staticSide, Seq("band_key"), "left_outer")
      .withColumn("n_inter", size(array_intersect(col("arr"), col("arr_b"))))
      .withColumn("verified",
        coalesce(col("n_inter") /
          (size(col("arr")) + size(col("arr_b")) - col("n_inter")) >= 0.2,
          lit(false)))
    joined
      .groupBy(window(col("ingest_ts"), windowDur), col("doc_id"))
      .agg(max(when(col("verified"), 1).otherwise(0)).as("dup"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        when(col("dup") === 1, lit("dup")).otherwise(lit("keeper"))
          .as("verdict"))
  }
}
