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

  /** The prepared (band_key, arr_b) static side of the candidate
    * join. Build it ONCE and persist/checkpoint it (or materialize it
    * as a store table at bucketize cadence) before passing it to
    * [[verdicts]] — the stream-static join re-executes the static
    * plan every micro-batch, so an unpinned corpus-scale join here
    * would be paid per trigger.
    */
  def corpusState(corpusBands: DataFrame, corpusArrs: DataFrame): DataFrame =
    corpusBands
      .join(corpusArrs.select(col("doc_id"), col("arr").as("arr_b")),
        Seq("doc_id"))
      .select(col("band_key"), col("arr_b"))

  /** Verdict stream over streaming `docs` (doc_id, text, lang,
    * ingest_ts) against the prepared [[corpusState]]. Emits
    * (window_start, doc_id, verdict) in append mode — one verdict
    * per document, INCLUDING sub-3-token docs (no trigrams, so they
    * can never be near-dups: trivial keepers, not starved rows).
    */
  def verdicts(docs: DataFrame, state: DataFrame,
      windowDur: String = "10 seconds",
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val wmDocs = docs.withWatermark("ingest_ts", watermarkDelay)
    val arrs = graft.queries.DedupPipeline.shingleArraysOf(wmDocs)
    val exploded = arrs.select(col("doc_id"), col("ingest_ts"),
      col("arr"), explode(graft.queries.DedupPipeline.bandKeyArray)
        .as("band_key"))
    // left outer: keeper docs must survive to the verdict aggregation
    val joined = exploded
      .join(state, Seq("band_key"), "left_outer")
      .withColumn("n_inter", size(array_intersect(col("arr"), col("arr_b"))))
      .withColumn("verified",
        coalesce(col("n_inter") /
          (size(col("arr")) + size(col("arr_b")) - col("n_inter")) >= 0.2,
          lit(false)))
      .select(col("doc_id"), col("ingest_ts"), col("verified"))
    // sub-3-token docs have no shingles (shingleArraysOf drops them);
    // the gate still owes them a verdict — trivially keeper
    val shorts = wmDocs
      .filter(size(split(col("text"), " ")) < 3)
      .select(col("doc_id"), col("ingest_ts"), lit(false).as("verified"))
    joined.unionByName(shorts)
      .groupBy(window(col("ingest_ts"), windowDur), col("doc_id"))
      .agg(max(when(col("verified"), 1).otherwise(0)).as("dup"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        when(col("dup") === 1, lit("dup")).otherwise(lit("keeper"))
          .as("verdict"))
  }
}
