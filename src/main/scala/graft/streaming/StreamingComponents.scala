package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{DedupPipeline, IncrementalDedup}

/** Streaming connected-component maintenance — the label twin of
  * [[StreamingFileIngest]]: each micro-batch of newly-crawled
  * documents is judged against the PERSISTED signature state, its new
  * edges merge into the persisted component labels through the
  * contracted-graph propagation
  * ([[IncrementalDedup.incrementalComponents]]), and its own
  * signatures then fold into the store so LATER batches link against
  * it — cumulative: after any batch the folded label log equals the
  * batch fixpoint over corpus ∪ everything streamed (pinned in
  * StreamingComponentsSpec against `dd_cc_converged`).
  *
  * Effectively-once with NO engine cooperation needed:
  *   - labels are a monoid under MIN, so a replayed label absorb is a
  *     fold no-op outright;
  *   - signature absorbs are ledgered last
  *     ([[IncrementalDedup.SignatureStore.absorbLedgered]]); a crash
  *     mid-batch re-runs the pair/merge work against the identical
  *     pre-batch state (the sigs land after the labels), and the
  *     read-side dedup collapses a torn append's bit-identical rows;
  *   - a fully-delivered batch id short-circuits at the ledger.
  *
  * Scale shape per trigger: one text pass over the micro-batch, the
  * stream-vs-persisted band join (increment side tiny), the
  * contracted propagation (increment-sized), one broadcast-relabel
  * pass for the label append. Corpus text and corpus edges are never
  * read.
  */
object StreamingComponents {

  /** Deterministic absorb id for a micro-batch. */
  def genId(batchId: Long): String = f"ccbatch-$batchId%09d"

  /** The foreachBatch sink over a streaming frame of documents
    * (doc_id, text, lang). Usage:
    * `docs.writeStream.foreachBatch(sink(root)).start()`. */
  def sink(root: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val s = batch.sparkSession
      val incId = genId(batchId)
      val store = IncrementalDedup.SignatureStore
      if (!store.absorbedIds(s, root).contains(incId)) {
        val incArrs = DedupPipeline.shingleArraysOf(batch)
          .localCheckpoint(true)
        // judge against the PRE-batch state (crash-window reads go
        // through the dedup views — the batch store contract is
        // duplicate-free, a torn streaming absorb is not)
        val pairs = IncrementalDedup.incrementalPairs(incArrs,
          store.dedupBands(s, root), store.dedupArrs(s, root),
          store.banding(s, root))
          .localCheckpoint(true)
        val merged = IncrementalDedup.incrementalComponents(s,
          store.ccLabels(s, root), pairs)
        store.absorbCc(root, merged)
        // signatures land AFTER the labels; the ledger row lands last
        store.absorbLedgered(s, root, incArrs, incId)
      }
    }
}
