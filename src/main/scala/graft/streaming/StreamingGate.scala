package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the corpus admission gate (`tx_corpus_gate`):
  * the stateless verdicts (length, repetition, quality) are the SAME
  * column definitions as the batch gate
  * ([[graft.queries.AnalyticsQueries.gateStateless]]); only the
  * token-bag duplicate election differs by necessity — the batch gate
  * elects the corpus-wide min-id keeper with a window, which a stream
  * cannot know, so the stream elects FIRST-SEEN per bag hash with
  * keyed state (within one micro-batch, ties resolve to the min
  * doc_id, so a single-batch replay of a corpus reproduces the batch
  * gate exactly — the parity the spec pins).
  *
  * The election horizon is BOUNDED: documents carry an `ingest_ts`
  * event-time column, the stream watermarks it by the TTL, and each
  * bag's state times out once the watermark passes its newest
  * arrival — the exact discipline `StreamingDedup` gets from
  * `dropDuplicatesWithinWatermark`, chosen over a processing-time TTL
  * because it is deterministic under replay (same data, same
  * verdicts, regardless of wall-clock) and because processing-time
  * timeouts force the micro-batch engine into a continuous no-data
  * batch loop under the default trigger. Unbounded `NoTimeout` state
  * would grow linearly in ALL-TIME distinct content (~10¹¹ entries
  * over a 100 TB crawl), which no state store survives; within the
  * horizon verdicts are exactly the unbounded semantics, beyond it a
  * re-arriving bag is re-elected keeper — operationally correct for a
  * crawl, where content older than the horizon has been compacted
  * into the batch corpus anyway.
  *
  * Scale shape: everything except the election is per-row map work;
  * the election is one keyed state lookup per document with state =
  * one boolean per distinct token bag seen within the TTL horizon.
  */
object StreamingGate {

  final case class GateRow(doc_id: Long, bag_hash: String, n_tokens: Int,
      n_bigrams: Int, n_dbg: Int, score_bp: Long,
      ingest_ts: java.sql.Timestamp)

  final case class Verdict(doc_id: Long, verdict: String, score_bp: Long)

  /** Default election horizon: one week of event time, the typical
    * crawl-increment cadence.
    */
  val DefaultElectionTtlMs: Long = 7L * 24 * 60 * 60 * 1000

  /** Append-mode verdict stream over a streaming `documents` frame
    * (doc_id, text, n_chars, ingest_ts). A bag hash's first-seen
    * election persists until the watermark — `electionTtlMs` behind
    * the newest observed event — passes the bag's latest arrival.
    */
  def verdicts(docs: DataFrame,
      electionTtlMs: Long = DefaultElectionTtlMs): Dataset[Verdict] = {
    import docs.sparkSession.implicits._
    val base = graft.queries.AnalyticsQueries.gateStateless(
        docs.withWatermark("ingest_ts", s"$electionTtlMs milliseconds"))
      .select(col("doc_id"), col("bag_hash"), col("n_tokens"),
        col("n_bigrams"), col("n_dbg"), col("score_bp"), col("ingest_ts"))
      .as[GateRow]
    base.groupByKey(_.bag_hash)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(electAndJudge)
  }

  /** Per bag-hash group: the first arrival within the horizon (min
    * doc_id within the micro-batch) is the keeper; every other
    * member — and every member of a bag already seen within the
    * horizon — is a bag_dup at its precedence slot. All documents
    * participate in the election (as in the batch gate), whatever
    * their other verdicts. A group invoked with `hasTimedOut` (the
    * watermark passed its newest arrival with no new data) evicts its
    * state and emits nothing.
    */
  private def electAndJudge(bagHash: String, rows: Iterator[GateRow],
      state: GroupState[Boolean]): Iterator[Verdict] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = rows.toSeq.sortBy(_.doc_id)
    val seenBefore = state.exists
    if (sorted.nonEmpty) {
      // (re)arm the horizon on every arrival: the state expires when
      // the watermark (TTL behind the stream's newest event) passes
      // this bag's latest arrival. Late rows can sit at-or-under the
      // current watermark, and a timeout must be strictly beyond it.
      state.update(true)
      val newest = sorted.map(_.ingest_ts.getTime).max
      state.setTimeoutTimestamp(
        math.max(newest, state.getCurrentWatermarkMs() + 1))
    }
    sorted.zipWithIndex.iterator.map { case (r, i) =>
      val isKeeper = !seenBefore && i == 0
      val verdict =
        if (r.n_tokens < 16) "too_short"
        else if (r.n_dbg * 2 < r.n_bigrams) "repetitive"
        else if (!isKeeper) "bag_dup"
        else if (r.score_bp < 5000) "low_quality"
        else "pass"
      Verdict(r.doc_id, verdict, r.score_bp)
    }
  }
}
