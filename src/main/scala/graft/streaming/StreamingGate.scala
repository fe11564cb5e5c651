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
  * Scale shape: everything except the election is per-row map work;
  * the election is one keyed state lookup per document with state =
  * one boolean per distinct token bag (bounded by distinct-content
  * count, the same key space the batch window shuffles on).
  */
object StreamingGate {

  final case class GateRow(doc_id: Long, bag_hash: String, n_tokens: Int,
      n_bigrams: Int, n_dbg: Int, score_bp: Long)

  final case class Verdict(doc_id: Long, verdict: String, score_bp: Long)

  /** Append-mode verdict stream over a streaming `documents` frame
    * (doc_id, text, n_chars).
    */
  def verdicts(docs: DataFrame): Dataset[Verdict] = {
    import docs.sparkSession.implicits._
    val base = graft.queries.AnalyticsQueries.gateStateless(docs)
      .select(col("doc_id"), col("bag_hash"), col("n_tokens"),
        col("n_bigrams"), col("n_dbg"), col("score_bp"))
      .as[GateRow]
    base.groupByKey(_.bag_hash)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(electAndJudge)
  }

  /** Per bag-hash group: the first-ever arrival (min doc_id within
    * the micro-batch) is the keeper; every other member — and every
    * member of a bag already seen in an earlier batch — is a bag_dup
    * at its precedence slot. All documents participate in the
    * election (as in the batch gate), whatever their other verdicts.
    */
  private def electAndJudge(bagHash: String, rows: Iterator[GateRow],
      state: GroupState[Boolean]): Iterator[Verdict] = {
    val sorted = rows.toSeq.sortBy(_.doc_id)
    val seenBefore = state.exists
    if (!seenBefore && sorted.nonEmpty) state.update(true)
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
