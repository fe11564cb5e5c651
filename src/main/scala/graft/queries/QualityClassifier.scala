package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed training of a linear quality classifier — the
  * fastText-style model every production corpus pipeline trains to
  * score documents (CCNet/LLaMA-style quality filtering), expressed
  * as pure DataFrame aggregations so the DuckDB oracle can replay it
  * bit for bit.
  *
  * Model: bag-of-words over B=32 hashed token buckets plus a bias
  * feature; label = the deterministic length gate `n_chars >= 400`
  * (~30% positive at every SF). Training = batch perceptron, `Rounds`
  * full passes: margin m_d = Σ_b x_db·w_b, misclassified iff
  * y_d·m_d ≤ 0, update w += Σ_misclassified y_d·x_db. Everything is
  * exact integer arithmetic — no learning-rate floats, no sigmoid —
  * so the unrolled SQL mirror cannot drift on summation order.
  *
  * Scale shape: the feature table is (doc, bucket, count) — linear in
  * corpus tokens; each round is ONE broadcast join of the 33-row
  * weight vector against the features plus two partial-agg groupBys
  * (margins per doc, updates per bucket). Nothing driver-side, no
  * window over data-sized partitions, and the weight vector stays
  * control-plane sized (33 rows) regardless of corpus size — the
  * same economics as [[AnalyticsQueries]]' BPE trainer. At 100 TB a
  * larger bucket count B only widens the broadcast by B rows.
  */
object QualityClassifier extends QueryPack {

  private val B = 32
  private val BiasIdx = B
  private val Rounds = 3
  private val LabelThreshold = 400

  private def toks: Column = split(col("text"), " ")

  /** (doc_id, idx, x) hashed bag-of-words + bias, and (doc_id, y)
    * labels. Hash = first 4 hex chars of md5 mod B — the pack-wide
    * token-hash convention (md5 prefixes agree across engines). */
  private def featuresOf(docs: DataFrame): DataFrame = {
    val bags = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("int")
          % B).as("idx"))
      .groupBy(col("doc_id"), col("idx"))
      .agg(count(lit(1)).as("x"))
    bags.unionByName(docs.select(col("doc_id"),
      lit(BiasIdx).as("idx"), lit(1L).as("x")))
  }

  private def labelsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("n_chars") >= LabelThreshold, 1).otherwise(-1).as("y"))

  /** Run the batch-perceptron rounds; returns the final weight table
    * (idx, w) and the per-round pre-update misclassification census
    * (round, n_err, n_docs). */
  private[graft] def train(s: SparkSession, d: String):
      (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d)
    // features/labels feed every round — checkpoint once (cache() is
    // the measured-slow path for wide shuffles; see DedupPipeline)
    val feats = featuresOf(docs).localCheckpoint(true)
    val labs = labelsOf(docs).localCheckpoint(true)
    var w = feats.select(col("idx")).distinct()
      .select(col("idx"), lit(0L).as("w"))
    var evals = Vector.empty[DataFrame]
    for (r <- 1 to Rounds) {
      val margins = feats
        .join(broadcast(w), Seq("idx"))
        .groupBy(col("doc_id"))
        .agg(sum(col("x") * col("w")).as("margin"))
        .join(labs, Seq("doc_id"))
      evals :+= margins.agg(
        sum(when(col("y") * col("margin") <= 0, 1L).otherwise(0L))
          .as("n_err"),
        count(lit(1)).as("n_docs"))
        .select(lit(r).as("round"), col("n_err"), col("n_docs"))
      val upd = margins.filter(col("y") * col("margin") <= 0)
        .join(feats, Seq("doc_id"))
        .groupBy(col("idx"))
        .agg(sum(col("y") * col("x")).as("uw"))
      // weight vector is 33 rows — the eager checkpoint both truncates
      // the per-round lineage and materializes the broadcast side
      w = w.join(upd, Seq("idx"), "left")
        .select(col("idx"), (col("w") + coalesce(col("uw"), lit(0L))).as("w"))
        .localCheckpoint(true)
    }
    (w.orderBy(col("idx")), evals.reduce(_ unionByName _))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the learned weight vector — the trained artifact a pipeline
    // ships to its scoring stage
    "tx_quality_lr" -> ((s, d) => train(s, d)._1),
    // training curve: pre-update error census per round — the
    // convergence evidence (errors must be computable without a
    // second pass; they fall out of the margins already built)
    "tx_quality_lr_eval" -> ((s, d) => train(s, d)._2)
  )

  /** Unrolled perceptron SQL shared by both oracles — generated from
    * the SAME constants as the Spark side, so the two cannot drift.
    * Defines feats/lab/w0 and then m{r}/u{r}/w{r} per round. */
  private def perceptronSql: String = {
    val rounds = (1 to Rounds).map { r =>
      s"""m$r AS (
         |  SELECT f.doc_id, l.y, sum(f.x * w.w)::BIGINT AS margin
         |  FROM feats f JOIN w${r - 1} w USING (idx)
         |  JOIN lab l USING (doc_id) GROUP BY 1, 2),
         |u$r AS (
         |  SELECT f.idx, sum(m.y * f.x)::BIGINT AS uw
         |  FROM m$r m JOIN feats f USING (doc_id)
         |  WHERE m.y * m.margin <= 0 GROUP BY 1),
         |w$r AS (
         |  SELECT w.idx, (w.w + coalesce(u.uw, 0))::BIGINT AS w
         |  FROM w${r - 1} w LEFT JOIN u$r u USING (idx))""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |lab AS (
       |  SELECT doc_id,
       |    CASE WHEN n_chars >= $LabelThreshold THEN 1 ELSE -1 END AS y
       |  FROM documents),
       |feats AS (
       |  SELECT doc_id, idx, count(*)::BIGINT AS x FROM (
       |    SELECT doc_id,
       |      (('0x' || substr(md5(tok), 1, 4))::BIGINT % $B)::INT AS idx
       |    FROM toks) GROUP BY 1, 2
       |  UNION ALL
       |  SELECT doc_id, $BiasIdx AS idx, 1::BIGINT AS x FROM documents),
       |w0 AS (SELECT DISTINCT idx, 0::BIGINT AS w FROM feats),
       |$rounds""".stripMargin
  }

  override def oracle: Map[String, String] = Map(
    "tx_quality_lr" ->
      s"""$perceptronSql
         |SELECT idx, w FROM w$Rounds ORDER BY idx""".stripMargin,
    "tx_quality_lr_eval" ->
      s"""$perceptronSql
         |${(1 to Rounds).map(r =>
            s"""SELECT $r AS round,
               |  coalesce(sum(CASE WHEN y * margin <= 0 THEN 1 END), 0)::BIGINT
               |    AS n_err,
               |  count(*)::BIGINT AS n_docs FROM m$r""".stripMargin)
           .mkString("\nUNION ALL\n")}""".stripMargin
  )
}
