package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph decompositions over the near-dup graph beyond the census
  * ([[AnalyticsQueries.triangleCensus]]) and component queries
  * ([[DedupPipeline]]): k-core peeling — the standard detector for
  * template farms and mirror rings, whose members keep ≥ k near-dup
  * neighbors even after the scattered chains peel away.
  */
object GraphQueries extends QueryPack {

  private val CoreK = 2

  /** Rounds the DuckDB oracle unrolls. Peel rounds past the fixpoint
    * are no-ops (nothing falls below k once nothing is removed), so
    * the unroll only needs to be ≥ the testdata's convergence depth
    * (4 at sf0.01 — the old fixed-3 unroll was NOT the fixpoint
    * there, which is why this is convergence-looped now); rounds are
    * MATERIALIZED and shrink, so the 8-round margin is ~free. */
  private[graft] val OracleUnroll = 8

  /** One peel pass: drop vertices whose current induced degree is
    * below k, with the edge set restricted to survivors. Linear
    * shapes only — a degree partial-agg and two semi-joins. */
  private def peelOnce(e: DataFrame, k: Int): DataFrame = {
    val keep = e.select(col("doc_a").as("v"))
      .unionAll(e.select(col("doc_b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
      .select(col("v"))
    e.join(keep.withColumnRenamed("v", "doc_a"), Seq("doc_a"), "left_semi")
      .join(keep.withColumnRenamed("v", "doc_b"), Seq("doc_b"), "left_semi")
  }

  /** Peel UNTIL CONVERGENCE — the loop stops on the first round that
    * removes no edge (surviving edge count unchanged ⇒ degrees
    * unchanged ⇒ fixpoint), the same driver-looped convergence
    * discipline as `dd_cc_converged`'s pointer jumping. Each round
    * costs one partial-agg degree count plus two hash semi-joins —
    * linear in surviving edges, nothing data-sized on the driver (the
    * round count IS the only driver-side signal, one scalar per
    * round); hot keys impossible because the input is the
    * bucket-capped near-dup pair set. The count() per round is a read
    * of the round's eager checkpoint, not a recompute. Returns the
    * surviving vertices with their induced degree. */
  private[graft] def kcoreSurvivors(edges: DataFrame, k: Int): DataFrame = {
    // LAZY checkpoints throughout (r17 opt round): the per-round
    // count() both materializes the round's checkpoint blocks and
    // answers the fixpoint test in ONE job — the propagateConverged
    // pattern. (The old eager checkpoint + count paid two jobs per
    // round; "lazy is a no-op" only holds when nothing computes
    // through it, and the count always does.) Lineage truncation is
    // identical: after count() the frame is served from its blocks.
    // NOTE (r17, measured and REJECTED): running the peel rounds
    // under the DedupPipeline round scope (derived rp + AQE off) read
    // 1.30 -> 2.24 s — each round's two semi-joins over the
    // checkpointed (stats-less) edge frame lose their AQE runtime
    // broadcast conversion and fall back to sort-merge, which costs
    // more than the saved query-stage jobs. The peel keeps AQE.
    var e = edges.localCheckpoint(false)
    var owned = true
    var n = e.count()
    var converged = false
    while (!converged && n > 0) {
      val next = peelOnce(e, k).localCheckpoint(false)
      val m = next.count()
      if (owned) releaseCheckpoint(e)
      e = next
      owned = true
      converged = m == n
      n = m
    }
    survivorDegrees(e)
  }

  /** Fixed-round unroll — what the DuckDB oracle replays and what the
    * spec compares against the converged loop (equal exactly when
    * `rounds` ≥ the graph's convergence depth). */
  private[graft] def kcoreSurvivorsFixed(edges: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    var e = edges
    var owned = false // never release the CALLER's frame — a freed
    // local checkpoint cannot recompute (lineage truncated)
    for (_ <- 1 to rounds) {
      val next = peelOnce(e, k).localCheckpoint(true)
      if (owned) releaseCheckpoint(e)
      e = next
      owned = true
    }
    survivorDegrees(e)
  }

  private def survivorDegrees(e: DataFrame): DataFrame =
    e.select(col("doc_a").as("doc_id"))
      .unionAll(e.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
      .orderBy(col("doc_id"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 2-core of the simhash near-dup graph, peeled until convergence:
    // the documents embedded in dense duplication structure (template
    // families), as opposed to isolated pair/chain near-dups that a
    // keeper election already handles
    "dd_kcore" -> ((s, d) => {
      val e = AnalyticsQueries.simhashNearDupPairs(s, d)
        .select(col("doc_a"), col("doc_b"))
      kcoreSurvivors(e, CoreK)
    })
  )

  /** Unrolled peel SQL generated from the SAME constants as the Spark
    * side ([[OracleUnroll]] rounds — a superset of the convergence
    * depth, and no-op rounds past it leave the result unchanged). The
    * edge CTE is the pack-standard simhash near-dup pair derivation
    * (as in the dd_simhash_pairs / dd_triangles oracles).
    */
  override def oracle: Map[String, String] = {
    // MATERIALIZED is load-bearing: each round references its
    // predecessor three times, and DuckDB inlines single-definition
    // CTEs — an unfenced 5-round unroll re-derives the e0 self-join
    // exponentially (measured: minutes → an hour). Materializing each
    // round makes the replay linear, exactly like the Spark side's
    // per-round checkpoint.
    val rounds = (1 to OracleUnroll).map { r =>
      s"""k$r AS MATERIALIZED (
         |  SELECT v FROM (
         |    SELECT v, count(*) AS deg FROM (
         |      SELECT doc_a AS v FROM e${r - 1}
         |      UNION ALL SELECT doc_b AS v FROM e${r - 1})
         |    GROUP BY v) WHERE deg >= $CoreK),
         |e$r AS MATERIALIZED (
         |  SELECT doc_a, doc_b FROM e${r - 1}
         |  WHERE doc_a IN (SELECT v FROM k$r)
         |    AND doc_b IN (SELECT v FROM k$r))""".stripMargin
    }.mkString(",\n")
    Map("dd_kcore" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    ('0x' || substr(md5(unnest(string_split(text,' '))),1,4))::INT AS tok_hash
         |  FROM documents),
         |votes AS (
         |  SELECT doc_id, lang, bit,
         |    sum(CASE WHEN (tok_hash >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
         |  FROM t, (SELECT unnest(generate_series(0,15)) AS bit)
         |  GROUP BY doc_id, lang, bit),
         |sigs AS (
         |  SELECT doc_id, lang,
         |    sum(CASE WHEN vote > 0 THEN 1 << bit ELSE 0 END) AS sig
         |  FROM votes GROUP BY doc_id, lang),
         |e0 AS MATERIALIZED (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sigs a JOIN sigs b
         |    ON a.lang = b.lang AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
         |$rounds
         |SELECT doc_id, count(*) AS deg FROM (
         |  SELECT doc_a AS doc_id FROM e$OracleUnroll
         |  UNION ALL SELECT doc_b AS doc_id FROM e$OracleUnroll)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  }
}
