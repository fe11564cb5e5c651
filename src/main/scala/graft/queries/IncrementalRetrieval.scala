package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental BM25/champion-list index maintenance — the retrieval
  * twin of [[IncrementalDedup]]/[[IncrementalAnn]]/[[IncrementalSketch]]:
  * the corpus's inverted-index artifacts (postings, document
  * frequencies, champion lists, corpus stats) persist ONCE through
  * the store's crash-safe append protocol, and each crawl increment
  * is folded in WITHOUT rescanning old documents' text. A production
  * pipeline appends increments to persisted postings; rebuilding the
  * index from the corpus every run — what `sim_lex_topk` legitimately
  * does as the from-scratch path — is exactly what this replaces at
  * 100 TB.
  *
  * Why each artifact merges exactly:
  *   - postings: disjoint doc_ids → merge is union;
  *   - dfreq: df is additive across disjoint doc sets → sum-on-read
  *     (a monoid, like CMS counters);
  *   - stats (n_docs, sum_dl): additive → sum-on-read;
  *   - champion lists: top-C per term is IDEMPOTENT over re-cutting —
  *     top-C(corpus ∪ inc) = top-C(top-C(corpus) ∪ inc), since any
  *     row of the union's top-C from the corpus side is in the
  *     corpus's top-C. So serving re-cuts (persisted champions ∪
  *     increment postings) — an index-sized window pass
  *     (≤ |vocab|·C + |increment| rows, two-phase sharded), never a
  *     corpus-sized one.
  *
  * Replay idempotence follows the [[IncrementalSketch]] ledger
  * discipline: appends are inc_id-tagged, absorb skips ids the log
  * already holds, and every read folds per-inc_id duplicates away
  * first (rows of a replayed append are bit-identical), so the
  * ledger's crash window cannot double-count a df or push a champion
  * out with its own duplicate.
  *
  * The increment path scans the increment's text ONCE (posting
  * computation — plan-pinned in IncrementalRetrievalSpec); everything
  * corpus-sided reads only the persisted index. The DuckDB oracle for
  * `sim_lex_incremental` recomputes the whole index from the union —
  * it is `sim_lex_topk`'s oracle verbatim, so a hash match proves
  * incremental-equals-batch. At corpus scale the postings/champion
  * tables would additionally persist bucketed by `tok` (the
  * SignatureStore.bucketizeBands pattern) so the serving joins plan
  * with no corpus-side Exchange.
  *
  * Reference analogue: the merge-into-persisted-state discipline of
  * the exchanged-counters columns (`queries.ex:478-510`).
  */
object IncrementalRetrieval extends QueryPack {

  /** Increment membership: the most recent ~20% of doc ids plays the
    * "new crawl" role (same convention as [[IncrementalDedup]]). Note
    * some query docs (doc_id < MaxQid) land in the increment — the
    * query-side posting slice is a merged read too, deliberately. */
  private val incPredicate = col("doc_id") % 10 >= 8

  private[graft] object LexIndexStore {
    // LRU-bounded like every per-root control-plane memo (an evicted
    // sfDir simply rebuilds its root on the next touch)
    private val roots =
      new graft.core.BoundedMemo[String, String](64, "retrieval.lexRoots")

    def rootFor(s: SparkSession, sfDir: String): String =
      roots.getOrElseUpdate(sfDir)(buildRoot(s, sfDir))

    /** Uncached build over the CORPUS slice only (the spec uses this
      * for mutation-isolated absorb tests). */
    private[graft] def buildRoot(s: SparkSession, sfDir: String): String = {
      val root =
        java.nio.file.Files.createTempDirectory("graft-lexidx").toString
      val corpus = Tables.documents(s, sfDir).filter(!incPredicate)
      appendIndex(root, HybridRetrieval.postingsOf(corpus)
        .localCheckpoint(true), "corpus")
      root
    }

    def postingsPath(root: String): String = s"$root/lex_postings"
    def dfreqPath(root: String): String = s"$root/lex_dfreq"
    def championsPath(root: String): String = s"$root/lex_champions"
    def statsPath(root: String): String = s"$root/lex_stats"

    /** Derive and append one doc slice's index artifacts, tagged with
      * its increment id. The slice's postings frame is the ONLY input
      * — text was scanned upstream, once. */
    private def appendIndex(root: String, postings: DataFrame,
        incId: String): Unit = {
      def tag(df: DataFrame) = df.withColumn("inc_id", lit(incId))
      graft.storage.AstarteStore.appendAtomic(
        tag(postings), postingsPath(root))
      graft.storage.AstarteStore.appendAtomic(
        tag(postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))),
        dfreqPath(root))
      graft.storage.AstarteStore.appendAtomic(
        tag(HybridRetrieval.championsOf(postings,
          HybridRetrieval.Champions)), championsPath(root))
      graft.storage.AstarteStore.appendAtomic(
        tag(postings.select(col("doc_id"), col("dl")).distinct()
          .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))),
        statsPath(root))
    }

    /** Increment ids already in the log — the replay ledger
      * (stats is one row per generation: the cheapest read). */
    def absorbedIds(s: SparkSession, root: String): Set[String] =
      s.read.parquet(statsPath(root)).select(col("inc_id")).distinct()
        .collect().map(_.getString(0)).toSet

    /** Fold a judged increment's postings into the persisted index —
      * replay-idempotent via the ledger + per-inc_id read dedup.
      * Returns true when newly absorbed. */
    def absorb(s: SparkSession, root: String, incPostings: DataFrame,
        incId: String): Boolean = {
      if (absorbedIds(s, root).contains(incId)) return false
      appendIndex(root, incPostings, incId)
      true
    }

    /** Merge-on-read views (each folds replayed duplicates per inc_id
      * before merging across generations). */
    def postings(s: SparkSession, root: String): DataFrame =
      s.read.parquet(postingsPath(root))
        .dropDuplicates("inc_id", "doc_id", "tok")
        .select(col("doc_id"), col("tok"), col("tf"), col("dl"))
    def dfreq(s: SparkSession, root: String): DataFrame =
      s.read.parquet(dfreqPath(root))
        .groupBy(col("inc_id"), col("tok")).agg(max(col("df")).as("df"))
        .groupBy(col("tok")).agg(sum(col("df")).as("df"))
    def champions(s: SparkSession, root: String): DataFrame =
      s.read.parquet(championsPath(root))
        .dropDuplicates("inc_id", "doc_id", "tok")
        .select(col("doc_id"), col("tok"), col("tf"), col("dl"))
    def stats(s: SparkSession, root: String): DataFrame =
      s.read.parquet(statsPath(root))
        .groupBy(col("inc_id"))
        .agg(max(col("n_docs")).as("n_docs"), max(col("sum_dl")).as("sum_dl"))
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))

    /** Materialize the merged champion + dfreq views as TOK-BUCKETED
      * tables (the `SignatureStore.bucketizeBands` pattern) — the
      * serving layout that lets every corpus-side join/filter plan
      * with NO Exchange: bucketed scans satisfy the join's
      * distribution, broadcast hints carry the (tiny) increment and
      * query frames to them. Point-in-time like band bucketization:
      * generations absorbed afterwards are visible to the log views,
      * not to these tables until the next run. Returns
      * (championsTable, dfreqTable). */
    def bucketizeIndex(s: SparkSession, root: String,
        buckets: Int = 8): (String, String) = {
      val tag = f"${math.abs(root.hashCode.toLong)}%x"
      val champName = s"graft_lex_champ_$tag"
      val dfreqName = s"graft_lex_dfreq_$tag"
      champions(s, root).write.mode("overwrite")
        .bucketBy(buckets, "tok").sortBy("tok").saveAsTable(champName)
      dfreq(s, root).write.mode("overwrite")
        .bucketBy(buckets, "tok").sortBy("tok").saveAsTable(dfreqName)
      (champName, dfreqName)
    }
  }

  /** The increment's postings — text is scanned exactly here and
    * nowhere else (the spec's plan pin). */
  private[graft] def incrementPostings(s: SparkSession, d: String): DataFrame =
    HybridRetrieval.postingsOf(Tables.documents(s, d).filter(incPredicate))

  /** sim_lex_topk served from the persisted index + one increment
    * pass. Factored so the spec can drive it with directly-computed
    * frames. */
  private[graft] def serveIncremental(s: SparkSession, root: String,
      incP: DataFrame): DataFrame = {
    val dfreq = LexIndexStore.dfreq(s, root)
      .unionByName(incP.groupBy(col("tok")).agg(count(lit(1)).as("df")))
      .groupBy(col("tok")).agg(sum(col("df")).as("df"))
    val stats = LexIndexStore.stats(s, root)
      .unionByName(incP.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    // top-C(top-C(corpus) ∪ inc) = top-C(corpus ∪ inc): an index-sized
    // re-cut, the corpus postings themselves never rejoin the serve
    val champ = HybridRetrieval.championsOf(
      LexIndexStore.champions(s, root).unionByName(
        incP.select(col("doc_id"), col("tok"), col("tf"), col("dl"))),
      HybridRetrieval.Champions)
    val qpost = LexIndexStore.postings(s, root)
      .filter(col("doc_id") < HybridRetrieval.MaxQid)
      .unionByName(incP.filter(col("doc_id") < HybridRetrieval.MaxQid)
        .select(col("doc_id"), col("tok"), col("tf"), col("dl")))
    val qterms = HybridRetrieval.qtermsOf(qpost, dfreq)
    HybridRetrieval.bm25Serve(champ, qterms, stats)
      .select(col("qid"), col("nid"), col("score_u6"), col("lrank"))
  }

  /** sim_lex_topk served from the BUCKETIZED corpus layout + one
    * increment pass — the 100 TB serve shape, equal row for row to
    * [[serveIncremental]] (and so to the from-scratch oracle):
    *   - dfreq: only QUERY tokens ever need a merged df, so both
    *     branches (bucketed corpus scan, increment counts) filter
    *     through a broadcast of the query-token list BEFORE any
    *     aggregation — the corpus dfreq table is scanned, never
    *     shuffled;
    *   - champions: top-C(corpus ∪ inc) = corpus top-C for every token
    *     the increment does NOT touch (re-cutting ≤C rows is the
    *     identity), so untouched champions stream straight off the
    *     bucketed scan through a broadcast anti-join, and only the
    *     touched slice (increment-vocabulary-sized) pays the re-cut
    *     windows. Plan pinned in IncrementalRetrievalSpec.
    */
  private[graft] def serveBucketized(s: SparkSession, root: String,
      incP: DataFrame, champTable: String, dfreqTable: String): DataFrame = {
    val champT = s.table(champTable)
      .select(col("doc_id"), col("tok"), col("tf"), col("dl"))
    val dfreqT = s.table(dfreqTable).select(col("tok"), col("df"))
    // increment-vocab-sized, read by THREE consumers (the qtokDf union
    // branch and both champion-touch broadcasts) — without the
    // checkpoint each consumer re-runs the groupBy over the increment
    // postings as its own Exchange+HashAggregate subtree (r17 opt
    // round: the serve plan carried the same aggregation three times)
    val incDf = incP.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    val incToks = incDf.select(col("tok"))
    val stats = LexIndexStore.stats(s, root)
      .unionByName(incP.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val qpost = LexIndexStore.postings(s, root)
      .filter(col("doc_id") < HybridRetrieval.MaxQid)
      .unionByName(incP.filter(col("doc_id") < HybridRetrieval.MaxQid)
        .select(col("doc_id"), col("tok"), col("tf"), col("dl")))
      .localCheckpoint(true) // |Q|-sized; read by qtoks and qterms
    val qtoks = qpost.select(col("tok")).distinct()
    // merged df restricted to query tokens BEFORE the fold: the
    // groupBy shuffles query-sized rows, the corpus scan never does
    val qtokDf = dfreqT.join(broadcast(qtoks), Seq("tok"))
      .unionByName(incDf.join(broadcast(qtoks), Seq("tok")))
      .groupBy(col("tok")).agg(sum(col("df")).as("df"))
    val qterms = HybridRetrieval.qtermsOf(qpost, qtokDf)
    // bm25Serve inner-joins on the query tokens, so both champion
    // branches restrict to the broadcast qtoks slice BEFORE the
    // anti/semi division and the re-cut windows (r17 opt round, guide
    // §3.2): the untouched branch streams ≤|qtoks|·C rows instead of
    // the whole champion table, and the re-cut top-C windows run over
    // the (query ∩ touched) token slice only. championsOf is per-tok,
    // so the restriction commutes with the cut — identical rows reach
    // the join, pinned by the unchanged oracle hash and the
    // bucketized-equals-lazy spec case.
    val untouched = champT
      .join(broadcast(qtoks), Seq("tok"), "left_semi")
      .join(broadcast(incToks), Seq("tok"), "left_anti")
      .select(col("doc_id"), col("tok"), col("tf"), col("dl"))
    val recut = HybridRetrieval.championsOf(
      champT.join(broadcast(qtoks), Seq("tok"), "left_semi")
        .join(broadcast(incToks), Seq("tok"), "left_semi")
        .unionByName(incP
          .join(broadcast(qtoks), Seq("tok"), "left_semi")
          .select(col("doc_id"), col("tok"), col("tf"), col("dl"))),
      HybridRetrieval.Champions)
      .select(col("doc_id"), col("tok"), col("tf"), col("dl"))
    HybridRetrieval.bm25Serve(untouched.unionByName(recut), qterms, stats)
      .select(col("qid"), col("nid"), col("score_u6"), col("lrank"))
  }

  private val bucketized = new graft.core.BoundedMemo[
    String, (String, String)](64, "retrieval.bucketized")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_lex_incremental" -> ((s, d) => {
      val root = LexIndexStore.rootFor(s, d)
      val (champT, dfreqT) = bucketized.getOrElseUpdate(d)(
        LexIndexStore.bucketizeIndex(s, root))
      // the only text scan in the whole query — the increment's docs;
      // checkpointed because dfreq, stats, champions and the query
      // slice all read it
      val incP = incrementPostings(s, d).localCheckpoint(true)
      serveBucketized(s, root, incP, champT, dfreqT)
    })
  )

  override def oracle: Map[String, String] = Map(
    // from-scratch over the union = sim_lex_topk's own oracle: a hash
    // match proves the persisted index + increment pass equals the
    // full rebuild
    "sim_lex_incremental" -> HybridRetrieval.oracle("sim_lex_topk")
  )
}
