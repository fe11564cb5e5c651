package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental sketch maintenance — the monoid twin of
  * [[IncrementalDedup]]/[[IncrementalAnn]]: the corpus's HLL
  * registers and Count-Min counters are persisted ONCE through the
  * store's crash-safe append protocol, and each new event increment
  * merges into them without rescanning old events. This is how a
  * production pipeline keeps all-time distinct counts and frequency
  * tables over 100 TB: sketches are commutative monoids (HLL merge =
  * max per register, CMS merge = counter sum), so the store can be an
  * append-only log whose READ is the merge — no compare-and-swap, no
  * read-modify-write, and absorbing an increment is one atomic append
  * of ≤ sketch-size rows.
  *
  * Scale shape: the increment path scans ONLY the increment slice of
  * events (spec-pinned on the physical plan — exactly one
  * events.parquet scan); the corpus side is the ≤(groups·64)-row /
  * ≤512-row persisted sketch. Merge and estimate are control-plane
  * sized whatever the corpus was.
  *
  * Correctness anchor: because merge is associative and commutative,
  * the increment path must equal the from-scratch sketch over the
  * union — the DuckDB oracles recompute exactly that, so a
  * hash-match IS the incremental-equals-batch proof.
  *
  * Reference analogue: counters folded into persisted state rather
  * than recomputed — the exchanged bytes/messages counter columns'
  * merge discipline (`queries.ex:121-155`, `data_updater/impl.ex`
  * stats updates).
  */
object IncrementalSketch extends QueryPack {

  /** Increment membership: the most recent ~20% of events play the
    * "new batch" role (non-negative ids, `%` agrees across engines). */
  private val incPredicate = col("event_id") % 10 >= 8

  private[graft] object SketchStore {
    // LRU-bounded like every per-root control-plane memo (an evicted
    // sfDir simply rebuilds its root on the next touch)
    private val roots =
      new graft.core.BoundedMemo[String, String](64, "sketch.roots")

    def rootFor(s: SparkSession, sfDir: String): String =
      roots.getOrElseUpdate(sfDir)(buildRoot(s, sfDir))

    /** Uncached build of a fresh store root over the CORPUS slice
      * only (the spec uses this for mutation-isolated absorb tests). */
    private[graft] def buildRoot(s: SparkSession, sfDir: String): String = {
      val root =
        java.nio.file.Files.createTempDirectory("graft-sketch").toString
      val corpus = Tables.events(s, sfDir).filter(!incPredicate)
      graft.storage.AstarteStore.appendAtomic(
        SketchQueries.registersOf(
          corpus.select(col("event_type"), col("user_id")), "event_type")
          .withColumn("inc_id", lit("corpus")),
        hllPath(root))
      graft.storage.AstarteStore.appendAtomic(
        SketchQueries.cmsOfBatch(corpus.select(col("user_id")))
          .withColumn("inc_id", lit("corpus")),
        cmsPath(root))
      graft.storage.AstarteStore.appendAtomic(
        QuantileSketch.sketchOf(kllBaseOf(corpus))
          .withColumn("inc_id", lit("corpus")),
        kllPath(root))
      graft.storage.AstarteStore.appendAtomic(
        mgSummaryOf(s, corpus).withColumn("inc_id", lit("corpus")),
        mgPath(root))
      graft.storage.AstarteStore.appendAtomic(
        SketchQueries.amsOfBatch(corpus.select(col("user_id")))
          .withColumn("inc_id", lit("corpus")),
        amsPath(root))
      root
    }

    def hllPath(root: String): String = s"$root/sketch_hll"
    def cmsPath(root: String): String = s"$root/sketch_cms"
    def kllPath(root: String): String = s"$root/sketch_kll"
    def mgPath(root: String): String = s"$root/sketch_mg"
    def amsPath(root: String): String = s"$root/sketch_ams"

    /** The merge-on-read views: the log may hold any number of
      * absorbed generations; reading IS the monoid fold. For CMS the
      * fold deduplicates by increment id FIRST — a replayed absorb
      * lands rows identical to the original's under the same `inc_id`
      * (the builder is deterministic), so max-per-(inc_id, r, j)
      * collapses replays before the cross-increment sum. HLL needs no
      * ledger: max is idempotent outright. */
    def hllRegisters(s: SparkSession, root: String): DataFrame =
      s.read.parquet(hllPath(root))
        .groupBy(col("event_type"), col("bucket"))
        .agg(max(col("rho")).as("rho"))
    def cmsCounters(s: SparkSession, root: String): DataFrame =
      s.read.parquet(cmsPath(root))
        .groupBy(col("inc_id"), col("r"), col("j"))
        .agg(max(col("c")).as("c"))
        .groupBy(col("r"), col("j"))
        .agg(sum(col("c")).as("c"))
    /** Quantile-sketch items: merge is union (weights are absolute
      * counts), so the fold is just the read — with the same replay
      * defense as CMS: a replayed append lands rows identical to the
      * original's (the builder is deterministic and each uid survives
      * in at most one item), so a whole-row distinct per inc_id
      * collapses them before the union counts weight twice. */
    def kllItems(s: SparkSession, root: String): DataFrame =
      s.read.parquet(kllPath(root))
        .dropDuplicates("inc_id", "g", "uid", "v", "lvl")
        .select(col("g"), col("v"), col("uid"), col("lvl"))

    /** Heavy-hitter counters: same replay defense as CMS (the
      * builder is deterministic, so a replayed append's rows are
      * bit-identical and max-per-(inc_id, k) collapses them), then
      * the Misra–Gries pointwise-sum merge across generations. The
      * merged table is ≤ generations · Cap rows — control-plane
      * sized; the one-shot heavy cut runs on top of it. */
    def mgCounters(s: SparkSession, root: String): DataFrame =
      s.read.parquet(mgPath(root))
        .groupBy(col("inc_id"), col("k"))
        .agg(max(col("c")).as("c"))
        .groupBy(col("k"))
        .agg(sum(col("c")).as("c"))

    /** AMS tug-of-war sums: Z is a monoid under ADDITION, so the
      * fold is max-per-(inc_id, r) (the bit-identical-replay defense)
      * then sum across generations — d rows total. */
    def amsZ(s: SparkSession, root: String): DataFrame =
      s.read.parquet(amsPath(root))
        .groupBy(col("inc_id"), col("r"))
        .agg(max(col("z")).as("z"))
        .groupBy(col("r"))
        .agg(sum(col("z")).as("z"))

    /** Increment ids already in the log — the replay ledger. The log
      * is sketch-sized (≤ generations · sketch rows), so this is a
      * control-plane read however big the corpus was. */
    def absorbedIds(s: SparkSession, root: String): Set[String] =
      s.read.parquet(cmsPath(root)).select(col("inc_id")).distinct()
        .collect().map(_.getString(0)).toSet

    /** Fold an increment's sketches into the log — one atomic append
      * each, ≤ sketch-size rows, REPLAY-IDEMPOTENT end to end:
      *   - `incId` names the increment (a crawl/batch id — the same
      *     retried job must present the same id);
      *   - the ledger check skips an id the log already holds, so a
      *     retried absorb is a no-op (returns false);
      *   - the crash window (first append landed, retry raced the
      *     ledger read) is closed by the READ side: cmsCounters folds
      *     max-per-(inc_id, r, j) before summing, so even a double
      *     append of the same id counts once. HLL was always
      *     idempotent under max.
      * Returns true when the increment was newly absorbed. */
    def absorb(s: SparkSession, root: String, increment: DataFrame,
        incId: String): Boolean = {
      if (absorbedIds(s, root).contains(incId)) return false
      graft.storage.AstarteStore.appendAtomic(
        SketchQueries.registersOf(
          increment.select(col("event_type"), col("user_id")), "event_type")
          .withColumn("inc_id", lit(incId)),
        hllPath(root))
      graft.storage.AstarteStore.appendAtomic(
        SketchQueries.cmsOfBatch(increment.select(col("user_id")))
          .withColumn("inc_id", lit(incId)),
        cmsPath(root))
      graft.storage.AstarteStore.appendAtomic(
        QuantileSketch.sketchOf(kllBaseOf(increment))
          .withColumn("inc_id", lit(incId)),
        kllPath(root))
      graft.storage.AstarteStore.appendAtomic(
        mgSummaryOf(s, increment).withColumn("inc_id", lit(incId)),
        mgPath(root))
      graft.storage.AstarteStore.appendAtomic(
        SketchQueries.amsOfBatch(increment.select(col("user_id")))
          .withColumn("inc_id", lit(incId)),
        amsPath(root))
      true
    }
  }

  /** One slice's Misra–Gries summary as (k, c) rows — the imperative
    * aggregate IS the builder (one pass, ≤ Cap rows out); exact below
    * capacity, which is what makes a replayed append bit-identical
    * AND the incremental-equals-batch oracle a hash gate. */
  private[graft] def mgSummaryOf(s: SparkSession,
      events: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    events.filter(col("user_id").isNotNull)
      .agg(expr("mg_summary(user_id)").as("mg"))
      .select(expr("inline(mg)"))
  }

  /** The quantile sketch's (g, v, uid) base over an events slice —
    * the q_kll_percentiles value convention. */
  private[graft] def kllBaseOf(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .select(col("event_type").as("g"),
        round(col("value") * 100).cast("long").as("v"),
        col("event_id").as("uid"))

  /** The increment slice — the ONLY events scan in either query. */
  private[graft] def incrementEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(incPredicate)

  /** Merged per-type + `_all` estimates from persisted corpus
    * registers ⊕ increment registers. */
  private[graft] def hllMerged(s: SparkSession, d: String,
      root: String): DataFrame = {
    val incReg = SketchQueries.registersOf(
      incrementEvents(s, d).select(col("event_type"), col("user_id")),
      "event_type")
    // ≤ groups·64 rows; the estimate tail fans this frame out four
    // ways (distinct groups, two dense joins, the `_all` merge) — the
    // eager checkpoint materializes the increment scan ONCE instead
    // of once per consumer
    val perType = SketchStore.hllRegisters(s, root).unionByName(incReg)
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
      .localCheckpoint(true)
    val merged = perType.groupBy(col("bucket"))
      .agg(max(col("rho")).as("rho"))
      .select(lit("_all").as("event_type"), col("bucket"), col("rho"))
    SketchQueries.estimateOf(perType.unionByName(merged), "event_type")
  }

  /** Merged counter table from persisted corpus counters ⊕ increment
    * counters. */
  private[graft] def cmsMerged(s: SparkSession, d: String,
      root: String): DataFrame =
    SketchStore.cmsCounters(s, root)
      .unionByName(SketchQueries.cmsOfBatch(
        incrementEvents(s, d).select(col("user_id"))))
      .groupBy(col("r"), col("j"))
      .agg(sum(col("c")).as("c"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // all-time distinct-user estimates maintained incrementally: the
    // oracle recomputes from scratch over ALL events — a hash match
    // proves merge(persisted, increment) == batch
    "q_hll_incremental" -> ((s, d) =>
      hllMerged(s, d, SketchStore.rootFor(s, d))),
    // the all-time frequency sketch maintained incrementally — same
    // contract, fully integer
    "q_cms_incremental" -> ((s, d) =>
      cmsMerged(s, d, SketchStore.rootFor(s, d))),
    // all-time value percentiles maintained incrementally: the
    // increment is sketched on its own (the only events scan), the
    // persisted corpus summary merges by plain union (weights are
    // absolute), and the oracle replays sketch(corpus) ∪
    // sketch(increment) from scratch — a hash match proves the
    // persisted artifact plus an O(increment) pass equals the batch
    // merge. No exact audit columns here BY DESIGN: they would need
    // the full-corpus scan the incremental path exists to avoid (the
    // accuracy envelope lives in ApproxSketchSpec instead).
    // all-time heavy hitters maintained incrementally: persisted
    // corpus summary (pointwise-sum fold) ⊕ the increment's one-pass
    // summary, then the one-shot heavy cut — in the exact regime this
    // equals the from-scratch cut over ALL events, so the oracle is
    // q_mg_heavy's recompute verbatim (n_est naming); at 100 TB the
    // same merge carries the ε = 1/(Cap+1) Misra–Gries bound.
    "q_mg_incremental" -> ((s, d) => {
      val root = SketchStore.rootFor(s, d)
      val merged = SketchStore.mgCounters(s, root)
        .unionByName(mgSummaryOf(s, incrementEvents(s, d)))
        .groupBy(col("k")).agg(sum(col("c")).as("c"))
      merged.crossJoin(broadcast(SketchQueries.mgThreshold(
          merged, col("k"), col("c"), graft.functions.MgSummary.K)))
        .filter(col("c") > col("thresh"))
        .select(col("k").as("user_id"), col("c").as("n_est"),
          (col("c") - col("thresh")).as("mg_lb"), col("thresh"))
    }),
    // the all-time self-join-size estimate maintained incrementally:
    // Z sums add, so the merge is a d-row fold ∪ d-row increment —
    // the cheapest absorb in the store; exact F2 recomputes as the
    // audit (the oracle is q_ams_f2's from-scratch SQL shape)
    "q_ams_incremental" -> ((s, d) => {
      val root = SketchStore.rootFor(s, d)
      val merged = SketchStore.amsZ(s, root)
        .unionByName(SketchQueries.amsOfBatch(
          incrementEvents(s, d).select(col("user_id"))))
        .groupBy(col("r")).agg(sum(col("z")).as("z"))
      val exact = Tables.events(s, d).filter(col("user_id").isNotNull)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n")).as("f2_exact"))
      SketchQueries.amsEstimate(merged, exact)
    }),
    "q_kll_incremental" -> ((s, d) => {
      val root = SketchStore.rootFor(s, d)
      val incItems = QuantileSketch.sketchOf(
        kllBaseOf(incrementEvents(s, d)))
      val merged = SketchStore.kllItems(s, root).unionByName(incItems)
      QuantileSketch.quantilesOf(QuantileSketch.withAllRow(merged))
        .select(col("g").as("event_type"), col("sk_items"), col("w_tot"),
          col("p50_est"), col("p90_est"), col("p99_est"))
    })
  )

  override def oracle: Map[String, String] = Map(
    // from-scratch over the union — the incremental-equals-batch gate
    "q_hll_incremental" ->
      s"""WITH ${SketchQueries.regSql},
         |dense AS (
         |  SELECT g.event_type, b.bucket, coalesce(r.rho, 0) AS rho
         |  FROM (SELECT DISTINCT event_type FROM allreg) g
         |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bucket) b
         |  LEFT JOIN allreg r
         |    ON r.event_type = g.event_type AND r.bucket = b.bucket)
         |SELECT event_type,
         |  round(CASE WHEN 2904.064::DOUBLE / z <= 160 AND v > 0
         |    THEN 64 * ln(64.0::DOUBLE / v)
         |    ELSE 2904.064::DOUBLE / z END, 4) AS est_hll
         |FROM (
         |  SELECT event_type, sum(pow(2.0::DOUBLE, -rho)) AS z,
         |    sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v
         |  FROM dense GROUP BY 1)""".stripMargin,
    "q_cms_incremental" ->
      s"""WITH ${SketchQueries.cmsSql("SELECT user_id FROM events", "cms")}
         |SELECT r, j, c FROM cms""".stripMargin,
    // from-scratch one-shot cut over ALL events — the
    // incremental-equals-batch gate for the heavy-hitter family
    "q_mg_incremental" ->
      s"""WITH c AS (
         |  SELECT user_id, count(*) AS n_est FROM events
         |  WHERE user_id IS NOT NULL GROUP BY 1),
         |r AS (
         |  SELECT *, row_number() OVER
         |    (ORDER BY n_est DESC, user_id ASC) AS rn FROM c),
         |t AS (SELECT coalesce(max(CASE WHEN rn = ${graft.functions.MgSummary.K + 1}
         |  THEN n_est END), 0)::BIGINT AS thresh FROM r)
         |SELECT user_id, n_est, n_est - thresh AS mg_lb, thresh
         |FROM c CROSS JOIN t WHERE n_est > thresh""".stripMargin,
    // from-scratch tug-of-war over ALL events — Z-additivity is the
    // incremental-equals-batch identity
    "q_ams_incremental" ->
      s"""WITH ${SketchQueries.amsSql("SELECT user_id FROM events", "ams")},
         |ex AS (
         |  SELECT sum(n * n)::BIGINT AS f2_exact FROM (
         |    SELECT user_id, count(*) AS n FROM events
         |    WHERE user_id IS NOT NULL GROUP BY 1))
         |SELECT f2_exact, f2_est FROM ex CROSS JOIN ams""".stripMargin,
    // sketch(corpus) ∪ sketch(increment), both replayed from scratch —
    // union IS the quantile sketch's merge, so this is the
    // incremental-equals-batch gate for the fourth sketch family
    "q_kll_incremental" ->
      s"""WITH csrc AS (
         |  SELECT event_type AS g, round(value * 100)::BIGINT AS v,
         |    event_id AS uid
         |  FROM events WHERE value IS NOT NULL AND event_id % 10 < 8),
         |isrc AS (
         |  SELECT event_type AS g, round(value * 100)::BIGINT AS v,
         |    event_id AS uid
         |  FROM events WHERE value IS NOT NULL AND event_id % 10 >= 8),
         |${QuantileSketch.baseSql("c", "csrc")},
         |${QuantileSketch.roundsSql("c")},
         |${QuantileSketch.baseSql("i", "isrc")},
         |${QuantileSketch.roundsSql("i")},
         |merged AS (
         |  SELECT g, v, uid, lvl FROM c${QuantileSketch.Rounds}
         |  UNION ALL
         |  SELECT g, v, uid, lvl FROM i${QuantileSketch.Rounds}),
         |items AS (
         |  SELECT * FROM merged
         |  UNION ALL
         |  SELECT '_all' AS g, v, uid, lvl FROM merged),
         |${QuantileSketch.extractSql("items")}
         |SELECT g AS event_type, sk_items, w_tot,
         |  p50_est, p90_est, p99_est
         |FROM est""".stripMargin
  )
}
