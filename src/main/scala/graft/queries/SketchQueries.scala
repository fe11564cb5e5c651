package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HyperLogLog built from first principles as a relational
  * aggregation — the sketch that replaces exact COUNT(DISTINCT) at
  * 100 TB: registers are a groupBy(bucket).max(rho), so the corpus is
  * one partial-agg shuffle of ≤ m rows per group, the register table
  * is the persistable/mergeable artifact (merge = max per bucket —
  * demonstrated literally by the `_all` row), and the estimate reads
  * m rows. Flajolet et al. 2007; m = 64 registers (p = 6).
  *
  * Cross-engine determinism, layer by layer:
  *   - hash = first 15 hex chars of md5 (60 bits, always positive in
  *     a signed 64) — the pack-wide md5-prefix convention;
  *     bucket = h mod 64, suffix = h div 64 (54 bits; mod/div on
  *     non-negative values agree across engines);
  *   - rho = leading zeros of the suffix + 1 = 55 − length(bin(s))
  *     (both engines' `bin` renders without leading zeros; s = 0 is
  *     the 55 case) — integer-exact, no float log;
  *   - Σ 2^−rho sums powers of two with exponent spread ≤ 55, so the
  *     double sum is EXACTLY representable whatever the summation
  *     order — deterministic across engines;
  *   - the only libm calls are the final estimate's constants and
  *     ln(64/V) in the linear-counting branch, snapped by round(…,4)
  *     on identical inputs (the tx_bm25 idf precedent). The raw-
  *     estimate constant α·m² is the literal 2904.064 on BOTH sides
  *     so neither engine re-derives it with its own decimal rules.
  *
  * The small-range correction is the standard one: when the raw
  * estimate ≤ 2.5·m and empty registers exist, fall back to linear
  * counting m·ln(m/V). At sf0.01 (150 users) the linear branch is
  * live; at sf0.1 (1500) the raw branch is — both regimes are
  * oracle-checked.
  */
object SketchQueries extends QueryPack {

  private val M = 64
  private val W = 54 // suffix bits: 60-bit hash minus 6 bucket bits

  /** (group, bucket, rho) sparse registers for distinct user_id,
    * grouped by `groupCol`. */
  private[graft] def registersOf(src: DataFrame, groupCol: String): DataFrame =
    src.filter(col("user_id").isNotNull)
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(user_id as string)),1,15),16,10)" +
        " as bigint)"))
      .withColumn("bucket", pmod(col("h"), lit(M)).cast("int"))
      .withColumn("sfx", expr(s"h div $M"))
      .withColumn("rho", when(col("sfx") === 0, lit(W + 1))
        .otherwise(lit(W + 1) - length(bin(col("sfx")))))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("rho"))

  /** Dense registers (absent → 0) and the estimate per group. */
  private[queries] def estimateOf(reg: DataFrame, groupCol: String): DataFrame = {
    val dense = reg.select(col(groupCol)).distinct()
      .select(col(groupCol), explode(sequence(lit(0), lit(M - 1))).as("bucket"))
      .join(reg, Seq(groupCol, "bucket"), "left")
      .select(col(groupCol), col("bucket"),
        coalesce(col("rho"), lit(0)).as("rho"))
    dense.groupBy(col(groupCol))
      .agg(expr("sum(pow(cast(2.0 as double), -rho))").as("z"),
        sum(when(col("rho") === 0, 1).otherwise(0)).as("v"))
      .withColumn("est_hll", expr(
        "round(CASE WHEN cast(2904.064 as double) / z <= 160 AND v > 0" +
        " THEN 64 * ln(cast(64.0 as double) / v)" +
        " ELSE cast(2904.064 as double) / z END, 4)"))
      .select(col(groupCol), col("est_hll"))
  }

  // ── Count-Min sketch (Cormode & Muthukrishnan 2005) ──────────────
  // d=4 rows × w=128 counters; h_r(u) = first 8 md5 hex chars of
  // "r:u" mod 128. ENTIRELY integer — build, point query, and the
  // inner-product join-cardinality estimate have zero float ops, so
  // cross-engine parity is unconditional. Build is an explode(×4) of
  // the key column only plus one ≤512-row partial-agg shuffle — the
  // sketch replaces corpus-sized exact frequency tables at 100 TB,
  // and two sketches estimate a join size without running the join.
  private val CmsD = 4
  private val CmsW = 128

  /** (r, j, c): the d×w counter table over `src`'s user_id column. */
  private[graft] def cmsOf(src: DataFrame): DataFrame =
    src.filter(col("user_id").isNotNull)
      .select(col("user_id"),
        explode(sequence(lit(0), lit(CmsD - 1))).as("r"))
      .withColumn("j", expr(
        s"cast(conv(substring(md5(concat(cast(r as string), ':'," +
        s" cast(user_id as string))),1,8),16,10) as bigint) % $CmsW"))
      .groupBy(col("r"), col("j"))
      .agg(count(lit(1)).as("c"))

  /** [[cmsOf]] with the key dimension pre-aggregated (r17 opt round,
    * guide §2.3 "aggregate before you shuffle"): cell c(r,j) =
    * Σ_{u : h_r(u)=j} n(u), so the ×d per-EVENT explode and its d·N
    * md5 evaluations collapse to one partial-agg count per user
    * followed by a d·U-row explode (U = distinct users « N events).
    * Identical counts by associativity of +; the STREAMING twin keeps
    * [[cmsOf]] (one keyed streaming aggregation — a stacked agg would
    * not stream). Batch consumers (q_cms_heavy, q_cms_join_card,
    * q_mg_cms_probe, the IncrementalSketch store) all use this form. */
  private[graft] def cmsOfBatch(src: DataFrame): DataFrame =
    src.filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("un"))
      .select(col("user_id"), col("un"),
        explode(sequence(lit(0), lit(CmsD - 1))).as("r"))
      .withColumn("j", expr(
        s"cast(conv(substring(md5(concat(cast(r as string), ':'," +
        s" cast(user_id as string))),1,8),16,10) as bigint) % $CmsW"))
      .groupBy(col("r"), col("j"))
      .agg(sum(col("un")).as("c"))

  // ── KMV (k-minimum-values / bottom-k) sketch ─────────────────────
  // The set-operation sketch HLL cannot be: intersections. Keep the
  // k=32 smallest 60-bit hashes per set; |S| ≈ (k−1)·2⁶⁰/h_(k), and
  // |A∩B| ≈ (matches within the union's bottom-k)/k · |A∪B|-estimate
  // (Bar-Yossef et al. / theta-sketch style). Fully deterministic:
  // bottom-k selection is exact (TakeOrderedAndProject — a
  // distributed top-k, never a global sort), and the one division is
  // IEEE-exact on identical inputs (2⁶⁰ and 31·2⁶⁰ are exact doubles).
  private val KmvK = graft.functions.KmvBottomKAgg.K

  /** Bottom-k size for the per-source shingle sketches
    * (`dd_source_kmv`). */
  private val SrcK = 64

  // ── AMS F₂ (tug-of-war, Alon–Matias–Szegedy 1996) ────────────────
  // The moment sketch: F₂ = Σ_u c(u)² is the SELF-JOIN SIZE — the
  // statistic a query optimizer wants before planning a key join, and
  // the skew signal (uniform keys → F₂ ≈ N²/distinct; one hot key →
  // F₂ ≈ N²). Each estimator keeps ONE integer Z_r = Σ_events s_r(u)
  // with s_r(u) ∈ {±1} from the md5 convention; E[Z²] = F₂. The read
  // is the CLASSIC median-of-means: Z² alone is χ²(1)-shaped (its
  // median is 0.45·F₂ — a bare median-of-d systematically LOW), so
  // the d estimators average within groups of 8 first and the median
  // of the 3 group means is the estimate. ENTIRELY integer — build is
  // d running sums (one partial-agg pass, d rows of state), the
  // estimate folds d numbers — so cross-engine parity is
  // unconditional. Z is a monoid under ADDITION, which is what makes
  // the incremental and streaming twins one-liners. (Z² ≤ N²: past
  // ~3·10⁹ rows per group the squares move to decimal — the same
  // 128-bit escape as the Gini rank-sum.)
  private val AmsD = 24
  private val AmsGroup = 8 // 3 groups of 8

  /** (r, z): the d tug-of-war sums over `src`'s user_id column. ONE
    * md5 per row serves all d signs — sign_r is the parity of the
    * digest's r-th hex digit (md5 bits are independent), so the hash
    * hoists above the ×d explode instead of running d times.
    *
    * Kept in the explode/groupBy(r) shape because the STREAMING twin
    * ([[graft.streaming.StreamingSketch.amsZ]]) needs a keyed
    * streaming aggregation; batch consumers use [[amsOfBatch]], whose
    * single multi-aggregate pass produces the identical (r, z) rows
    * without materializing d rows per event. */
  private[graft] def amsOf(src: DataFrame): DataFrame =
    src.filter(col("user_id").isNotNull)
      .select(expr("md5(concat('s:', cast(user_id as string)))").as("h"),
        explode(sequence(lit(0), lit(AmsD - 1))).as("r"))
      .withColumn("s", expr(
        "1 - 2 * (cast(conv(substring(h, r + 1, 1),16,10) as bigint) % 2)"))
      .groupBy(col("r")).agg(sum(col("s")).as("z"))

  /** [[amsOf]] as ONE aggregate pass — the batch form (r17 opt round,
    * guide §2.3 "aggregate before you shuffle" taken to its limit):
    * instead of exploding every event into d=24 rows and hash-
    * aggregating 24·N rows by r, the d sums are d codegen'd SUM
    * buffers over the un-exploded scan (zero explode rows, one
    * 24-column partial-agg per partition, a 1-row final merge),
    * unpivoted to the same (r, z) rows with `stack`. Sign extraction
    * replaces 24 substring+conv string ops per row with two convs
    * (digits 1–15 → a 60-bit long, digits 16–24 → a 36-bit long) and
    * 24 shift-and-mask ops: digit r+1's low bit is bit 4·(14−r) of
    * m1 (r < 15) or bit 4·(23−r) of m2 (r ≥ 15) — the identical
    * parity, so z_r is bit-for-bit the explode form's sum, which the
    * oracle replays unchanged. The trailing isNotNull filter makes
    * the empty-input edge exact too (agg-without-keys yields one
    * null-sum row where groupBy yields none). */
  private[graft] def amsOfBatch(src: DataFrame): DataFrame = {
    val sums = (0 until AmsD).map { r =>
      val bit =
        if (r < 15) s"(shiftright(m1, ${4 * (14 - r)}) & 1)"
        else s"(shiftright(m2, ${4 * (23 - r)}) & 1)"
      sum(expr(s"1 - 2 * $bit")).as(s"z$r")
    }
    src.filter(col("user_id").isNotNull)
      .select(expr("md5(concat('s:', cast(user_id as string)))").as("h"))
      .select(
        expr("cast(conv(substring(h, 1, 15), 16, 10) as bigint)").as("m1"),
        expr("cast(conv(substring(h, 16, 9), 16, 10) as bigint)").as("m2"))
      .agg(sums.head, sums.tail: _*)
      .selectExpr(s"stack($AmsD, " +
        (0 until AmsD).map(r => s"$r, z$r").mkString(", ") + ") as (r, z)")
      .filter(col("z").isNotNull)
  }

  /** Median-of-group-means estimate beside the exact F₂ audit — a
    * d-row fold, never data-sized. Integer throughout (group mean =
    * sum div group size). */
  private[graft] def amsEstimate(z: DataFrame, exact: DataFrame): DataFrame = {
    val gm = z.select(expr(s"r div $AmsGroup").as("grp"),
        (col("z") * col("z")).as("zsq"))
      .groupBy(col("grp"))
      .agg(expr(s"cast(sum(zsq) div $AmsGroup as bigint)").as("gm"))
    val est = gm
      .withColumn("rn", row_number().over(
        Window.orderBy(col("gm"), col("grp"))))
      .filter(col("rn") === (AmsD / AmsGroup + 1) / 2)
      .select(col("gm").as("f2_est"))
    exact.crossJoin(broadcast(est))
  }

  /** The d-sign SQL replay (shared by the oracles). */
  private[graft] def amsSql(srcSql: String, name: String): String =
    s"""${name}_z AS (
       |  SELECT r, sum(1 - 2 * (('0x' || substr(md5('s:' ||
       |      user_id::VARCHAR), r + 1, 1))::BIGINT % 2))::BIGINT AS z
       |  FROM ($srcSql) CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${AmsD - 1})) AS r) rr
       |  WHERE user_id IS NOT NULL GROUP BY r),
       |${name}_g AS (
       |  SELECT r // $AmsGroup AS grp,
       |    (sum(z * z) // $AmsGroup)::BIGINT AS gm
       |  FROM ${name}_z GROUP BY 1),
       |$name AS (
       |  SELECT gm AS f2_est FROM (
       |    SELECT gm, row_number() OVER (ORDER BY gm, grp) AS rn
       |    FROM ${name}_g)
       |  WHERE rn = ${(AmsD / AmsGroup + 1) / 2})""".stripMargin

  // ── Misra–Gries heavy hitters ────────────────────────────────────
  // The sketch that answers "top-k keys with frequency bounds in one
  // pass" directly — before this, the family needed the exact heavy
  // list as INPUT (q_cms_heavy point-probes candidates). The
  // deterministic formulation is the canonical ONE-SHOT reduction
  // over exact per-key counts: threshold T = the (K+1)-st largest
  // count under the canonical (count desc, key asc) order; survivors
  // are keys STRICTLY above T — ≤ K of them by definition, no
  // tie-break needed for the set — with guaranteed-lower-bound
  // residuals c − T (Misra–Gries 1982; T ≤ N/(K+1)). Per-key counts
  // are one partial-agg shuffle; the threshold is an exact two-phase
  // top-(K+1) (TwoPhaseTopK shards), never a global sort.
  private val MgK = graft.functions.MgSummary.K

  /** 1-row frame holding the (k+1)-st largest count as `thresh`
    * (0 when fewer than k+1 keys). */
  private[graft] def mgThreshold(counts: DataFrame, key: org.apache.spark.sql.Column,
      cnt: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val n = graft.operators.TwoPhaseTopK.shards(counts)
    val w1 = Window.partitionBy(col("__mg_shard")).orderBy(cnt.desc, key.asc)
    val w2 = Window.orderBy(cnt.desc, key.asc) // ≤ shards·(k+1) rows
    counts
      .withColumn("__mg_shard", graft.operators.TwoPhaseTopK.shardCol(key, n))
      .withColumn("__mg_r1", row_number().over(w1))
      .filter(col("__mg_r1") <= k + 1)
      .withColumn("__mg_r2", row_number().over(w2))
      .agg(coalesce(max(when(col("__mg_r2") === k + 1, cnt)), lit(0L))
        .as("thresh"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sketch-accelerated cross-source contamination: per-source
    // bottom-64 KMV sketches over 5-gram shingle hashes estimate the
    // pairwise Jaccard matrix — the 100 TB form of dd_source_overlap,
    // where exact pairwise shingle intersection is a corpus-sized
    // join but sketches are 64 rows per source, built in one
    // partial-agg pass and compared entirely in the control plane.
    // Bottom-k per source is the exact two-phase distributed top-K
    // (shard rank, then rank the ≤32·k survivors). Exact Jaccard
    // rides along as the audit columns; everything is integer
    // (jaccard in basis points via integer division), so cross-engine
    // parity is unconditional.
    "dd_source_kmv" -> ((s, d) => {
      // ONE (h)-keyed shuffle replaces the old TWO data-sized
      // exchanges (r18, guide §2.4): the old shape shuffled every
      // shingle row for `.distinct()` on (source, h) and then AGAIN
      // for the audit's groupBy(h) membership sets; grouping by h
      // once with a map-side-partial collect_set gives the distinct
      // (source, h) pairs (exploded back out) AND the per-hash source
      // sets from the same exchange. Values are identical by
      // construction — explode(collect_set) IS the distinct pair set.
      val grouped = Tables.documentsParallel(s, d)
        .select(col("source"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 5)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(tk) - 4)," +
          " i -> concat_ws(' ', slice(tk, i, 5)))")).as("g"))
        .select(col("source"), expr(
          "cast(conv(substring(md5(g),1,15),16,10) as bigint)").as("h"))
        .groupBy(col("h"))
        .agg(array_sort(collect_set(col("source"))).as("ss"))
        .localCheckpoint(true) // feeds sketches AND the exact audit
      val sh = grouped
        .select(explode(col("ss")).as("source"), col("h"))
      // exact two-phase bottom-SrcK per source — shard count scales
      // with session parallelism (TwoPhaseTopK) so one giant source's
      // shingle set never concentrates in a fixed number of phase-one
      // partitions; the bottom-k identity is shard-count-invariant
      val w1 = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("h").asc)
      val w2 = Window.partitionBy(col("source")).orderBy(col("h").asc)
      val sk = sh.withColumn("shard", pmod(col("h"),
          lit(graft.operators.TwoPhaseTopK.shards(sh))))
        .withColumn("r1", row_number().over(w1)).filter(col("r1") <= SrcK)
        .withColumn("r2", row_number().over(w2)).filter(col("r2") <= SrcK)
        .select(col("source"), col("h"))
        .localCheckpoint(true) // ≤ sources·SrcK rows; joined three ways
      val pairs = sk.select(col("source").as("source_a")).distinct()
        .crossJoin(sk.select(col("source").as("source_b")).distinct())
        .filter(col("source_a") < col("source_b"))
      // pooled per-pair hashes with side membership, then the pair's
      // bottom-SrcK union sketch and the in-both census
      val wp = Window.partitionBy(col("source_a"), col("source_b"))
        .orderBy(col("h").asc)
      val est = pairs
        .join(sk, col("source") === col("source_a") ||
          col("source") === col("source_b"))
        .groupBy(col("source_a"), col("source_b"), col("h"))
        .agg(countDistinct(col("source")).as("sides"))
        .withColumn("ur", row_number().over(wp))
        .filter(col("ur") <= SrcK)
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("ucnt"),
          sum(when(col("sides") === 2, 1L).otherwise(0L)).as("both"))
        .select(col("source_a"), col("source_b"),
          expr("both * 10000 div ucnt").as("est_jacc_bp"))
      // exact audit: per-pair intersection straight off the grouped
      // membership sets (no re-shuffle — the old groupBy(h) here was
      // the second data-sized exchange this rewrite removes); sizes
      // per source is a partial-agg over the exploded pairs
      val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("sz"))
      val inter = grouped
        .select(explode(flatten(transform(col("ss"), (a, i) =>
          transform(slice(col("ss"), i + lit(2), size(col("ss"))),
            b => struct(a.as("source_a"), b.as("source_b")))))).as("p"))
        .groupBy(col("p.source_a").as("source_a"),
          col("p.source_b").as("source_b"))
        .agg(count(lit(1)).as("n_inter"))
      val exact = inter
        .join(sizes.select(col("source").as("source_a"), col("sz").as("sza")),
          Seq("source_a"))
        .join(sizes.select(col("source").as("source_b"), col("sz").as("szb")),
          Seq("source_b"))
        .select(col("source_a"), col("source_b"),
          expr("n_inter * 10000 div (sza + szb - n_inter)")
            .as("exact_jacc_bp"))
      est.join(exact, Seq("source_a", "source_b"), "left")
        .select(col("source_a"), col("source_b"),
          coalesce(col("exact_jacc_bp"), lit(0L)).as("exact_jacc_bp"),
          col("est_jacc_bp"))
    }),
    // "how many high-quality English documents?" answered from
    // sketches: A = quality gate (n_chars ≥ 400), B = lang = 'en';
    // exact counts ride along as the audit columns. ONE corpus scan:
    // rows are tagged with set membership and checkpointed, every
    // sketch and exact count derives from the tagged frame.
    "q_kmv_intersect" -> ((s, d) => {
      val tagged = Tables.documents(s, d)
        .select(expr("cast(conv(substring(md5(cast(doc_id as string))" +
            ",1,15),16,10) as bigint)").as("h"),
          when(col("n_chars") >= 400, 1).otherwise(0).as("in_a"),
          when(col("lang") === "en", 1).otherwise(0).as("in_b"))
        .groupBy(col("h"))
        .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
        .localCheckpoint(true) // 4 consumers below; scan the corpus once
      def sk(pred: org.apache.spark.sql.Column) = tagged.filter(pred)
        .orderBy(col("h")).limit(KmvK)
      def estOf(sketch: DataFrame, name: String) = sketch
        .agg(count(lit(1)).as("cnt"), max(col("h")).as("mx"))
        .select(expr(
          s"CASE WHEN cnt < $KmvK THEN cast(cnt as double)" +
          s" ELSE round(cast(${KmvK - 1} as double) *" +
          s" cast(${1L << 60} as double) / mx, 4) END").as(name),
          col("cnt").as(s"${name}_cnt"))
      val exacts = tagged.agg(
        sum(col("in_a")).as("n_a"), sum(col("in_b")).as("n_b"),
        sum(col("in_a") * col("in_b")).as("n_inter"))
      val estA = estOf(sk(col("in_a") === 1), "est_a").select("est_a")
      val estB = estOf(sk(col("in_b") === 1), "est_b").select("est_b")
      val ku = sk(col("in_a") === 1 || col("in_b") === 1)
      val estU = ku
        .agg(count(lit(1)).as("cnt"), max(col("h")).as("mx"),
          sum(col("in_a") * col("in_b")).as("both"))
        .select(expr(
          s"CASE WHEN cnt < $KmvK THEN cast(both as double)" +
          " ELSE round(cast(both as double) *" +
          s" (cast(${KmvK - 1} as double) * cast(${1L << 60} as double)" +
          s" / mx) / $KmvK, 4) END").as("est_inter"))
      exacts.crossJoin(estA).crossJoin(estB).crossJoin(estU)
    }),
    // the SET-DIFFERENCE read ("how many quality documents are NOT
    // English" — the how-many-did-we-lose question): same bottom-k
    // union sketch, estimated from its side-membership census —
    // |A∖B| ≈ (union members with in_a ∧ ¬in_b)/k · Û. Exact when the
    // union fits under k (the oracle regime at small corpora); the
    // exact census rides along as the audit either way.
    "q_kmv_diff" -> ((s, d) => {
      val tagged = Tables.documents(s, d)
        .select(expr("cast(conv(substring(md5(cast(doc_id as string))" +
            ",1,15),16,10) as bigint)").as("h"),
          when(col("n_chars") >= 400, 1).otherwise(0).as("in_a"),
          when(col("lang") === "en", 1).otherwise(0).as("in_b"))
        .groupBy(col("h"))
        .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
        .localCheckpoint(true) // sketch + exact audit below
      val est = tagged.filter(col("in_a") === 1 || col("in_b") === 1)
        .orderBy(col("h")).limit(KmvK)
        .agg(count(lit(1)).as("cnt"), max(col("h")).as("mx"),
          sum(col("in_a") * (lit(1) - col("in_b"))).as("only_a"))
        .select(expr(
          s"CASE WHEN cnt < $KmvK THEN cast(only_a as double)" +
          " ELSE round(cast(only_a as double) *" +
          s" (cast(${KmvK - 1} as double) * cast(${1L << 60} as double)" +
          s" / mx) / $KmvK, 4) END").as("est_diff"))
      tagged.agg(sum(col("in_a")).as("n_a"),
          sum(col("in_a") * (lit(1) - col("in_b"))).as("n_diff"))
        .crossJoin(est)
    }),
    // point-query audit: CMS estimates vs exact counts for the ten
    // heaviest users (estimate >= exact always — pinned in the spec)
    "q_cms_heavy" -> ((s, d) => {
      val src = Tables.events(s, d).select(col("user_id"))
      val cms = cmsOfBatch(src)
      val top = src.filter(col("user_id").isNotNull)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id").asc).limit(10)
      top.select(col("user_id"), col("n_exact"),
          explode(sequence(lit(0), lit(CmsD - 1))).as("r"))
        .withColumn("j", expr(
          s"cast(conv(substring(md5(concat(cast(r as string), ':'," +
          s" cast(user_id as string))),1,8),16,10) as bigint) % $CmsW"))
        .join(cms, Seq("r", "j"))
        .groupBy(col("user_id"))
        .agg(first(col("n_exact")).as("n_exact"), min(col("c")).as("n_est"))
    }),
    // self-join size in ONE pass and d integers of state: the AMS F₂
    // estimate beside the exact Σ c(u)² audit (the audit is the exact
    // twin the sketch replaces — at 100 TB only the d-row sketch runs)
    "q_ams_f2" -> ((s, d) => {
      val src = Tables.events(s, d).select(col("user_id"))
      val exact = src.filter(col("user_id").isNotNull)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n")).as("f2_exact"))
      amsEstimate(amsOfBatch(src), exact)
    }),
    // join-size estimation from two INDEPENDENT d-integer sketches —
    // the AMS twin of q_cms_join_card: E[Z_A·Z_B] = Σ_u c_A(u)·c_B(u)
    // (the join size), read by the same median-of-group-means; exact
    // cardinality rides along as the audit
    "q_ams_join_card" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val za = amsOfBatch(ev.filter(col("event_type") === "click")
        .select(col("user_id")))
      val zb = amsOfBatch(ev.filter(col("event_type") === "purchase")
        .select(col("user_id")))
      // sign products are SIGNED, so the group sum can go negative —
      // Spark `div` truncates toward zero while DuckDB `//` floors, so
      // the quotient must be floored explicitly (subtract the
      // positive remainder first; the adjusted numerator is an exact
      // multiple, where truncation and floor agree)
      val prod = za.join(zb.withColumnRenamed("z", "zb"), Seq("r"))
        .select(expr(s"r div $AmsGroup").as("grp"),
          (col("z") * col("zb")).as("p"))
        .groupBy(col("grp"))
        .agg(sum(col("p")).as("ps"))
        .select(col("grp"), expr(
          s"cast((ps - (((ps % $AmsGroup) + $AmsGroup) % $AmsGroup))" +
            s" div $AmsGroup as bigint)").as("gm"))
      val est = prod
        .withColumn("rn", row_number().over(
          Window.orderBy(col("gm"), col("grp"))))
        .filter(col("rn") === (AmsD / AmsGroup + 1) / 2)
        .select(col("gm").as("est_card"))
      val exact = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(count(lit(1)).as("ca"))
        .join(ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(count(lit(1)).as("cb")),
          Seq("user_id"))
        .agg(sum(col("ca") * col("cb")).as("true_card"))
      exact.crossJoin(broadcast(est))
    }),
    // one-pass heavy hitters: the canonical one-shot Misra–Gries cut
    // over the global user dimension — exact counts ride along as the
    // audit column; mg_lb is the guaranteed lower bound (= n_exact − T)
    "q_mg_heavy" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      counts.crossJoin(broadcast(
          mgThreshold(counts, col("user_id"), col("n_exact"), MgK)))
        .filter(col("n_exact") > col("thresh"))
        .select(col("user_id"), col("n_exact"),
          (col("n_exact") - col("thresh")).as("mg_lb"), col("thresh"))
    }),
    // the CUSTOM-AGGREGATE form: one TypedImperativeAggregate pass per
    // event_type whose ≤ Cap-entry buffer IS the Misra–Gries summary
    // (exact below capacity — the oracle regime; ε = 1/(Cap+1) above
    // it — the 100 TB regime, bound pinned in MgAggSpec). The heavy
    // cut then runs over the INLINED summaries: windows over ≤ Cap
    // rows per group by construction, never event-sized.
    "q_mg_agg" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val summaries = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(expr("mg_summary(user_id)").as("mg"))
        .select(col("event_type"), expr("inline(mg)"))
      val g = Window.partitionBy(col("event_type"))
      val w = g.orderBy(col("c").desc, col("k").asc)
      summaries
        .withColumn("rn", row_number().over(w))
        .withColumn("thresh", coalesce(
          max(when(col("rn") === MgK + 1, col("c"))).over(g), lit(0L)))
        .filter(col("c") > col("thresh"))
        .select(col("event_type"), col("k").as("user_id"),
          col("c").as("n_est"),
          (col("c") - col("thresh")).as("mg_lb"), col("thresh"))
    }),
    // the all-sketch composition the MG family unlocks: candidates
    // come from the Misra–Gries cut (q_cms_heavy needs the exact
    // heavy list as INPUT; this needs none) and their frequencies
    // from CMS point probes — at 100 TB both inputs are sketch-sized.
    // Exact counts ride along as the audit column, and the output
    // carries the full sandwich every row must satisfy:
    // mg_lb ≤ n_exact ≤ n_cms.
    "q_mg_cms_probe" -> ((s, d) => {
      val src = Tables.events(s, d).select(col("user_id"))
      val cms = cmsOfBatch(src)
      val counts = src.filter(col("user_id").isNotNull)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      val cand = counts.crossJoin(broadcast(
          mgThreshold(counts, col("user_id"), col("n_exact"), MgK)))
        .filter(col("n_exact") > col("thresh"))
      cand
        .select(col("user_id"), col("n_exact"),
          (col("n_exact") - col("thresh")).as("mg_lb"),
          explode(sequence(lit(0), lit(CmsD - 1))).as("r"))
        .withColumn("j", expr(
          s"cast(conv(substring(md5(concat(cast(r as string), ':'," +
          s" cast(user_id as string))),1,8),16,10) as bigint) % $CmsW"))
        .join(cms, Seq("r", "j"))
        .groupBy(col("user_id"))
        .agg(min(col("n_exact")).as("n_exact"), min(col("mg_lb")).as("mg_lb"),
          min(col("c")).as("n_cms"))
    }),
    // join-size estimation WITHOUT the join: |A ⋈_user B| =
    // Σ_u c_A(u)·c_B(u), estimated by min_r Σ_j A_r[j]·B_r[j] —
    // the CMS inner-product estimator, beside the exact cardinality
    "q_cms_join_card" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val a = cmsOfBatch(ev.filter(col("event_type") === "click")
        .select(col("user_id")))
      val b = cmsOfBatch(ev.filter(col("event_type") === "purchase")
        .select(col("user_id")))
      val est = a.join(b.withColumnRenamed("c", "cb"), Seq("r", "j"))
        .groupBy(col("r")).agg(sum(col("c") * col("cb")).as("ip"))
        .agg(min(col("ip")).as("est_card"))
      val exact = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(count(lit(1)).as("ca"))
        .join(ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(count(lit(1)).as("cb")),
          Seq("user_id"))
        .agg(sum(col("ca") * col("cb")).as("true_card"))
      exact.crossJoin(est)
    }),
    // the CUSTOM-AGGREGATE form of the CMS build: one
    // TypedImperativeAggregate pass whose 4 KiB buffer IS the d×w
    // counter table — per group ONE buffer flows through
    // partial/final aggregation instead of ≤512 (r, j, c) rows
    // through a shuffle. The d column indices stay in codegen'd SQL
    // (same md5 arithmetic as cmsOf); only the counter fold is
    // imperative. The oracle recomputes relationally, so a hash match
    // IS the imperative-equals-relational gate (also pinned per
    // counter in CmsAggSpec).
    "q_cms_agg" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .withColumn("js", expr(
          s"transform(sequence(0, ${CmsD - 1}), r ->" +
          " cast(conv(substring(md5(concat(cast(r as string), ':'," +
          s" cast(user_id as string))),1,8),16,10) as bigint) % $CmsW)"))
        .groupBy(col("event_type"))
        .agg(expr("cms_counters(js)").as("cnts"))
        .select(col("event_type"),
          posexplode(col("cnts")).as(Seq("pos", "c")))
        .filter(col("c") > 0) // sparse, like the relational groupBy
        .select(col("event_type"),
          expr(s"pos div $CmsW").cast("int").as("r"),
          expr(s"pos % $CmsW").cast("long").as("j"),
          col("c"))
    }),
    // the CUSTOM-AGGREGATE form of the HLL build: one
    // TypedImperativeAggregate pass whose 64-byte buffer IS the
    // sketch — per group ONE buffer flows through partial/final
    // aggregation instead of 64 rows through a shuffle. Hash stays in
    // codegen'd SQL; only the register fold is imperative. Same
    // estimates as q_hll_users' relational path (cross-path agreement
    // pinned in HllAggSpec; the oracle recomputes relationally).
    // imperative-equals-relational gate for the bottom-k sketch: the
    // TreeSet-buffered kmv_bottomk aggregate (≤ 8k-byte buffer per
    // group through partial/final agg, not k rows through a
    // TakeOrdered) must produce exactly the distinct bottom-32 the
    // relational path computes — compared through the count /
    // k-th-minimum / estimate triple a KMV read serves. Below-k
    // groups hit the exact branch; at-k groups the estimator branch.
    "q_kmv_agg" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .withColumn("h", expr(
          "cast(conv(substring(md5(cast(user_id as string)),1,15),16,10)" +
          " as bigint)"))
        .groupBy(col("event_type"))
        .agg(expr("kmv_bottomk(h)").as("kmv"))
        .select(col("event_type"),
          size(col("kmv")).cast("long").as("kmv_cnt"),
          expr("element_at(kmv, -1)").as("kmv_max"),
          expr(s"CASE WHEN size(kmv) < $KmvK THEN cast(size(kmv) as double)" +
            s" ELSE round(cast(${KmvK - 1} as double) *" +
            s" cast(${1L << 60} as double)" +
            " / element_at(kmv, -1), 4) END").as("est_kmv"))
    }),
    "q_hll_agg" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .withColumn("h", expr(
          "cast(conv(substring(md5(cast(user_id as string)),1,15),16,10)" +
          " as bigint)"))
        .groupBy(col("event_type"))
        .agg(expr("hll_registers(h)").as("regs"))
        .withColumn("z", expr("aggregate(regs, cast(0.0 as double)," +
          " (acc, r) -> acc + pow(cast(2.0 as double), -r))"))
        .withColumn("v", expr("size(filter(regs, r -> r = 0))"))
        .withColumn("est_hll", expr(
          "round(CASE WHEN cast(2904.064 as double) / z <= 160 AND v > 0" +
          " THEN 64 * ln(cast(64.0 as double) / v)" +
          " ELSE cast(2904.064 as double) / z END, 4)"))
        .select(col("event_type"), col("est_hll"))
    }),
    // distinct users PER DAY from daily register tables — the
    // windowed sketch a dashboard reads: 64 rows per day however many
    // events the day held, integer day buckets from the canonical
    // epoch-nanos ts (floor-div, mirroring date_trunc for positive
    // epochs). Exact counts ride along as the audit columns.
    "w_hll_daily" -> ((s, d) => {
      val src = Tables.events(s, d)
        .select(expr("((ts div 1000000) div 86400000) * 86400000")
          .as("day_start_ms"), col("user_id"))
      val est = estimateOf(registersOf(src, "day_start_ms"), "day_start_ms")
      val exact = src.filter(col("user_id").isNotNull)
        .groupBy(col("day_start_ms"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      est.join(exact, Seq("day_start_ms"))
        .select(col("day_start_ms"), col("n_exact"), col("est_hll"))
    }),
    // daily heavy hitters — the windowed twin of q_mg_heavy next to
    // w_hll_daily: per event-time day, the one-shot Misra–Gries cut
    // over that day's user dimension. The per-day threshold is an
    // exact two-phase top-(K+1) WITHIN each day (shard windows first,
    // ≤ shards·(K+1) rows reach any single day partition), and the
    // day-threshold table that joins back is calendar-sized.
    "w_mg_daily" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(expr("((ts div 1000000) div 86400000) * 86400000")
          .as("day_start_ms"), col("user_id"))
        .groupBy(col("day_start_ms"), col("user_id"))
        .agg(count(lit(1)).as("n_exact"))
      val n = graft.operators.TwoPhaseTopK.shards(counts)
      val ord = Seq(col("n_exact").desc, col("user_id").asc)
      val w1 = Window.partitionBy(col("day_start_ms"), col("shard"))
        .orderBy(ord: _*)
      val w2 = Window.partitionBy(col("day_start_ms")).orderBy(ord: _*)
      val thresh = counts
        .withColumn("shard",
          graft.operators.TwoPhaseTopK.shardCol(col("user_id"), n))
        .withColumn("r1", row_number().over(w1))
        .filter(col("r1") <= MgK + 1)
        .withColumn("r2", row_number().over(w2))
        .groupBy(col("day_start_ms"))
        .agg(coalesce(max(when(col("r2") === MgK + 1, col("n_exact"))),
          lit(0L)).as("thresh"))
      counts.join(broadcast(thresh), Seq("day_start_ms"))
        .filter(col("n_exact") > col("thresh"))
        .select(col("day_start_ms"), col("user_id"), col("n_exact"),
          (col("n_exact") - col("thresh")).as("mg_lb"), col("thresh"))
    }),
    // the shippable artifact: the global dense register table — 64
    // integer rows that summarize every user_id in the corpus
    "q_hll_registers" -> ((s, d) => {
      val reg = registersOf(
        Tables.events(s, d).select(lit("g").as("g"), col("user_id")), "g")
      reg.sparkSession.range(M).select(col("id").cast("int").as("bucket"))
        .join(reg.drop("g"), Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("rho"), lit(0)).as("rho"))
    }),
    // per-event_type distinct-user estimates plus the merged `_all`
    // row (register max-merge — the HLL mergeability property,
    // exercised literally), each against the exact count
    "q_hll_users" -> ((s, d) => {
      val src = Tables.events(s, d).select(col("event_type"), col("user_id"))
      val perType = registersOf(src, "event_type")
      val merged = perType.groupBy(col("bucket"))
        .agg(max(col("rho")).as("rho"))
        .select(lit("_all").as("event_type"), col("bucket"), col("rho"))
      val est = estimateOf(perType.unionByName(merged), "event_type")
      val exact = src.filter(col("user_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .unionByName(src.filter(col("user_id").isNotNull)
          .agg(countDistinct(col("user_id")).as("n_exact"))
          .select(lit("_all").as("event_type"), col("n_exact")))
      est.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_exact"), col("est_hll"))
    })
  )

  /** Shared register-building SQL (sparse, per event_type + `_all`). */
  private[queries] def regSql: String =
    s"""src AS (
       |  SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL),
       |h AS (
       |  SELECT event_type,
       |    ('0x' || substr(md5(user_id::VARCHAR),1,15))::BIGINT AS h
       |  FROM src),
       |rr AS (
       |  SELECT event_type, (h % $M)::INT AS bucket,
       |    max(CASE WHEN h // $M = 0 THEN ${W + 1}
       |             ELSE ${W + 1} - length(bin(h // $M)) END)::INT AS rho
       |  FROM h GROUP BY 1, 2),
       |allreg AS (
       |  SELECT * FROM rr
       |  UNION ALL
       |  SELECT '_all' AS event_type, bucket, max(rho) AS rho
       |  FROM rr GROUP BY 2)""".stripMargin

  /** CMS counter-table SQL over a keyed subquery named `src0`. */
  private[queries] def cmsSql(src0: String, alias: String): String =
    s"""$alias AS (
       |  SELECT r, ('0x' || substr(md5(r::VARCHAR || ':' ||
       |      user_id::VARCHAR),1,8))::BIGINT % $CmsW AS j,
       |    count(*)::BIGINT AS c
       |  FROM ($src0) s
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${CmsD - 1})) AS r) rs
       |  WHERE user_id IS NOT NULL
       |  GROUP BY 1, 2)""".stripMargin

  override def oracle: Map[String, String] = Map(
    // relational recomputation of the imperative counter table,
    // grouped by event_type
    "q_cms_agg" ->
      s"""SELECT event_type, r::INT AS r,
         |  ('0x' || substr(md5(r::VARCHAR || ':' ||
         |      user_id::VARCHAR),1,8))::BIGINT % $CmsW AS j,
         |  count(*)::BIGINT AS c
         |FROM events
         |CROSS JOIN (SELECT unnest(generate_series(0, ${CmsD - 1})) AS r) rs
         |WHERE user_id IS NOT NULL
         |GROUP BY 1, 2, 3""".stripMargin,
    // the oracle's bottom-k per source is a single window — exactly
    // what the two-phase Spark cut provably equals
    "dd_source_kmv" ->
      s"""WITH tk AS (
         |  SELECT source, string_split(text, ' ') AS tk FROM documents),
         |g AS (
         |  SELECT DISTINCT source,
         |    ('0x' || substr(md5(g),1,15))::BIGINT AS h
         |  FROM (
         |    SELECT source, unnest(list_transform(
         |      generate_series(1, len(tk) - 4),
         |      i -> array_to_string(tk[i:i+4], ' '))) AS g
         |    FROM tk WHERE len(tk) >= 5)),
         |sk AS (
         |  SELECT source, h FROM (
         |    SELECT source, h, row_number() OVER (
         |      PARTITION BY source ORDER BY h ASC) AS r FROM g)
         |  WHERE r <= $SrcK),
         |pr AS (
         |  SELECT a.source AS source_a, b.source AS source_b
         |  FROM (SELECT DISTINCT source FROM sk) a,
         |       (SELECT DISTINCT source FROM sk) b
         |  WHERE a.source < b.source),
         |pooled AS (
         |  SELECT p.source_a, p.source_b, s.h,
         |    count(DISTINCT s.source) AS sides
         |  FROM pr p JOIN sk s
         |    ON s.source = p.source_a OR s.source = p.source_b
         |  GROUP BY 1, 2, 3),
         |uk AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY source_a, source_b ORDER BY h ASC) AS ur
         |    FROM pooled)
         |  WHERE ur <= $SrcK),
         |est AS (
         |  SELECT source_a, source_b,
         |    (sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) * 10000
         |     // count(*))::BIGINT AS est_jacc_bp
         |  FROM uk GROUP BY 1, 2),
         |sizes AS (SELECT source, count(*)::BIGINT AS sz FROM g GROUP BY 1),
         |inter AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |    count(*)::BIGINT AS n_inter
         |  FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
         |  GROUP BY 1, 2),
         |exact AS (
         |  SELECT i.source_a, i.source_b,
         |    (n_inter * 10000 // (sa.sz + sb.sz - n_inter))::BIGINT
         |      AS exact_jacc_bp
         |  FROM inter i
         |  JOIN sizes sa ON sa.source = i.source_a
         |  JOIN sizes sb ON sb.source = i.source_b)
         |SELECT e.source_a, e.source_b,
         |  coalesce(x.exact_jacc_bp, 0)::BIGINT AS exact_jacc_bp,
         |  e.est_jacc_bp
         |FROM est e LEFT JOIN exact x
         |  ON x.source_a = e.source_a AND x.source_b = e.source_b""".stripMargin,
    "w_hll_daily" ->
      s"""WITH src AS (
         |  SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_start_ms,
         |    user_id
         |  FROM events WHERE user_id IS NOT NULL),
         |rr AS (
         |  SELECT day_start_ms,
         |    ((('0x' || substr(md5(user_id::VARCHAR),1,15))::BIGINT % $M))::INT
         |      AS bucket,
         |    max(CASE WHEN ('0x' || substr(md5(user_id::VARCHAR),1,15))::BIGINT
         |               // $M = 0 THEN ${W + 1}
         |             ELSE ${W + 1} - length(bin(
         |               ('0x' || substr(md5(user_id::VARCHAR),1,15))::BIGINT
         |               // $M)) END)::INT AS rho
         |  FROM src GROUP BY 1, 2),
         |dense AS (
         |  SELECT g.day_start_ms, b.bucket, coalesce(r.rho, 0) AS rho
         |  FROM (SELECT DISTINCT day_start_ms FROM rr) g
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${M - 1})) AS bucket) b
         |  LEFT JOIN rr r
         |    ON r.day_start_ms = g.day_start_ms AND r.bucket = b.bucket),
         |est AS (
         |  SELECT day_start_ms, sum(pow(2.0::DOUBLE, -rho)) AS z,
         |    sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v
         |  FROM dense GROUP BY 1),
         |ex AS (
         |  SELECT day_start_ms, count(DISTINCT user_id)::BIGINT AS n_exact
         |  FROM src GROUP BY 1)
         |SELECT e.day_start_ms, x.n_exact,
         |  round(CASE WHEN 2904.064::DOUBLE / z <= 160 AND v > 0
         |    THEN 64 * ln(64.0::DOUBLE / v)
         |    ELSE 2904.064::DOUBLE / z END, 4) AS est_hll
         |FROM est e JOIN ex x USING (day_start_ms)""".stripMargin,
    // two independent sign-sum sketches and the exact join size
    "q_ams_join_card" ->
      s"""WITH ${amsSql(
             "SELECT user_id FROM events WHERE event_type = 'click'", "za")},
         |${amsSql(
             "SELECT user_id FROM events WHERE event_type = 'purchase'",
             "zb")},
         |prod AS (
         |  SELECT r // $AmsGroup AS grp,
         |    (sum(a.z * b.z) // $AmsGroup)::BIGINT AS gm
         |  FROM za_z a JOIN zb_z b USING (r) GROUP BY 1),
         |est AS (
         |  SELECT gm AS est_card FROM (
         |    SELECT gm, row_number() OVER (ORDER BY gm, grp) AS rn
         |    FROM prod)
         |  WHERE rn = ${(AmsD / AmsGroup + 1) / 2}),
         |ex AS (
         |  SELECT sum(a.n * b.n)::BIGINT AS true_card FROM
         |    (SELECT user_id, count(*) AS n FROM events
         |     WHERE event_type = 'click' GROUP BY 1) a
         |  JOIN
         |    (SELECT user_id, count(*) AS n FROM events
         |     WHERE event_type = 'purchase' GROUP BY 1) b
         |  USING (user_id))
         |SELECT true_card, est_card FROM ex CROSS JOIN est""".stripMargin,
    // the d tug-of-war sums and the exact second moment, replayed
    "q_ams_f2" ->
      s"""WITH ${amsSql("SELECT user_id FROM events", "ams")},
         |ex AS (
         |  SELECT sum(n * n)::BIGINT AS f2_exact FROM (
         |    SELECT user_id, count(*) AS n FROM events
         |    WHERE user_id IS NOT NULL GROUP BY 1))
         |SELECT f2_exact, f2_est FROM ex CROSS JOIN ams""".stripMargin,
    // exact recompute of the one-shot Misra–Gries cut: threshold =
    // (K+1)-st largest count, survivors strictly above it
    "q_mg_heavy" ->
      s"""WITH c AS (
         |  SELECT user_id, count(*) AS n_exact FROM events
         |  WHERE user_id IS NOT NULL GROUP BY 1),
         |r AS (
         |  SELECT *, row_number() OVER
         |    (ORDER BY n_exact DESC, user_id ASC) AS rn FROM c),
         |t AS (SELECT coalesce(max(CASE WHEN rn = ${MgK + 1}
         |  THEN n_exact END), 0)::BIGINT AS thresh FROM r)
         |SELECT user_id, n_exact, n_exact - thresh AS mg_lb, thresh
         |FROM c CROSS JOIN t WHERE n_exact > thresh""".stripMargin,
    // the same recompute per group — a hash match proves the
    // imperative summary is EXACT below its capacity
    "q_mg_agg" ->
      s"""WITH c AS (
         |  SELECT event_type, user_id, count(*) AS n_est FROM events
         |  WHERE user_id IS NOT NULL GROUP BY 1, 2),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY n_est DESC, user_id ASC) AS rn FROM c),
         |t AS (SELECT event_type, coalesce(max(CASE WHEN rn = ${MgK + 1}
         |  THEN n_est END), 0)::BIGINT AS thresh FROM r GROUP BY 1)
         |SELECT c.event_type, user_id, n_est, n_est - thresh AS mg_lb,
         |  thresh
         |FROM c JOIN t USING (event_type) WHERE n_est > thresh""".stripMargin,
    // MG candidates + CMS probes, both recomputed from exact counts
    "q_mg_cms_probe" ->
      s"""WITH ${cmsSql("SELECT user_id FROM events", "cms")},
         |c AS (
         |  SELECT user_id, count(*) AS n_exact FROM events
         |  WHERE user_id IS NOT NULL GROUP BY 1),
         |rk AS (
         |  SELECT *, row_number() OVER
         |    (ORDER BY n_exact DESC, user_id ASC) AS rn FROM c),
         |t AS (SELECT coalesce(max(CASE WHEN rn = ${MgK + 1}
         |  THEN n_exact END), 0)::BIGINT AS thresh FROM rk),
         |cand AS (
         |  SELECT user_id, n_exact, n_exact - thresh AS mg_lb
         |  FROM c CROSS JOIN t WHERE n_exact > thresh),
         |probes AS (
         |  SELECT cd.user_id, cd.n_exact, cd.mg_lb, rs.r,
         |    ('0x' || substr(md5(rs.r::VARCHAR || ':' ||
         |        cd.user_id::VARCHAR),1,8))::BIGINT % $CmsW AS j
         |  FROM cand cd
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${CmsD - 1})) AS r) rs)
         |SELECT p.user_id, min(p.n_exact)::BIGINT AS n_exact,
         |  min(p.mg_lb)::BIGINT AS mg_lb, min(cm.c)::BIGINT AS n_cms
         |FROM probes p JOIN cms cm ON cm.r = p.r AND cm.j = p.j
         |GROUP BY 1""".stripMargin,
    // per-day recompute of the one-shot cut
    "w_mg_daily" ->
      s"""WITH c AS (
         |  SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_start_ms,
         |    user_id, count(*) AS n_exact
         |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY day_start_ms
         |    ORDER BY n_exact DESC, user_id ASC) AS rn FROM c),
         |t AS (SELECT day_start_ms, coalesce(max(CASE WHEN rn = ${MgK + 1}
         |  THEN n_exact END), 0)::BIGINT AS thresh FROM r GROUP BY 1)
         |SELECT c.day_start_ms, user_id, n_exact, n_exact - thresh AS mg_lb,
         |  thresh
         |FROM c JOIN t USING (day_start_ms) WHERE n_exact > thresh""".stripMargin,
    // relational recomputation of the custom-aggregate path
    "q_kmv_agg" ->
      s"""WITH h AS (
         |  SELECT DISTINCT event_type,
         |    ('0x' || substr(md5(user_id::VARCHAR),1,15))::BIGINT AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |r AS (
         |  SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h ASC)
         |      AS rn
         |  FROM h),
         |k AS (
         |  SELECT event_type, count(*) AS kmv_cnt, max(h) AS kmv_max
         |  FROM r WHERE rn <= $KmvK GROUP BY 1)
         |SELECT event_type, kmv_cnt, kmv_max,
         |  CASE WHEN kmv_cnt < $KmvK THEN kmv_cnt::DOUBLE
         |       ELSE round(${KmvK - 1}::DOUBLE * ${1L << 60}::DOUBLE
         |         / kmv_max, 4) END AS est_kmv
         |FROM k""".stripMargin,
    "q_hll_agg" ->
      s"""WITH $regSql,
         |dense AS (
         |  SELECT g.event_type, b.bucket, coalesce(r.rho, 0) AS rho
         |  FROM (SELECT DISTINCT event_type FROM rr) g
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${M - 1})) AS bucket) b
         |  LEFT JOIN rr r
         |    ON r.event_type = g.event_type AND r.bucket = b.bucket)
         |SELECT event_type,
         |  round(CASE WHEN 2904.064::DOUBLE / z <= 160 AND v > 0
         |    THEN 64 * ln(64.0::DOUBLE / v)
         |    ELSE 2904.064::DOUBLE / z END, 4) AS est_hll
         |FROM (
         |  SELECT event_type, sum(pow(2.0::DOUBLE, -rho)) AS z,
         |    sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v
         |  FROM dense GROUP BY 1)""".stripMargin,
    "q_kmv_intersect" ->
      s"""WITH tagged AS (
         |  SELECT ('0x' || substr(md5(doc_id::VARCHAR),1,15))::BIGINT AS h,
         |    max(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS in_a,
         |    max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS in_b
         |  FROM documents GROUP BY 1),
         |sa AS (
         |  SELECT count(*)::BIGINT AS cnt, max(h) AS mx FROM (
         |    SELECT h FROM tagged WHERE in_a = 1 ORDER BY h LIMIT $KmvK)),
         |sb AS (
         |  SELECT count(*)::BIGINT AS cnt, max(h) AS mx FROM (
         |    SELECT h FROM tagged WHERE in_b = 1 ORDER BY h LIMIT $KmvK)),
         |su AS (
         |  SELECT count(*)::BIGINT AS cnt, max(h) AS mx,
         |    sum(in_a * in_b)::BIGINT AS both FROM (
         |    SELECT h, in_a, in_b FROM tagged
         |    WHERE in_a = 1 OR in_b = 1 ORDER BY h LIMIT $KmvK)),
         |ex AS (
         |  SELECT sum(in_a)::BIGINT AS n_a, sum(in_b)::BIGINT AS n_b,
         |    sum(in_a * in_b)::BIGINT AS n_inter FROM tagged)
         |SELECT ex.n_a, ex.n_b, ex.n_inter,
         |  CASE WHEN sa.cnt < $KmvK THEN sa.cnt::DOUBLE
         |    ELSE round(${KmvK - 1}::DOUBLE * ${1L << 60}::DOUBLE / sa.mx, 4)
         |    END AS est_a,
         |  CASE WHEN sb.cnt < $KmvK THEN sb.cnt::DOUBLE
         |    ELSE round(${KmvK - 1}::DOUBLE * ${1L << 60}::DOUBLE / sb.mx, 4)
         |    END AS est_b,
         |  CASE WHEN su.cnt < $KmvK THEN su.both::DOUBLE
         |    ELSE round(su.both::DOUBLE *
         |      (${KmvK - 1}::DOUBLE * ${1L << 60}::DOUBLE / su.mx)
         |      / $KmvK, 4) END AS est_inter
         |FROM ex, sa, sb, su""".stripMargin,
    // the union sketch's side-membership census, A-not-B cut
    "q_kmv_diff" ->
      s"""WITH tagged AS (
         |  SELECT ('0x' || substr(md5(doc_id::VARCHAR),1,15))::BIGINT AS h,
         |    max(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS in_a,
         |    max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS in_b
         |  FROM documents GROUP BY 1),
         |su AS (
         |  SELECT count(*)::BIGINT AS cnt, max(h) AS mx,
         |    sum(in_a * (1 - in_b))::BIGINT AS only_a FROM (
         |    SELECT h, in_a, in_b FROM tagged
         |    WHERE in_a = 1 OR in_b = 1 ORDER BY h LIMIT $KmvK)),
         |ex AS (
         |  SELECT sum(in_a)::BIGINT AS n_a,
         |    sum(in_a * (1 - in_b))::BIGINT AS n_diff FROM tagged)
         |SELECT ex.n_a, ex.n_diff,
         |  CASE WHEN su.cnt < $KmvK THEN su.only_a::DOUBLE
         |    ELSE round(su.only_a::DOUBLE *
         |      (${KmvK - 1}::DOUBLE * ${1L << 60}::DOUBLE / su.mx)
         |      / $KmvK, 4) END AS est_diff
         |FROM ex, su""".stripMargin,
    "q_cms_heavy" ->
      s"""WITH ${cmsSql("SELECT user_id FROM events", "cms")},
         |top AS (
         |  SELECT user_id, count(*)::BIGINT AS n_exact
         |  FROM events WHERE user_id IS NOT NULL
         |  GROUP BY 1 ORDER BY n_exact DESC, user_id ASC LIMIT 10),
         |probes AS (
         |  SELECT t.user_id, t.n_exact, rs.r,
         |    ('0x' || substr(md5(rs.r::VARCHAR || ':' ||
         |        t.user_id::VARCHAR),1,8))::BIGINT % $CmsW AS j
         |  FROM top t
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${CmsD - 1})) AS r) rs)
         |SELECT p.user_id, min(p.n_exact)::BIGINT AS n_exact,
         |  min(c.c)::BIGINT AS n_est
         |FROM probes p JOIN cms c ON c.r = p.r AND c.j = p.j
         |GROUP BY 1""".stripMargin,
    "q_cms_join_card" ->
      s"""WITH ${cmsSql(
             "SELECT user_id FROM events WHERE event_type = 'click'", "ca")},
         |${cmsSql(
             "SELECT user_id FROM events WHERE event_type = 'purchase'", "cb")},
         |ip AS (
         |  SELECT a.r, sum(a.c * b.c)::BIGINT AS ip
         |  FROM ca a JOIN cb b ON a.r = b.r AND a.j = b.j
         |  GROUP BY 1),
         |est AS (SELECT min(ip)::BIGINT AS est_card FROM ip),
         |ex AS (
         |  SELECT sum(a.n * b.n)::BIGINT AS true_card FROM
         |    (SELECT user_id, count(*)::BIGINT AS n FROM events
         |     WHERE event_type = 'click' GROUP BY 1) a
         |  JOIN
         |    (SELECT user_id, count(*)::BIGINT AS n FROM events
         |     WHERE event_type = 'purchase' GROUP BY 1) b
         |  USING (user_id))
         |SELECT ex.true_card, est.est_card FROM ex CROSS JOIN est""".stripMargin,
    "q_hll_registers" ->
      s"""WITH $regSql
         |SELECT b.bucket, coalesce(r.rho, 0)::INT AS rho
         |FROM (SELECT unnest(generate_series(0, ${M - 1}))::INT AS bucket) b
         |LEFT JOIN (SELECT bucket, rho FROM allreg
         |           WHERE event_type = '_all') r USING (bucket)""".stripMargin,
    "q_hll_users" ->
      s"""WITH $regSql,
         |dense AS (
         |  SELECT g.event_type, b.bucket, coalesce(r.rho, 0) AS rho
         |  FROM (SELECT DISTINCT event_type FROM allreg) g
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${M - 1})) AS bucket) b
         |  LEFT JOIN allreg r
         |    ON r.event_type = g.event_type AND r.bucket = b.bucket),
         |est AS (
         |  SELECT event_type, sum(pow(2.0::DOUBLE, -rho)) AS z,
         |    sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v
         |  FROM dense GROUP BY 1),
         |ex AS (
         |  SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
         |  FROM src GROUP BY 1
         |  UNION ALL
         |  SELECT '_all', count(DISTINCT user_id)::BIGINT FROM src)
         |SELECT e.event_type, x.n_exact,
         |  round(CASE WHEN 2904.064::DOUBLE / z <= 160 AND v > 0
         |    THEN 64 * ln(64.0::DOUBLE / v)
         |    ELSE 2904.064::DOUBLE / z END, 4) AS est_hll
         |FROM est e JOIN ex x USING (event_type)""".stripMargin
  )
}
