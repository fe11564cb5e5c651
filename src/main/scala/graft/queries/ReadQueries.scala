package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's point-read surface (SURVEY §2.6 R1–R8) and the
  * IVF-style ANN search path, over the testdata tables.
  */
object ReadQueries extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R1: triggers by (object_id, object_type) — point read on the
    // trigger table.
    "r1_triggers_by_object" -> ((s, d) => {
      import s.implicits._
      val triggers = Seq(
        ("t1", "purchase", "iface", "GREATER_THAN", "amqp://high-purchase"),
        ("t2", "error", "iface", "ANY", "amqp://errors"),
        ("t3", "purchase", "device", "ANY", "amqp://dev"),
        ("t4", "signup", "iface", "CONTAINS", "amqp://signup"))
        .toDF("trigger_id", "object_id", "object_type", "op", "target")
      triggers.filter(col("object_id") === "purchase" && col("object_type") === "iface")
        .select(col("trigger_id"), col("op"), col("target"))
    }),

    // R2: all paths under a PK prefix (device, interface) — the
    // prune-read; here: all paths a user has touched for one type.
    "r2_paths_for_endpoint" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          concat(lit("/purchase/"), pmod(col("event_id"), lit(50))).as("path"))
        .distinct()
    }),

    // R3: device stats + introspection point row.
    "r3_device_stats" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("user_id") === 7)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("total_received_msgs"),
          sum(length(col("props"))).as("total_received_bytes"),
          countDistinct(col("event_type")).as("n_interfaces"))
    }),

    // R4: introspection minors map for one device.
    "r4_introspection_minors" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("user_id") === 7)
        .groupBy(col("event_type"))
        .agg(max(col("event_id")).as("minor"))
        .select(col("event_type"), col("minor"))
    }),

    // R5: typed-column projection of current values (registry chooses
    // the column by value type; here the double column).
    "r5_typed_projection" -> ((s, d) => {
      // latest-row pick as max_by over the unique (ts, event_id)
      // order instead of a rank-1 window (r17 opt round, guide §2.3):
      // identical row, no per-user sort, partial agg collapses
      // map-side before the shuffle
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max_by(col("value"), struct(col("ts"), col("event_id")))
          .as("v"))
        .select(col("user_id"), round(col("v"), 4).as("double_value"))
    }),

    // R8: endpoint attribute via LIMIT-1-per-group (the reference
    // reads explicit_timestamp from any one endpoint row).
    "r8_first_per_endpoint" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("first_event_id"),
          min(expr("ts div 1000")).as("first_ts_us"))
    }),

    // IVF-style ANN: centroids = per-label mean vectors (the "train"
    // step), probe = top-2 centroids per query, exact search only
    // inside probed partitions. At 100 TB this is the layout: cluster
    // once, route queries to nprobe partitions, never scan the rest.
    "sim_ivf" -> ((s, d) => ivfTopK(s, d, maxQid = 10, k = 3, nprobe = 2)),

    // Product quantization — the third ANN scale path next to LSH
    // bucketing and IVF probing. Each 64-dim vector compresses to
    // M=4 one-byte codes (argmin centroid per 16-dim subvector,
    // deterministic codebook = the subvectors of vec_id < 16), and a
    // query ranks candidates by ADC: sum over subspaces of its OWN
    // precomputed distance to the candidate's centroid. At 100 TB the
    // shapes are: codebook broadcast (tiny), assignment = one
    // broadcast join + map-side min_by partial agg (linear in N), ADC
    // = codes × broadcast query-distance table (N × M × n_queries,
    // linear in N) — the database never ships raw vectors anywhere
    // after encoding, which is PQ's entire point. All distances are
    // exact integer arithmetic on the 1e-6 quantization, so the
    // DuckDB oracle hash-matches bit for bit.
    "sim_pq" -> ((s, d) => pqTopK(s, d, maxQid = 10, k = 3)),

    // IVFADC: coarse IVF probe routes each query to nprobe label
    // partitions, then PQ asymmetric distance ranks candidates INSIDE
    // the probed partitions only — the standard composition for
    // billion-scale ANN (inverted lists + code bytes; raw vectors
    // never touched at query time). See ivfAdcTopK.
    "sim_ivfadc" -> ((s, d) => ivfAdcTopK(s, d, maxQid = 10, k = 3, nprobe = 2)),

    // Lloyd's k-means over the embeddings — the unsupervised "train"
    // step the IVF/PQ paths above take as given (their codebooks and
    // coarse centroids come from per-label means; a real pipeline
    // learns them with exactly this loop). k=4, 2 iterations, all
    // deterministic: init = the first k vectors, assignment = exact
    // integer L2 argmin (ties to the smallest cluster id), update =
    // truncating integer-division mean per element (the same exact
    // re-quantization labelCentroids uses). Per iteration: one
    // broadcast of k centroids, one map-side struct-min partial agg
    // (the n×k fan-out collapses before the shuffle), one (cid, idx)
    // partial-agg groupBy — cost linear in N per round, no window
    // over data-sized partitions, nothing driver-side. An empty
    // cluster drops out identically on both engines (no guard
    // needed — consistency, not liveness, is the contract here).
    "sim_kmeans" -> ((s, d) => kmeansClusters(s, d, k = 4, iters = 2)),

    // Distributed power iteration — the top principal direction of
    // the embedding matrix (the heart of PCA / spectral methods) as
    // two DataFrame aggregations per round: s = X·v (one groupBy per
    // vector, v broadcast — 64 rows), u = Xᵀs (one groupBy per
    // dimension), then an integer re-normalization to |v|∞ = 1e6.
    // Fully deterministic: every step is exact integer arithmetic
    // with explicit truncating rescales (div 2²⁰ after each matrix
    // product keeps all partial sums ≤ 3·10¹⁷, well inside long; the
    // DuckDB oracle reproduces the same truncation bit for bit), so
    // convergence is byte-identical across engines and iteration
    // counts are the only knob. At 100 TB each round is two
    // partial-agg shuffles over (vec, dim) triples — no driver-side
    // matrix, nothing quadratic in N or dims.
    "sim_power_iter" -> ((s, d) => powerIteration(s, d, iters = 2)),

    // The projection that makes the learned direction useful:
    // score = x·v (div 2²⁰ rescale) per embedding — the 1-D PCA
    // coordinate used for visualization binning, coarse sorting, or
    // as a cheap split key. One broadcast of the 64-row direction +
    // one partial-agg groupBy; emitted as a per-label histogram
    // (label, sign, count, mean coordinate) so the output is compact
    // at any corpus size.
    "sim_pca_project" -> ((s, d) => {
      val f = AnalyticsQueries.quantEmb(s, d)
        .select(col("vec_id"), col("label"),
          posexplode(col("q")).as(Seq("idx", "qv")))
      val v = powerIteration(s, d, iters = 2)
      val proj = f.join(broadcast(v), Seq("idx"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("qv") * col("vv")).as("praw"))
        .withColumn("p", expr("praw div 1048576"))
      proj.groupBy(col("label"),
          when(col("p") >= 0, lit(1)).otherwise(lit(-1)).as("sign"))
        .agg(count(lit(1)).as("n"),
          expr("sum(p) div count(1)").as("mean_p"))
    }),

    // ANN recall audit: recall@3 of the two serving paths (LSH
    // bucket+rerank, IVF probe) against the brute-force exact top-3 —
    // the query that makes `sim_topk_bf` load-bearing (it IS the
    // ground truth) and keeps the serving paths honest as data
    // changes. Integer hits and basis-point recall: no float compare.
    "sim_recall" -> ((s, d) => {
      import s.implicits._
      // NOTE (r18, measured and REJECTED): materializing the five
      // legs concurrently from driver threads (guide §2.6, each into
      // a |Q|·k-row eager checkpoint) read 0.98→1.30 s in an
      // idle-gated pair with clean controls. The single-action union
      // is faster because ReuseExchange shares the legs' common
      // subtrees (quantEmb scan, codebooks, centroid builds) — five
      // independent actions recompute that shared work per leg, which
      // costs more than the stage overlap saves. The composed form
      // stays.
      val truth = AnalyticsQueries.bfTopK(s, d, maxQid = 10, k = 3)
        .select(col("qid"), col("nid"))
      val ann = AnalyticsQueries.lshTopK(s, d, maxQid = 10, k = 3)
        .select(lit("lsh").as("method"), col("qid"), col("nid"))
        .unionByName(ivfTopK(s, d, maxQid = 10, k = 3, nprobe = 2)
          .select(lit("ivf").as("method"), col("qid"), col("nid")))
        .unionByName(pqTopK(s, d, maxQid = 10, k = 3)
          .select(lit("pq").as("method"), col("qid"), col("nid")))
        .unionByName(ivfAdcTopK(s, d, maxQid = 10, k = 3, nprobe = 2)
          .select(lit("ivfadc").as("method"), col("qid"), col("nid")))
      val hits = ann.join(truth, Seq("qid", "nid"))
        .groupBy(col("method"), col("qid"))
        .agg(count(lit(1)).as("hits"))
      // every (method, probe) row survives even at 0 hits — a sparse
      // bucket must read as recall 0, not as a missing row
      val base = truth.select(col("qid")).distinct()
        .crossJoin(Seq("lsh", "ivf", "pq", "ivfadc").toDF("method"))
      base.join(hits, Seq("method", "qid"), "left")
        .select(col("method"), col("qid"),
          coalesce(col("hits"), lit(0L)).as("hits"))
        .withColumn("recall_bp", expr("hits * 10000 div 3"))
    })
  )

  /** Product-quantization ANN top-k (see the `sim_pq` entry). M=4
    * subvectors of 16 dims; 16-entry deterministic codebook per
    * subspace (the subvectors of vec_id < 16); candidates ranked by
    * exact-integer ADC. Codebook + query-distance tables broadcast;
    * encoding is one broadcast join + a map-side struct-min partial
    * agg; raw vectors never move after encode.
    */
  /** The shared PQ machinery: `codes` = every vector's M one-byte
    * codes (nid, m, code); `qdist` = each query's precomputed distance
    * to every centroid of every subspace (qid, qm, qc, qd2) —
    * broadcastable forever. Encode is one broadcast join + a map-side
    * struct-min partial agg; raw vectors never move after encode.
    */
  private def pqPieces(s: SparkSession, d: String,
      maxQid: Int): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val M = 4; val SUB = 16
    val sub = AnalyticsQueries.quantEmb(s, d)
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${M - 1}), m -> slice(q, m * $SUB + 1, $SUB))"))
        .as(Seq("m", "sq")))
    val cb = sub.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("c"), col("m").as("cm"),
        col("sq").as("cv"))
    val dist2 = expr(
      "vector_dot_long(sq, sq) - 2 * vector_dot_long(sq, cv) + vector_dot_long(cv, cv)")
    // encode: nearest centroid (ties to the smallest id) per (vec,
    // subspace) — struct min gives lexicographic (d2, c) argmin with
    // map-side partial aggregation, no window shuffle
    val codes = sub.join(broadcast(cb), col("m") === col("cm"))
      .select(col("vec_id"), col("m"), col("c"), dist2.as("d2"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d2"), col("c"))).as("best"))
      .select(col("vec_id").as("nid"), col("m"), col("best.c").as("code"))
    // the query side precomputes its distance to every centroid of
    // every subspace: n_queries × M × 16 rows, broadcastable forever
    val qdist = sub.filter(col("vec_id") < maxQid)
      .join(broadcast(cb), col("m") === col("cm"))
      .select(col("vec_id").as("qid"), col("m").as("qm"),
        col("c").as("qc"), dist2.as("qd2"))
    (codes, qdist)
  }

  private[queries] def pqTopK(s: SparkSession, d: String,
      maxQid: Int, k: Int): DataFrame = {
    val (codes, qdist) = pqPieces(s, d, maxQid)
    val adc = codes.join(broadcast(qdist),
        col("m") === col("qm") && col("code") === col("qc"))
      .filter(col("nid") =!= col("qid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qd2")).as("adc"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("nid").asc)
    adc.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("adc"), col("rnk"))
  }

  /** IVFADC — the composition serving billion-scale ANN in practice:
    * IVF's coarse quantizer routes each query to `nprobe` label
    * partitions, and WITHIN the probed partitions candidates are
    * ranked by PQ asymmetric distance (codes × the query's broadcast
    * distance table), never by raw vectors. Cost per query:
    * n_centroids probe dots + (N/n_partitions)·nprobe·M table
    * lookups — both independent of dimension after encode, and the
    * scan side touches only code bytes. The probe set (maxQid ×
    * nprobe rows) and the distance tables broadcast; the only
    * shuffled state is the final per-query top-k.
    */
  private[queries] def ivfAdcTopK(s: SparkSession, d: String,
      maxQid: Int, k: Int, nprobe: Int): DataFrame = {
    val cent = AnalyticsQueries.labelCentroids(s, d)
      .withColumnRenamed("clabel", "label")
    val e = AnalyticsQueries.quantEmb(s, d)
    val q = e.filter(col("vec_id") < maxQid)
      .select(col("vec_id").as("qid"), col("q").as("qe"), col("qnorm"))
    // coarse probe: same construction as ivfTopK (shared centroids)
    val probe = q.crossJoin(broadcast(cent))
      .withColumn("pcos",
        round(expr("vector_dot_long(qe, carr)").cast("double") /
          (col("qnorm") * col("cnorm")), 4))
    val wp = Window.partitionBy(col("qid")).orderBy(col("pcos").desc, col("label").asc)
    val probed = probe.withColumn("prank", row_number().over(wp))
      .filter(col("prank") <= nprobe)
      .select(col("qid").as("pqid"), col("label"))
    // fine ranking: ADC restricted to vectors in probed partitions
    val (codes, qdist) = pqPieces(s, d, maxQid)
    val lab = e.select(col("vec_id").as("nid"), col("label").as("nlabel"))
    val adc = codes
      .join(lab, Seq("nid"))
      .join(broadcast(probed), col("nlabel") === col("label"))
      .join(broadcast(qdist), col("pqid") === col("qid") &&
        col("m") === col("qm") && col("code") === col("qc"))
      .filter(col("nid") =!= col("qid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qd2")).as("adc"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("nid").asc)
    adc.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("adc"), col("rnk"))
  }

  /** Power iteration (see `sim_power_iter`): (idx, vv) rows of the
    * final direction vector, |vv|∞ = 1e6. 0-based idx.
    */
  private[queries] def powerIteration(s: SparkSession, d: String,
      iters: Int): DataFrame = {
    // the flattened (vec, dim, value) matrix is re-derived by each
    // consumer (twice per iteration); measured, that re-scan of the
    // small parquet is CHEAPER than eagerly materializing the 64×
    // exploded rows — don't checkpoint here
    val f = AnalyticsQueries.quantEmb(s, d)
      .select(col("vec_id"), posexplode(col("q")).as(Seq("idx", "qv")))
    var v = f.select(col("idx")).distinct().withColumn("vv", lit(1L))
    for (_ <- 1 to iters) {
      val sdot = f.join(broadcast(v), Seq("idx"))
        .groupBy(col("vec_id"))
        .agg(sum(col("qv") * col("vv")).as("sraw"))
        .withColumn("s1", expr("sraw div 1048576"))
      // u is dims-sized (64 rows) but its subtree holds BOTH matrix
      // products of the round; without the checkpoint the two readers
      // below (m and v) re-run it, and because round r's v embeds
      // round r−1's whole tree, the recompute count of the data-sized
      // passes grows geometrically with the iteration count (r17 opt
      // round, guide §1.2). One 64-row materialization per round caps
      // each round at one pass over f.
      val u = f.join(sdot, Seq("vec_id"))
        .groupBy(col("idx"))
        .agg(sum(col("s1") * col("qv")).as("u"))
        .withColumn("u2", expr("u div 1048576"))
        .localCheckpoint(true)
      val m = u.agg(max(abs(col("u2"))).as("m"))
      v = u.crossJoin(broadcast(m))
        .select(col("idx"), expr("u2 * 1000000 div m").as("vv"))
    }
    v
  }

  /** Lloyd's k-means (see `sim_kmeans`): returns one row per
    * surviving cluster — (cid, n_members, min_vec, cc) where cc is
    * the exact integer self-dot of the final centroid (the
    * engine-comparable fingerprint of its position).
    */
  private[queries] def kmeansClusters(s: SparkSession, d: String,
      k: Int, iters: Int): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = AnalyticsQueries.quantEmb(s, d).select(col("vec_id"), col("q"))
    // assignment: exact integer L2 argmin over the broadcast
    // centroids; qq is constant per vector so d2 ranks by
    // -2·q·c + c·c alone — dropping qq keeps every term well inside
    // long range and the argmin identical
    def assign(cent: DataFrame): DataFrame =
      e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("q"), col("cid"),
          expr("vector_dot_long(carr, carr) - 2 * vector_dot_long(q, carr)")
            .as("d2"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("cid"))).as("best"),
          first(col("q")).as("q"))
        .select(col("vec_id"), col("q"), col("best.cid").as("cid"))
    def update(assigned: DataFrame): DataFrame =
      assigned
        .select(col("cid"), posexplode(col("q")).as(Seq("idx", "qv")))
        .groupBy(col("cid"), col("idx"))
        .agg(sum(col("qv")).as("sq"), count(lit(1)).as("nq"))
        .withColumn("cq", expr("cast(sq div nq as int)"))
        .groupBy(col("cid"))
        .agg(transform(sort_array(collect_list(struct(col("idx"), col("cq")))),
          x => x.getField("cq")).as("carr"))
    var cent = e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("q").as("carr"))
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assign(cent)
      cent = update(assigned)
    }
    assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), min(col("vec_id")).as("min_vec"))
      .join(cent.select(col("cid"),
        expr("vector_dot_long(carr, carr)").as("cc")), Seq("cid"))
  }

  /** IVF-style ANN top-k: quantized per-label centroids (the "train"
    * step, shared with sim_centroid_outlier/dd_semantic_dedup via
    * AnalyticsQueries.labelCentroids), probe = top-`nprobe` centroids
    * per query, exact integer-dot search only inside probed
    * partitions. At 100 TB this is the layout: cluster once, route
    * queries to nprobe partitions, never scan the rest.
    */
  private[queries] def ivfTopK(s: SparkSession, d: String,
      maxQid: Int, k: Int, nprobe: Int): DataFrame = {
    val cent = AnalyticsQueries.labelCentroids(s, d)
      .withColumnRenamed("clabel", "label")
    val e = AnalyticsQueries.quantEmb(s, d)
    val q = e.filter(col("vec_id") < maxQid)
      .select(col("vec_id").as("qid"), col("q").as("qe"),
        col("qnorm"))
    // probe: rank centroids per query
    val probe = q.crossJoin(broadcast(cent))
      .withColumn("pcos",
        round(expr("vector_dot_long(qe, carr)").cast("double") /
          (col("qnorm") * col("cnorm")), 4))
    val wp = Window.partitionBy(col("qid")).orderBy(col("pcos").desc, col("label").asc)
    val probed = probe.withColumn("prank", row_number().over(wp))
      .filter(col("prank") <= nprobe)
      .select(col("qid"), col("qe"), col("qnorm"), col("label"))
    // exact search within probed labels only; scoring/ranking tail
    // shared with bfTopK/lshTopK so the recall oracle can't diverge
    val n = e.select(col("vec_id").as("nid"), col("label").as("nlabel"),
      col("q").as("ne"), col("qnorm").as("nnorm"))
    AnalyticsQueries.rankTopK(
      probed.join(n, col("label") === col("nlabel"))
        .filter(col("qid") =!= col("nid")), k)
  }

  override def oracle: Map[String, String] = Map(
    "sim_power_iter" ->
      """WITH f AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |v0 AS (SELECT DISTINCT idx, 1::BIGINT AS vv FROM f),
        |s1 AS (
        |  SELECT vec_id, (sraw - sraw % 1048576) // 1048576 AS s1 FROM (
        |    SELECT f.vec_id, sum(f.qv * v0.vv)::BIGINT AS sraw
        |    FROM f JOIN v0 USING (idx) GROUP BY 1)),
        |u1 AS (
        |  SELECT idx, (u - u % 1048576) // 1048576 AS u2 FROM (
        |    SELECT f.idx, sum(s1.s1 * f.qv)::BIGINT AS u
        |    FROM f JOIN s1 USING (vec_id) GROUP BY 1)),
        |m1 AS (SELECT max(abs(u2))::BIGINT AS m FROM u1),
        |v1 AS (
        |  SELECT idx,
        |    (u2 * 1000000 - (u2 * 1000000) % m) // m AS vv
        |  FROM u1, m1),
        |s2 AS (
        |  SELECT vec_id, (sraw - sraw % 1048576) // 1048576 AS s1 FROM (
        |    SELECT f.vec_id, sum(f.qv * v1.vv)::BIGINT AS sraw
        |    FROM f JOIN v1 USING (idx) GROUP BY 1)),
        |u2t AS (
        |  SELECT idx, (u - u % 1048576) // 1048576 AS u2 FROM (
        |    SELECT f.idx, sum(s2.s1 * f.qv)::BIGINT AS u
        |    FROM f JOIN s2 USING (vec_id) GROUP BY 1)),
        |m2 AS (SELECT max(abs(u2))::BIGINT AS m FROM u2t)
        |SELECT (idx - 1)::INT AS idx,
        |  (u2 * 1000000 - (u2 * 1000000) % m) // m AS vv
        |FROM u2t, m2""".stripMargin,
    "sim_pca_project" ->
      """WITH f AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |v0 AS (SELECT DISTINCT idx, 1::BIGINT AS vv FROM f),
        |s1 AS (
        |  SELECT vec_id, (sraw - sraw % 1048576) // 1048576 AS s1 FROM (
        |    SELECT f.vec_id, sum(f.qv * v0.vv)::BIGINT AS sraw
        |    FROM f JOIN v0 USING (idx) GROUP BY 1)),
        |u1 AS (
        |  SELECT idx, (u - u % 1048576) // 1048576 AS u2 FROM (
        |    SELECT f.idx, sum(s1.s1 * f.qv)::BIGINT AS u
        |    FROM f JOIN s1 USING (vec_id) GROUP BY 1)),
        |m1 AS (SELECT max(abs(u2))::BIGINT AS m FROM u1),
        |v1 AS (
        |  SELECT idx,
        |    (u2 * 1000000 - (u2 * 1000000) % m) // m AS vv
        |  FROM u1, m1),
        |s2 AS (
        |  SELECT vec_id, (sraw - sraw % 1048576) // 1048576 AS s1 FROM (
        |    SELECT f.vec_id, sum(f.qv * v1.vv)::BIGINT AS sraw
        |    FROM f JOIN v1 USING (idx) GROUP BY 1)),
        |u2t AS (
        |  SELECT idx, (u - u % 1048576) // 1048576 AS u2 FROM (
        |    SELECT f.idx, sum(s2.s1 * f.qv)::BIGINT AS u
        |    FROM f JOIN s2 USING (vec_id) GROUP BY 1)),
        |m2 AS (SELECT max(abs(u2))::BIGINT AS m FROM u2t),
        |v2 AS (
        |  SELECT idx,
        |    (u2 * 1000000 - (u2 * 1000000) % m) // m AS vv
        |  FROM u2t, m2),
        |proj AS (
        |  SELECT vec_id, label, (praw - praw % 1048576) // 1048576 AS p
        |  FROM (
        |    SELECT f.vec_id, f.label, sum(f.qv * v2.vv)::BIGINT AS praw
        |    FROM f JOIN v2 USING (idx) GROUP BY 1, 2))
        |SELECT label, CASE WHEN p >= 0 THEN 1 ELSE -1 END AS sign,
        |  count(*) AS n,
        |  (sum(p)::BIGINT - sum(p)::BIGINT % count(*)) // count(*) AS mean_p
        |FROM proj GROUP BY 1, 2""".stripMargin,
    "sim_kmeans" ->
      """WITH f AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |c0 AS (
        |  SELECT vec_id::INT AS cid, idx, qv AS cq FROM f WHERE vec_id < 4),
        |a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT q.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY sum(c.cq * c.cq - 2 * q.qv * c.cq) ASC, c.cid ASC)
        |        AS rn
        |    FROM f q JOIN c0 c ON q.idx = c.idx
        |    GROUP BY q.vec_id, c.cid) WHERE rn = 1),
        |c1 AS (
        |  SELECT cid, idx, (sq - sq % nq) // nq AS cq FROM (
        |    SELECT a.cid, q.idx, sum(q.qv) AS sq, count(*) AS nq
        |    FROM f q JOIN a1 a ON q.vec_id = a.vec_id GROUP BY 1, 2)),
        |a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT q.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY sum(c.cq * c.cq - 2 * q.qv * c.cq) ASC, c.cid ASC)
        |        AS rn
        |    FROM f q JOIN c1 c ON q.idx = c.idx
        |    GROUP BY q.vec_id, c.cid) WHERE rn = 1),
        |c2 AS (
        |  SELECT cid, idx, (sq - sq % nq) // nq AS cq FROM (
        |    SELECT a.cid, q.idx, sum(q.qv) AS sq, count(*) AS nq
        |    FROM f q JOIN a2 a ON q.vec_id = a.vec_id GROUP BY 1, 2))
        |SELECT a.cid, count(*) AS n_members, min(a.vec_id) AS min_vec, c.cc
        |FROM a2 a
        |JOIN (SELECT cid, sum(cq * cq)::BIGINT AS cc FROM c2 GROUP BY 1) c
        |  ON a.cid = c.cid
        |GROUP BY a.cid, c.cc""".stripMargin,
    "r1_triggers_by_object" ->
      """WITH triggers(trigger_id, object_id, object_type, op, target) AS (VALUES
        |  ('t1','purchase','iface','GREATER_THAN','amqp://high-purchase'),
        |  ('t2','error','iface','ANY','amqp://errors'),
        |  ('t3','purchase','device','ANY','amqp://dev'),
        |  ('t4','signup','iface','CONTAINS','amqp://signup'))
        |SELECT trigger_id, op, target FROM triggers
        |WHERE object_id = 'purchase' AND object_type = 'iface'""".stripMargin,
    "r2_paths_for_endpoint" ->
      """SELECT DISTINCT user_id,
        |  '/purchase/' || (event_id % 50) AS path
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "r3_device_stats" ->
      """SELECT user_id, count(*) AS total_received_msgs,
        |  sum(length(props))::BIGINT AS total_received_bytes,
        |  count(DISTINCT event_type) AS n_interfaces
        |FROM events WHERE user_id = 7 GROUP BY user_id""".stripMargin,
    "r4_introspection_minors" ->
      """SELECT event_type, max(event_id) AS minor
        |FROM events WHERE user_id = 7 GROUP BY event_type""".stripMargin,
    "r5_typed_projection" ->
      """SELECT user_id, round(value, 4) AS double_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events WHERE event_type = 'purchase')
        |WHERE rn = 1""".stripMargin,
    "r8_first_per_endpoint" ->
      """SELECT event_type, event_id AS first_event_id, first_ts_us FROM (
        |  SELECT event_type, event_id,
        |    min(epoch_us(ts)) OVER (PARTITION BY event_type) AS first_ts_us,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "sim_ivf" ->
      """WITH f AS (
        |  SELECT vec_id, label, generate_subscripts(embedding,1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, idx, sum(qv) AS sq, count(*) AS nq
        |  FROM f GROUP BY 1, 2),
        |centq AS (
        |  SELECT label, idx, (sq - sq % nq) // nq AS cq FROM cent),
        |cnorms AS (
        |  SELECT label, sqrt(sum(cq*cq)::DOUBLE) AS cnorm
        |  FROM centq GROUP BY 1),
        |norms AS (
        |  SELECT vec_id, sqrt(sum(qv*qv)::DOUBLE) AS norm FROM f GROUP BY 1),
        |probe AS (
        |  SELECT q.vec_id AS qid, c.label,
        |    round(sum(q.qv * c.cq)::DOUBLE / (n.norm * cn.cnorm), 4) AS pcos
        |  FROM f q JOIN centq c ON q.idx = c.idx
        |  JOIN norms n ON n.vec_id = q.vec_id
        |  JOIN cnorms cn ON cn.label = c.label
        |  WHERE q.vec_id < 10
        |  GROUP BY q.vec_id, c.label, n.norm, cn.cnorm),
        |probed AS (
        |  SELECT qid, label FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY qid ORDER BY pcos DESC, label ASC) AS prank
        |    FROM probe) WHERE prank <= 2),
        |dots AS (
        |  SELECT p.qid, n.vec_id AS nid, sum(q.qv * n.qv)::DOUBLE AS dot
        |  FROM probed p
        |  JOIN f n ON n.label = p.label
        |  JOIN f q ON q.vec_id = p.qid AND q.idx = n.idx
        |  WHERE n.vec_id <> p.qid
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT qid, nid,
        |    round(dot / (nq.norm * nn.norm), 4) AS cosine
        |  FROM dots JOIN norms nq ON nq.vec_id = qid
        |  JOIN norms nn ON nn.vec_id = nid)
        |SELECT qid, nid, cosine, rank FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
        |  FROM scored) WHERE rank <= 3""".stripMargin,
    "sim_pq" ->
      """WITH f AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) - 1 AS idx0,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |sub AS (
        |  SELECT vec_id, idx0 // 16 AS m, idx0 % 16 AS pos, qv FROM f),
        |cb AS (
        |  SELECT vec_id AS c, m, pos, qv AS cv FROM sub WHERE vec_id < 16),
        |dist AS (
        |  SELECT s.vec_id, s.m, cb.c,
        |    sum((s.qv - cb.cv) * (s.qv - cb.cv))::BIGINT AS d2
        |  FROM sub s JOIN cb ON s.m = cb.m AND s.pos = cb.pos
        |  GROUP BY 1, 2, 3),
        |code AS (
        |  SELECT vec_id, m, c AS code FROM (
        |    SELECT vec_id, m, c,
        |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
        |    FROM dist) WHERE rn = 1),
        |qdist AS (
        |  SELECT vec_id AS qid, m, c, d2 FROM dist WHERE vec_id < 10),
        |adc AS (
        |  SELECT q.qid, co.vec_id AS nid, sum(q.d2)::BIGINT AS adc
        |  FROM code co JOIN qdist q ON q.m = co.m AND q.c = co.code
        |  WHERE co.vec_id <> q.qid
        |  GROUP BY 1, 2)
        |SELECT qid, nid, adc, rnk FROM (
        |  SELECT qid, nid, adc,
        |    row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rnk
        |  FROM adc) WHERE rnk <= 3""".stripMargin,
    "sim_ivfadc" ->
      """WITH f AS (
        |  SELECT vec_id, label, generate_subscripts(embedding,1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, idx, sum(qv) AS sq, count(*) AS nq
        |  FROM f GROUP BY 1, 2),
        |centq AS (
        |  SELECT label, idx, (sq - sq % nq) // nq AS cq FROM cent),
        |cnorms AS (
        |  SELECT label, sqrt(sum(cq*cq)::DOUBLE) AS cnorm
        |  FROM centq GROUP BY 1),
        |norms AS (
        |  SELECT vec_id, sqrt(sum(qv*qv)::DOUBLE) AS norm FROM f GROUP BY 1),
        |probe AS (
        |  SELECT q.vec_id AS qid, c.label,
        |    round(sum(q.qv * c.cq)::DOUBLE / (n.norm * cn.cnorm), 4) AS pcos
        |  FROM f q JOIN centq c ON q.idx = c.idx
        |  JOIN norms n ON n.vec_id = q.vec_id
        |  JOIN cnorms cn ON cn.label = c.label
        |  WHERE q.vec_id < 10
        |  GROUP BY q.vec_id, c.label, n.norm, cn.cnorm),
        |probed AS (
        |  SELECT qid, label FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY qid ORDER BY pcos DESC, label ASC) AS prank
        |    FROM probe) WHERE prank <= 2),
        |sub AS (
        |  SELECT vec_id, (idx - 1) // 16 AS m, (idx - 1) % 16 AS pos, qv
        |  FROM f),
        |cb AS (
        |  SELECT vec_id AS c, m, pos, qv AS cv FROM sub WHERE vec_id < 16),
        |dist AS (
        |  SELECT s.vec_id, s.m, cb.c,
        |    sum((s.qv - cb.cv) * (s.qv - cb.cv))::BIGINT AS d2
        |  FROM sub s JOIN cb ON s.m = cb.m AND s.pos = cb.pos
        |  GROUP BY 1, 2, 3),
        |code AS (
        |  SELECT vec_id, m, c AS code FROM (
        |    SELECT vec_id, m, c,
        |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
        |    FROM dist) WHERE rn = 1),
        |qdist AS (
        |  SELECT vec_id AS qid, m, c, d2 FROM dist WHERE vec_id < 10),
        |lab AS (SELECT DISTINCT vec_id, label FROM f),
        |adc AS (
        |  SELECT q.qid, co.vec_id AS nid, sum(q.d2)::BIGINT AS adc
        |  FROM code co
        |  JOIN lab n ON n.vec_id = co.vec_id
        |  JOIN probed p ON p.label = n.label
        |  JOIN qdist q ON q.qid = p.qid AND q.m = co.m AND q.c = co.code
        |  WHERE co.vec_id <> q.qid
        |  GROUP BY 1, 2)
        |SELECT qid, nid, adc, rnk FROM (
        |  SELECT qid, nid, adc,
        |    row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rnk
        |  FROM adc) WHERE rnk <= 3""".stripMargin,
    "sim_recall" ->
      """WITH f AS (
        |  SELECT vec_id, label, generate_subscripts(embedding,1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |norms AS (
        |  SELECT vec_id, sqrt(sum(qv*qv)::DOUBLE) AS norm FROM f GROUP BY 1),
        |bfdots AS (
        |  SELECT q.vec_id AS qid, n.vec_id AS nid,
        |    sum(q.qv * n.qv)::DOUBLE AS dot
        |  FROM f q JOIN f n ON q.idx = n.idx AND q.vec_id <> n.vec_id
        |  WHERE q.vec_id < 10
        |  GROUP BY 1, 2),
        |truth AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY round(dot / (nq.norm * nn.norm), 4) DESC, nid ASC) AS rank
        |    FROM bfdots JOIN norms nq ON nq.vec_id = qid
        |    JOIN norms nn ON nn.vec_id = nid) WHERE rank <= 3),
        |planes AS (
        |  SELECT p.plane, d.dim,
        |    ('0x' || substr(md5(p.plane || ',' || d.dim),1,4))::INT % 16 - 8 AS w
        |  FROM (SELECT unnest(generate_series(0,7)) AS plane) p,
        |       (SELECT unnest(generate_series(0,63)) AS dim) d),
        |pdots AS (
        |  SELECT vec_id, plane, sum(qv * w) AS dot
        |  FROM f JOIN planes ON f.idx = dim + 1
        |  GROUP BY 1, 2),
        |buckets AS (
        |  SELECT vec_id,
        |    sum(CASE WHEN dot > 0 THEN 1 << plane::INT ELSE 0 END)::BIGINT AS bucket
        |  FROM pdots GROUP BY vec_id),
        |lshcand AS (
        |  SELECT q.vec_id AS qid, n.vec_id AS nid,
        |    sum(q.qv * n.qv)::DOUBLE AS dot
        |  FROM f q JOIN f n ON q.idx = n.idx AND q.vec_id <> n.vec_id
        |  JOIN buckets bq ON bq.vec_id = q.vec_id
        |  JOIN buckets bn ON bn.vec_id = n.vec_id AND bq.bucket = bn.bucket
        |  WHERE q.vec_id < 10
        |  GROUP BY 1, 2),
        |lshtop AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY round(dot / (nq.norm * nn.norm), 4) DESC, nid ASC) AS rank
        |    FROM lshcand JOIN norms nq ON nq.vec_id = qid
        |    JOIN norms nn ON nn.vec_id = nid) WHERE rank <= 3),
        |cent AS (
        |  SELECT label, idx, sum(qv) AS sq, count(*) AS nq
        |  FROM f GROUP BY 1, 2),
        |centq AS (
        |  SELECT label, idx, (sq - sq % nq) // nq AS cq FROM cent),
        |cnorms AS (
        |  SELECT label, sqrt(sum(cq*cq)::DOUBLE) AS cnorm
        |  FROM centq GROUP BY 1),
        |probe AS (
        |  SELECT q.vec_id AS qid, c.label,
        |    round(sum(q.qv * c.cq)::DOUBLE / (n.norm * cn.cnorm), 4) AS pcos
        |  FROM f q JOIN centq c ON q.idx = c.idx
        |  JOIN norms n ON n.vec_id = q.vec_id
        |  JOIN cnorms cn ON cn.label = c.label
        |  WHERE q.vec_id < 10
        |  GROUP BY q.vec_id, c.label, n.norm, cn.cnorm),
        |probed AS (
        |  SELECT qid, label FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY qid ORDER BY pcos DESC, label ASC) AS prank
        |    FROM probe) WHERE prank <= 2),
        |ivfdots AS (
        |  SELECT p.qid, n.vec_id AS nid, sum(q.qv * n.qv)::DOUBLE AS dot
        |  FROM probed p
        |  JOIN f n ON n.label = p.label
        |  JOIN f q ON q.vec_id = p.qid AND q.idx = n.idx
        |  WHERE n.vec_id <> p.qid
        |  GROUP BY 1, 2),
        |ivftop AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |      ORDER BY round(dot / (nq.norm * nn.norm), 4) DESC, nid ASC) AS rank
        |    FROM ivfdots JOIN norms nq ON nq.vec_id = qid
        |    JOIN norms nn ON nn.vec_id = nid) WHERE rank <= 3),
        |psub AS (
        |  SELECT vec_id, (idx - 1) // 16 AS m, (idx - 1) % 16 AS pos, qv
        |  FROM f),
        |pcb AS (
        |  SELECT vec_id AS c, m, pos, qv AS cv FROM psub WHERE vec_id < 16),
        |pdist AS (
        |  SELECT s.vec_id, s.m, pcb.c,
        |    sum((s.qv - pcb.cv) * (s.qv - pcb.cv))::BIGINT AS d2
        |  FROM psub s JOIN pcb ON s.m = pcb.m AND s.pos = pcb.pos
        |  GROUP BY 1, 2, 3),
        |pcode AS (
        |  SELECT vec_id, m, c AS code FROM (
        |    SELECT vec_id, m, c,
        |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
        |    FROM pdist) WHERE rn = 1),
        |pqd AS (SELECT vec_id AS qid, m, c, d2 FROM pdist WHERE vec_id < 10),
        |padc AS (
        |  SELECT q.qid, co.vec_id AS nid, sum(q.d2)::BIGINT AS adc
        |  FROM pcode co JOIN pqd q ON q.m = co.m AND q.c = co.code
        |  WHERE co.vec_id <> q.qid
        |  GROUP BY 1, 2),
        |pqtop AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid,
        |      row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rnk
        |    FROM padc) WHERE rnk <= 3),
        |iadc AS (
        |  SELECT q.qid, co.vec_id AS nid, sum(q.d2)::BIGINT AS adc
        |  FROM pcode co
        |  JOIN (SELECT DISTINCT vec_id, label FROM f) n ON n.vec_id = co.vec_id
        |  JOIN probed p ON p.label = n.label
        |  JOIN pqd q ON q.qid = p.qid AND q.m = co.m AND q.c = co.code
        |  WHERE co.vec_id <> q.qid
        |  GROUP BY 1, 2),
        |iadctop AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid,
        |      row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rnk
        |    FROM iadc) WHERE rnk <= 3),
        |ann AS (
        |  SELECT 'lsh' AS method, qid, nid FROM lshtop
        |  UNION ALL
        |  SELECT 'ivf' AS method, qid, nid FROM ivftop
        |  UNION ALL
        |  SELECT 'pq' AS method, qid, nid FROM pqtop
        |  UNION ALL
        |  SELECT 'ivfadc' AS method, qid, nid FROM iadctop),
        |hits AS (
        |  SELECT a.method, a.qid, count(*) AS hits
        |  FROM ann a JOIN truth t ON t.qid = a.qid AND t.nid = a.nid
        |  GROUP BY 1, 2),
        |base AS (SELECT DISTINCT qid FROM truth),
        |methods AS (SELECT unnest(['lsh','ivf','pq','ivfadc']) AS method)
        |SELECT m.method, b.qid, coalesce(h.hits, 0)::BIGINT AS hits,
        |  (coalesce(h.hits, 0) * 10000 // 3)::BIGINT AS recall_bp
        |FROM base b CROSS JOIN methods m
        |LEFT JOIN hits h ON h.method = m.method AND h.qid = b.qid""".stripMargin
  )
}
