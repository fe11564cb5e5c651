package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Physical-plan assertions: at 100 TB the plan shape IS the product.
  * These lock in predicate pushdown to the parquet scan, broadcast
  * joins for dimensions, and map-side partial aggregation — the
  * properties that keep the queries scalable regardless of data size.
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // static plan-shape assertions: AQE wraps plans in
    // AdaptiveSparkPlan(isFinalPlan=false) until executed, hiding the
    // codegen spans; runtime behavior with AQE is unchanged.
    .config("spark.sql.adaptive.enabled", "false")
    // plan STRINGS are the assertion surface — don't let long scan
    // metadata (e.g. the object tables' per-leaf schemas) elide to "..."
    .config("spark.sql.maxMetadataStringLength", "2000")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString()
  }

  test("q6: filters are pushed to the parquet scan") {
    val p = plan("q6_filter_sum")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
           p.contains("IsNotNull(l_shipdate"))
    // column pruning: the scan must not read l_returnflag etc.
    assert(p.contains("ReadSchema"))
    assert(!p.substring(p.indexOf("ReadSchema")).contains("l_returnflag"))
  }

  test("ts normalization does not block pushdown of other event filters") {
    // Tables.events adds a projection rewriting ts; a filter on a
    // DIFFERENT column (user_id) must still reach the parquet scan —
    // at 100 TB the normalization must cost a map-side expression,
    // never a lost scan-level filter
    val p = graft.queries.Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("user_id") < 10)
      .queryExecution.executedPlan.toString()
    assert(p.contains("PushedFilters:"))
    assert(p.contains("LessThan(user_id,10)"),
      s"user_id filter not pushed through the ts projection:\n${p.take(2000)}")
  }

  test("q5: dimension joins are broadcast, not shuffled") {
    val p = plan("q5_join5")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("BroadcastExchange"))
  }

  test("q1: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q1_agg")
    // two HashAggregate levels: partial_ functions then final
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("partial_sum") || p.contains("partial_count"))
  }

  test("j5: anti join uses a join, not a subquery re-scan") {
    val p = plan("j5_prune_antijoin")
    assert(p.contains("LeftAnti"))
    // the orders side is pruned to the join key + pushdown-filtered
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)") ||
           p.contains("GreaterThanOrEqual(o_orderdate"))
  }

  test("j1: self-derived registry is broadcast back against the stream") {
    val p = plan("j1_registry_lookup")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("sim queries stay inside whole-stage codegen with top-k pushdown") {
    val p = plan("sim_topk_bf")
    // "*(n)" prefixes mark whole-stage-codegen'd operators
    assert(p.contains("*("))
    assert(p.contains("vector_dot"))
    // rank<=5 is pushed down as a partial WindowGroupLimit before the
    // exchange — only ~5 rows per (qid, partition) shuffle
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("Partial"))
  }

  test("dedup candidate generation never degrades to a cartesian product") {
    // prefix-filtered n-gram join + blocked cosine join: equi-join
    // keys must survive planning (a cartesian fallback here would be
    // the 100 TB scale-killer the prefix/blocking design exists to
    // prevent)
    for (q <- Seq("dd_ngram_jaccard", "dd_embcos_neardup", "dd_simhash_pairs")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q fell back to cartesian")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q fell back to NL join")
    }
    // the embcos pair join must be keyed on (label, block-cell), not
    // label alone — the block decomposition that spreads a hot label
    val pe = plan("dd_embcos_neardup")
    val pairJoin = pe.linesIterator
      .filter(l => (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
        l.contains("label"))
      .toList
    assert(pairJoin.nonEmpty && pairJoin.forall(_.contains("blk")),
      s"embcos pair join not block-keyed:\n${pairJoin.mkString("\n")}")
  }

  test("pruned file-index reads are a bare scan with residual pushdown") {
    // the index work happens BEFORE plan construction (control-plane
    // file-list pruning), so the served plan must be just the pruned
    // parquet scan with the residual predicates pushed into it —
    // no joins, no extra exchanges beyond the aggregate's
    val p = plan("fx_pruned_box")
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(user_id") &&
      p.contains("LessThanOrEqual(user_id"),
      s"residual box predicate not pushed into the pruned scan:\n${p.take(1500)}")
    assert(!p.contains("Join"), "pruned box read should not join at serve time")
    val pl = plan("fx_point_lookup")
    assert(pl.contains("EqualTo(user_id"),
      "point predicate not pushed into the pruned scan")
    assert(!pl.contains("Exchange"),
      "point lookup should be a shuffle-free scan")
  }

  test("deletion-vector reads anti-join a BROADCAST vector, no shuffle join") {
    // merge-on-read must stay a residual broadcast anti-join on the
    // scan side: a shuffled anti-join would pay an exchange of the
    // whole table per read — the opposite of the DV design point
    val p = plan("fx_dv_census")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"DV read is not a broadcast anti-join:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      "DV anti-join degraded to a shuffle join")
  }

  test("span dedup joins hit positions on the window hash, never doc×doc") {
    // substring dedup scales because duplicated windows are found by
    // hash aggregation: the only join marks hit positions by window
    // hash `h`. Any doc-keyed pair join here would be quadratic.
    val p = plan("dd_span_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    val joins = p.linesIterator
      .filter(l => l.contains("HashJoin") || l.contains("SortMergeJoin"))
      .toList
    assert(joins.nonEmpty, s"dd_span_dedup plan has no hash joins:\n$p")
    joins.foreach { l =>
      assert(l.contains("h#"), s"join not keyed on the window hash: $l")
    }
  }

  test("decontamination joins the corpus against a BROADCAST benchmark set") {
    // at 100 TB the benchmark shingle set stays tiny — the join must
    // be a broadcast hash join on the corpus side, never a shuffle of
    // the full corpus shingles against an exchanged benchmark
    val p = plan("tx_decontaminate")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("bloom decontamination prefilters the corpus scan with might_contain") {
    // the 100 TB shape: the eval set ships as a serialized bloom
    // filter LITERAL evaluated inside the corpus scan's codegen span;
    // only ~FP-rate survivors reach the exact verify join. The plan
    // must carry the might_contain predicate as a Filter over the
    // corpus side — if it vanished, the query silently degraded to
    // the full broadcast-join shape and the bloom bought nothing.
    val p = plan("tx_decontaminate_bloom")
    assert(p.contains("might_contain"), "bloom prefilter missing from plan")
    assert(!p.contains("CartesianProduct"))
    // identical output to the exact broadcast variant: bloom false
    // positives must all die in the verify join
    val exact = SparkEntry.queries("tx_decontaminate")(spark, dir)
      .orderBy("doc_id").collect().toSeq
    val bloom = SparkEntry.queries("tx_decontaminate_bloom")(spark, dir)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact)
  }

  test("simhash pairs join in signature space, never doc×doc within lang") {
    // the round-3 scale-killer: a join keyed on lang alone makes a
    // single-language corpus all-pairs. Every non-anti join in the
    // pair generation must carry a signature column in its key.
    for (q <- Seq("dd_simhash_pairs", "dd_keeper_corpus")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q fell back to cartesian")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q fell back to NL join")
      val joins = p.linesIterator
        .filter(l => l.contains("HashJoin") || l.contains("SortMergeJoin"))
        .filterNot(_.contains("LeftAnti")) // keeper exclusion joins on doc_id
        .toList
      assert(joins.nonEmpty, s"$q plan has no hash joins:\n$p")
      joins.foreach { l =>
        assert(l.contains("sig"), s"$q has a join not keyed on signature: $l")
      }
    }
  }

  test("tfidf joins the vocabulary by token; N is a broadcast single row") {
    val p = plan("tx_tfidf")
    // the only nested-loop allowed is the broadcast of the 1-row
    // doc-count — a CartesianProduct (unbroadcast) would re-shuffle
    // the whole term-frequency table against it
    assert(!p.contains("CartesianProduct"))
    val joins = p.linesIterator
      .filter(l => l.contains("HashJoin") || l.contains("SortMergeJoin"))
      .toList
    assert(joins.nonEmpty && joins.forall(_.contains("tok")),
      s"tf-df join not keyed on token:\n${joins.mkString("\n")}")
    // term counts combine map-side ("Partial" alone is vacuous — the
    // WindowGroupLimit operator always prints a Partial mode string)
    assert(p.contains("partial_count"))
  }

  test("session windows aggregate per user without a pair join") {
    val p = plan("w_session")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("SessionWindow") || p.contains("session_window"),
      s"w_session plan lost the session-window operator:\n$p")
  }

  test("sim_lsh_topk rerank join is keyed on the bucket, never query×corpus") {
    val p = plan("sim_lsh_topk")
    assert(!p.contains("CartesianProduct"))
    val pairJoins = p.linesIterator
      .filter(l => (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
        l.contains("bucket"))
      .toList
    assert(pairJoins.nonEmpty,
      s"sim_lsh_topk lost its bucket-keyed candidate join:\n$p")
    // the only nested-loop allowed is the broadcast of the 8 planes
    assert(!p.contains("BroadcastNestedLoopJoin") ||
      p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 2)
  }

  test("dd_source_overlap is join-free: one digest groupBy, no second scan") {
    // The pre-aggregated shape: collect_set(source) per digest, pairs
    // exploded from the per-digest set. A join (or a second documents
    // scan) here would mean the dominant tokenize/md5 map work runs
    // twice and a second wide exchange appeared — the formulation this
    // replaced.
    val p = plan("dd_source_overlap")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Join"), s"overlap regressed to a join:\n$p")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1,
      "overlap must scan documents exactly once")
    assert(p.contains("collect_set"))
  }

  test("semantic dedup pair join is keyed on (cluster, block-cell)") {
    // SemDeDup's scale guarantee: pairs only within the ASSIGNED
    // cluster, block-decomposed. A join keyed on cluster alone (or a
    // cartesian fallback) would re-create the all-pairs blow-up the
    // assignment exists to prevent. The broadcast nested loops allowed
    // are the tiny centroid/cell tables.
    val p = plan("dd_semantic_dedup")
    assert(!p.contains("CartesianProduct"))
    val pairJoin = p.linesIterator
      .filter(l => (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
        l.contains("cluster"))
      .toList
    assert(pairJoin.nonEmpty && pairJoin.forall(_.contains("blk")),
      s"semantic-dedup pair join not block-keyed:\n${pairJoin.mkString("\n")}")
  }

  test("centroid scoring joins a BROADCAST codebook; logprob joins by token") {
    // sim_centroid_outlier: the labels×dims centroid table must arrive
    // as a broadcast — shuffling the corpus against it would serialize
    // the scoring pass at scale
    val po = plan("sim_centroid_outlier")
    assert(po.contains("BroadcastHashJoin"))
    assert(!po.contains("CartesianProduct"))
    // tx_unigram_logprob: doc terms join the vocabulary ON THE TOKEN;
    // the corpus total is a broadcast single row (BroadcastNestedLoop
    // of 1 row), never an exchanged table
    val pl = plan("tx_unigram_logprob")
    assert(!pl.contains("CartesianProduct"))
    val joins = pl.linesIterator
      .filter(l => l.contains("HashJoin") || l.contains("SortMergeJoin"))
      .toList
    assert(joins.nonEmpty && joins.forall(_.contains("tok")),
      s"logprob join not keyed on token:\n${joins.mkString("\n")}")
  }

  test("rolling 24h window partitions on the time chunk, not the bare type") {
    // the skew guarantee: the RANGE-frame window must partition on
    // (event_type, chunk) so a dominant event type spreads over
    // time-chunk tasks instead of serializing on one; a bare
    // per-type partitioning caps parallelism at type cardinality
    val p = plan("q_rolling_24h")
    val windows = p.linesIterator.filter(_.contains("Window")).toList
    assert(windows.exists(l => l.contains("chunk")),
      s"rolling window not chunk-partitioned:\n${windows.mkString("\n")}")
  }

  test("range join probes on the time bucket, never a nested-loop interval scan") {
    // the bucketed-range-join guarantee: the interval predicate rides
    // on an EQUI-join on the bucket; a BETWEEN-only join would plan as
    // a nested loop — quadratic at scale
    val p = plan("q_range_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    val joins = p.linesIterator
      .filter(l => l.contains("HashJoin") || l.contains("SortMergeJoin"))
      .toList
    assert(joins.nonEmpty && joins.forall(_.contains("bucket")),
      s"range join not keyed on the bucket:\n${joins.mkString("\n")}")
  }

  test("events scans prune columns (s3 reads only 2 of 6 columns)") {
    val p = plan("s3_route_msgtype")
    val rs = p.substring(p.indexOf("ReadSchema"))
    assert(rs.contains("event_type"))
    assert(!rs.contains("props"))
    assert(!rs.contains("user_id"))
  }

  test("dedup propagation rounds run at the pinned small parallelism") {
    // The clusterers' per-round joins operate on an LSH-verified edge
    // set orders of magnitude smaller than the corpus; each round must
    // execute at DedupPipeline.roundPartitions, NOT the session's
    // scan-sized shuffle parallelism — tiny-task fanout per round is
    // what made these two queries dominate the suite under host load.
    import spark.implicits._
    // two components, one a chain (exercises pointer jumping)
    val verified = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val edges = verified.union(
      verified.select(org.apache.spark.sql.functions.col("doc_b").as("doc_a"),
        org.apache.spark.sql.functions.col("doc_a").as("doc_b")))
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)

    val fixed = DedupPipeline.propagateFixed(spark, edges, 3)
    assert(fixed.rdd.getNumPartitions <= DedupPipeline.roundPartitions,
      "fixed-round labels must materialize at the pinned round parallelism")
    assert(fixed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)

    val conv = DedupPipeline.propagateConverged(spark, edges)
    assert(conv.rdd.getNumPartitions <= DedupPipeline.roundPartitions,
      "converged labels must materialize at the pinned round parallelism")
    assert(conv.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)

    // the pin is scoped: session parallelism is restored afterwards
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
  }

  test("tx_pack: the corpus prefix sum never runs a data-sized global window") {
    val p = plan("tx_pack")
    // the big-side running sum must be partitioned (by the range
    // bucket pid); the only permissible unpartitioned window is the
    // P-row bucket-offset prefix. A `Window [...] ORDER BY doc_id`
    // with an empty partition spec over the documents scan would be
    // the single-task shape that dies at 100 TB.
    val windows = p.linesIterator.filter(_.contains("Window ")).toList
    assert(windows.exists(_.contains("partitionBy")) ||
           windows.exists(_.contains("pid")),
      s"expected the doc-side window partitioned by pid:\n${windows.mkString("\n")}")
    // the bucket offsets join back as a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast-join back to the docs")
  }

  test("tx_pad_buckets: ranks come from partitioned windows + broadcast offsets") {
    val p = plan("tx_pad_buckets")
    // per-doc local ranks run PARTITIONED by the bucket key; the only
    // unpartitioned window is the per-bucket-count offset prefix
    // (rows = distinct lengths / 16 hash prefixes). A global
    // `row_number() OVER (ORDER BY n_toks)` over the corpus would be
    // the single-task sort that dies at 100 TB.
    val windows = p.linesIterator.filter(_.contains("Window ")).toList
    assert(windows.exists(w => w.contains("row_number") && w.contains("bk")),
      s"local ranks must partition by the bucket key:\n${windows.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast-join back to the docs")
  }

  test("dd_importance_resample: cumulative weights avoid a global window") {
    val p = plan("dd_importance_resample")
    val windows = p.linesIterator.filter(_.contains("Window ")).toList
    // per-doc running weights are PARTITIONED by the range bucket;
    // the only unpartitioned window is the P-row bucket-offset prefix
    assert(windows.exists(w => w.contains("pid")),
      s"cumulative weights must partition by the range bucket:\n${windows.mkString("\n")}")
  }

  test("sim_kmeans: per-round assignment broadcasts centroids, no window shuffle") {
    val df = graft.queries.ReadQueries.kmeansClusters(spark, dir, k = 4, iters = 1)
    val p = df.queryExecution.executedPlan.toString()
    // centroids reach every vector via broadcast nested loop (k rows),
    // and the argmin is a struct-min AGGREGATE — partial map-side
    // combine — not a per-vector rank window
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid fan-out must be a broadcast join")
    assert(!p.linesIterator.exists(l =>
        l.contains("Window ") && l.contains("vec_id")),
      "assignment must be a partial-agg struct-min, not a rank window")
  }

  test("tx_bm25: the df/stats model tables broadcast; postings aggregate map-side") {
    val p = plan("tx_bm25")
    // the 3-row document-frequency table and 1-row corpus stats must
    // reach the postings via broadcast, never a shuffled join; the
    // tf aggregation must partial-combine before its exchange
    assert(p.contains("BroadcastHashJoin") ||
           p.contains("BroadcastNestedLoopJoin"),
      "model tables must broadcast")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "tf must be a hash aggregate with partials")
  }

  test("tx_pmi_pairs: the vocabulary reaches the pair join as a broadcast") {
    val p = plan("tx_pmi_pairs")
    // the top-V vocabulary bounds the pair fan-out — it must fan out
    // via broadcast; a shuffled vocab join would defeat the bound's
    // purpose at scale
    assert(p.contains("BroadcastHashJoin"), "vocab must broadcast")
    // the top-V selection itself is a TakeOrdered, not a global sort
    assert(p.contains("TakeOrderedAndProject"),
      "top-V vocabulary must use top-k selection, not a full sort")
  }

  test("q_rel_division: divisor cardinality broadcasts; no anti-join cascade") {
    val p = plan("q_rel_division")
    assert(!p.contains("SortMergeJoin"),
      "division must not degenerate into shuffled joins")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the 1-row divisor count must broadcast")
  }

  test("tx_bpe_encode: the vocabulary-bounded symbol table broadcasts") {
    val p = plan("tx_bpe_encode")
    // the per-word encode table is Heaps'-law bounded — the document
    // join must broadcast it; a shuffled join would re-partition the
    // whole corpus against a vocab-sized side
    assert(p.contains("BroadcastHashJoin"), "encoded vocab must broadcast")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side shuffle join against the vocab table:\n$p")
  }

  test("dd_cdc_dupfrac: chunking is one codegen'd generate, dedup is aggregation") {
    val p = plan("dd_cdc_dupfrac")
    // the codegen'd cdc_chunks lineage is checkpointed at build time
    // (CdcChunksSpec pins its codegen placement); the FINAL plan must
    // read that one materialization — not recompute per consumer —
    // and keep dedup aggregation-shaped: no pair-join of any kind
    assert(p.contains("Scan ExistingRDD"),
      "chunk rows must come from the single checkpointed materialization")
    // the dup-count join back is keyed on the chunk hash — big×big at
    // corpus scale, so a SHUFFLED join there is the correct plan; what
    // must never appear is any pair-explosion shape
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"CDC dedup must stay aggregation-shaped:\n$p")
  }

  test("object table reads typed leaf columns — no JSON re-parse in the plan") {
    val p = plan("w4_object_projection")
    // the storage layout is one typed parquet column per leaf: the
    // read must be a column select, never a per-row JSON extraction
    assert(!p.contains("get_json_object"))
    val rs = p.substring(p.indexOf("ReadSchema"))
    // leaves are read as their OWN typed columns (columnar, vectorized,
    // min/max-indexed) — not re-derived from a monolithic blob column
    assert(rs.contains("v_s:string") && rs.contains("v_d:double"))
    assert(!rs.contains("v_json"))
  }

  test("sim_lex_topk: query terms broadcast into the champion join; no cartesian") {
    val p = plan("sim_lex_topk")
    // the |Q|-sized pruned query-term table is the broadcast side of
    // the posting join — the corpus-sized champion table never
    // broadcasts and never cartesians (the only nested-loop join is
    // the 1-row stats scalar)
    assert(p.contains("BroadcastHashJoin"),
      s"query terms should broadcast-join the champions:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), "unexpected cartesian")
    // two-phase champion cut: two Window operators (shard-local rank,
    // then the bounded global rank) — the shape that keeps corpus-
    // sized partitions out of any single window
    assert("Window".r.findAllIn(p).size >= 3, // qterms + 2 champion phases
      "two-phase champion windows collapsed — corpus-sized window risk")
  }

  test("q_hll_users / q_cms_heavy: sketch builds aggregate map-side") {
    for (q <- Seq("q_hll_users", "q_cms_heavy")) {
      val p = plan(q)
      assert(p.contains("partial_max") || p.contains("partial_count") ||
        p.contains("partial_min"),
        s"$q: sketch build lost its map-side combine:\n${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), s"$q: unexpected cartesian")
    }
  }

  test("tx_kn_bigram: model tables join on the bigram; the type census broadcasts") {
    val p = plan("tx_kn_bigram")
    // n11 (1 row) must broadcast; doc-bigram scoring joins on bg
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "bigram-type aggregations lost map-side combine")
  }

  test("imperative sketch aggregates keep map-side partial aggregation") {
    // the custom TypedImperativeAggregates must flow through
    // partial/final aggregation (one buffer per group per partition
    // crosses the shuffle), never a whole-rows shuffle into a single
    // aggregation
    for (q <- Seq("q_mg_agg", "q_kmv_agg", "q_cms_agg", "q_hll_agg")) {
      val p = plan(q)
      assert(p.contains("partial_"),
        s"$q: imperative aggregate lost its map-side partial:\n${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), s"$q: unexpected cartesian")
    }
  }

  test("q_revenue_gini: the user rank never runs a data-sized global window") {
    val p = plan("q_revenue_gini")
    // the per-user rank must run PARTITIONED by the range bucket; the
    // only unpartitioned window is the bucket-offset prefix (one row
    // per bucket). A global `row_number() OVER (ORDER BY cents)` over
    // the user dimension is the single-task sort that dies at 100 TB.
    val windows = p.linesIterator.filter(_.contains("Window ")).toList
    assert(windows.exists(w => w.contains("row_number") &&
        w.contains("__brk")),
      s"user rank must partition by the range bucket:\n${windows.mkString("\n")}")
    assert(!windows.exists(w => w.contains("row_number") &&
        !w.contains("__brk")),
      s"found an unbucketed global row_number:\n${windows.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast-join back to the user rows")
  }

  test("q_kll_percentiles: one corpus scan total, behind the shared checkpoint") {
    // the (g, v, uid) base is checkpointed once and feeds BOTH the
    // sketch's merge rounds (themselves per-round checkpoints) and the
    // exact audit — the served plan must therefore contain NO events
    // scan at all; the single scan lives in the checkpoint builder
    val p = plan("q_kll_percentiles")
    assert(!p.contains("events.parquet"),
      "q_kll_percentiles re-scans events — the shared checkpoint leaked")
    assert(!p.contains("CartesianProduct"))
  }
}
