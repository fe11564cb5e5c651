package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Large-scale training-data pipeline operators: deduplication
  * (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine),
  * similarity search (brute-force and LSH-bucketed ANN), and text
  * analysis — over the `documents` and `embeddings` tables.
  *
  * Determinism across engines: all hashing is md5 (identical in Spark
  * and DuckDB); all embedding arithmetic runs on an exact integer
  * quantization (`quantEmb`: floor(val × 1e6) per element) via
  * vector_dot_long, so every accumulated sum is order-independent and
  * bit-identical across engines — only sqrt/divide/round touch
  * floats, and those are IEEE-deterministic on identical inputs.
  * Outputs round to 4 decimals.
  *
  * Scale notes (100 TB): every pipeline here is shuffle-bounded by
  * design — shingling/minhashing is map-side (explode + partial agg),
  * LSH banding turns all-pairs O(n²) similarity into per-bucket
  * joins, and brute-force scoring is only used as the oracle baseline
  * for the bucketed variants.
  */
object AnalyticsQueries extends QueryPack {

  /** tokens as a Column (whitespace split). */
  private val toks = split(col("text"), " ")

  /** Stopword marker list shared by tx_quality and tx_corpus_gate. */
  private val stopwords =
    array(Seq("the", "a", "of", "and", "to", "in").map(lit): _*)

  /** The quality score (weights 0.4/0.3/0.3 over length, non-stopword
    * ratio, avg token length) — ONE definition, folded into both
    * tx_quality and tx_corpus_gate so a threshold tune can't make the
    * composed gate silently disagree with the standalone filter.
    * Expression trees (not just values) must be identical between
    * callers: double arithmetic association is order-sensitive.
    */
  private def qualityScoreRaw(nTokens: Column, nStop: Column,
      nChars: Column): Column =
    least(nTokens / 100.0, lit(1.0)) * 0.4 +
    (lit(1.0) - nStop / nTokens) * 0.3 +
    least((nChars - (nTokens - 1)) / nTokens / 8.0, lit(1.0)) * 0.3

  /** Embeddings with an exact integer shadow of each vector:
    * `q` = per-element floor(val × 1e6) as long, `qnorm` = sqrt of
    * the exact integer self-dot. All cosine arithmetic downstream
    * runs on `q` via vector_dot_long, so every sum is
    * order-independent and bit-identical across engines; the only
    * floating ops left (sqrt, one divide, round) are
    * IEEE-deterministic on identical inputs. Quantization error
    * (≤1e-6 per element) moves cosines by <1e-5 — irrelevant for
    * dedup/ANN semantics, decisive for a flake-free gate: the float
    * path's engine-dependent accumulation order could flip a
    * round(x,4) boundary or a nearest-centroid rank, silently
    * changing the whole in-cluster pair set. |q| ≤ 1e6, dims = 64 →
    * every dot ≤ 6.4e13 « 2^63 (vector_dot_long accumulates in long).
    * Elements are INT, not long: |q| « 2^31 for any |val| < 2000, and
    * an int array shuffles in the same 4 bytes/element the raw float
    * did — a long array would double the vector bytes on every
    * pair-join shuffle for no extra exactness.
    */
  private[queries] def quantEmb(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, d)
      .withColumn("q", transform(col("embedding"),
        x => floor(x.cast("double") * lit(1000000.0)).cast("int")))
      .withColumn("qnorm",
        sqrt(expr("vector_dot_long(q, q)").cast("double")))
  }

  /** Per-doc packing spans (see `tx_pack`): the global token offset of
    * every document under corpus-order concatenation, and the
    * W=512-token context windows it lands in. The prefix sum is
    * computed distributed: deterministic range buckets (doc_id against
    * the broadcast max — no sampled RangePartitioner, so bucket ids
    * are stable across engines and runs), per-bucket subtotals
    * exclusive-prefixed over a P-row window (the ONLY unpartitioned
    * window — trivially tiny), broadcast back, then a per-bucket
    * running sum partitioned P ways. A bare `sum() OVER (ORDER BY
    * doc_id)` would be a single-partition window over the whole
    * corpus — the shape that dies at 100 TB.
    */
  private def packSpans(s: SparkSession, d: String): DataFrame =
    packSpansOf(Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks")))

  /** Shared BPE trainer (see `tx_bpe_train` for the full design
    * note): `rounds` iterations of pair-count → argmax → merge over
    * the word-frequency table. Returns the learned merge table
    * (round, rank, left, right, count — top 5 per round) and the
    * final per-word symbol sequences for the encode side.
    */
  /** Replace passes per BPE merge round (see the run-collapsing note
    * in [[bpeTrain]]): 5 passes collapse runs in words up to 64
    * symbols; the corpus's longest word is 8 chars. Mirrored
    * literally by the oracle's nested replace() calls.
    */
  private val bpeMergePasses = 5

  /** The oracle-side mirror of the run-collapsing merge: the same
    * `bpeMergePasses`-deep nested replace the Spark side folds,
    * generated from the ONE constant so a pass-count tune can never
    * silently desynchronize the seven SQL sites from the engine.
    */
  private def bpeMergeSql(n: Int): String = {
    val arg =
      s"' ' || b$n.l || ' ' || b$n.r || ' ', ' ' || b$n.l || b$n.r || ' '"
    ("replace(" * bpeMergePasses) + "seq,\n" +
      (1 to bpeMergePasses).map { i =>
        s"        |    $arg)" + (if (i < bpeMergePasses) "," else " AS seq")
      }.mkString("\n")
  }

  private def bpeTrain(s: SparkSession, d: String, rounds: Int)
      : (Seq[(Int, Int, String, String, Long)], DataFrame) = {
    val words = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("seq",
        concat(lit(" "), array_join(split(col("word"), ""), " "), lit(" ")))
      .select(col("word"), col("freq"), col("seq"))
    var seqs = words.localCheckpoint(true)
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = seqs
        .select(col("freq"), split(trim(col("seq")), " ").as("syms"))
        .select(col("freq"), explode(expr(
          """CASE WHEN size(syms) >= 2 THEN
               transform(sequence(1, size(syms) - 1), i ->
                 named_struct('l', element_at(syms, i),
                              'r', element_at(syms, i + 1)))
             ELSE cast(array() as array<struct<l:string,r:string>>) END"""))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(5)
        .collect() // 5 rows: the argmax + audit ranks — control-plane sized
      // a fully-merged vocabulary (every word one symbol) has no pairs
      // left — stop learning instead of indexing an empty argmax. Real
      // corpora never exhaust in 4 rounds; on a degenerate one the
      // oracle's unrolled CTEs go empty from the exhausted round on,
      // so the engines also structurally diverge there — acceptable
      // for a crash guard on inputs outside the operator's domain.
      if (top.isEmpty) return (learned.toSeq, seqs)
      top.zipWithIndex.foreach { case (row, i) =>
        learned += ((r, i + 1, row.getString(0), row.getString(1),
          row.getLong(2)))
      }
      val (bl, br) = (top(0).getString(0), top(0).getString(1))
      // run-collapsing merge: one literal replace pass consumes the
      // shared sentinel space between adjacent occurrences, so a run
      // like ' a a a a ' under-merges to [aa, a, a] in a single pass;
      // re-applying the SAME replace reaches the fixpoint ([aa, aa])
      // because every pass at least halves a run's remaining adjacent
      // matches. bpeMergePasses nested passes therefore fully
      // collapse runs in words up to 2^(passes+1) symbols — far past
      // any real tokenizer input — and passes beyond the fixpoint are
      // exact no-ops, so both engines can nest the same fixed count
      // (the oracle mirrors the nesting literally). lit() so symbols
      // can never inject into an expression string.
      val next = seqs.withColumn("seq",
          (1 to bpeMergePasses).foldLeft(col("seq"))((c, _) =>
            replace(c, lit(s" $bl $br "), lit(s" $bl$br "))))
        .localCheckpoint(true)
      // the superseded round's checkpoint blocks only fed `next`,
      // which is now eagerly materialized — release them instead of
      // pinning executor memory for the rest of the session
      releaseCheckpoint(seqs)
      seqs = next
    }
    (learned.toSeq, seqs)
  }

  /** Balanced bucket ids for a distributed two-phase prefix sum:
    * bucket boundaries are the P−1 percentiles of the OBSERVED id
    * set, so a survivor set whose ids cluster (a filter keeping only
    * recent docs of an append-ordered corpus) still spreads ≈ N/P
    * rows per bucket — the value-range `id·P div (max+1)` scheme this
    * replaces put such a set almost entirely into one bucket,
    * recreating the single-partition running sum the decomposition
    * exists to avoid.
    *
    * Correctness does NOT depend on where the boundaries fall: the
    * two-phase sum (per-bucket totals + intra-bucket window) equals
    * the global prefix sum for ANY bucketing monotone in the ordering
    * key, which `size(filter(bounds, b <= id))` is by construction.
    * That freedom is why `approx_percentile` is the right estimator
    * here — Spark's EXACT percentile aggregates a per-value counts
    * map (memory linear in distinct ids: an OOM at corpus scale),
    * while the GK sketch is bounded-memory and any estimation error
    * moves only task sizing, never a single output value (the spec
    * pins both properties).
    */
  private[graft] def percentileBuckets(df: DataFrame, idCol: String,
      p: Int): DataFrame = {
    val pcts = (1 until p).map(_.toDouble / p).mkString(",")
    val bounds = df.agg(
      expr(s"approx_percentile($idCol, array($pcts), 10000)").as("__bounds"))
    df.crossJoin(broadcast(bounds))
      .withColumn("pid", expr(s"size(filter(__bounds, x -> x <= $idCol))"))
      .drop("__bounds")
  }

  /** The packing core over any (doc_id, n_toks) set — tx_pack feeds it
    * the whole corpus, pipe_corpus_windows the gated/decontaminated
    * survivor set. Bucketing is percentile-balanced (see
    * [[percentileBuckets]]), so clustered survivor ids cannot
    * collapse the prefix sum into one partition.
    */
  private def packSpansOf(sized: DataFrame): DataFrame = {
    val W = 512L; val P = 8
    val bucketed = percentileBuckets(sized, "doc_id", P)
    val offW = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = bucketed.groupBy(col("pid"))
      .agg(sum(col("n_toks")).as("psum"))
      .withColumn("offset",
        coalesce(sum(col("psum")).over(offW), lit(0L)))
      .select(col("pid"), col("offset"))
    val local = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
    bucketed
      .withColumn("local_end", sum(col("n_toks")).over(local))
      .join(broadcast(off), Seq("pid"))
      .select(col("doc_id"), col("n_toks"),
        (col("offset") + col("local_end") - col("n_toks")).as("start_tok"))
      .withColumn("win_first", expr(s"start_tok div $W"))
      .withColumn("win_last", expr(s"(start_tok + n_toks - 1) div $W"))
      .withColumn("n_windows", col("win_last") - col("win_first") + lit(1L))
  }

  /** The corpus admission gate (see `tx_corpus_gate`): one verdict per
    * document — too_short / repetitive / bag_dup / low_quality / pass —
    * from the shared qualityScoreRaw score, the Gopher-style duplicate-
    * bigram rule, and a token-bag duplicate keeper election. Shared by
    * `tx_corpus_gate` (reports every verdict) and
    * `pipe_corpus_windows` (keeps only 'pass'), so a threshold tune
    * cannot make the standalone gate and the composed pipeline
    * silently disagree.
    */
  /** The gate's STATELESS columns (everything derivable from one
    * document alone): token/bigram stats, the token-bag hash, the
    * quality score. Shared verbatim by the batch gate (which adds the
    * corpus-wide min-id keeper election as a window) and
    * [[graft.streaming.StreamingGate]] (which replaces that window
    * with keyed first-seen state) — one definition, so a threshold
    * tune can never make batch and streaming verdicts drift.
    */
  private[graft] def gateStateless(docs: DataFrame): DataFrame =
    docs
      // pass an event-time column through when the caller has one
      // (the streaming gate's watermark TTL rides on it); the batch
      // gate's inputs never carry it, so its plan is unchanged
      .select(Seq(col("doc_id"), col("n_chars"),
        split(col("text"), " ").as("tk")) ++
        (if (docs.columns.contains("ingest_ts")) Seq(col("ingest_ts"))
         else Nil): _*)
      .withColumn("n_tokens", size(col("tk")))
      .withColumn("bag_hash",
        md5(concat_ws(" ", array_sort(array_distinct(col("tk"))))))
      .withColumn("bigrams", Shingles.wordNgrams(col("tk"), 2))
      .withColumn("n_bigrams", size(col("bigrams")))
      .withColumn("n_dbg", size(array_distinct(col("bigrams"))))
      .withColumn("n_stop",
        size(filter(col("tk"), t => array_contains(stopwords, t))))
      .withColumn("score_raw",
        qualityScoreRaw(col("n_tokens"), col("n_stop"), col("n_chars")))
      .withColumn("score_bp", floor(col("score_raw") * 10000).cast("long"))

  /** Degree-orientation of an undirected edge set stored once as
    * (doc_a < doc_b): every edge re-points from its lower-(degree, id)
    * endpoint to the higher, returned as (u, v, dv) with dv = v's
    * degree (carried so wedge enumeration can re-use the same total
    * order without another join). The point is 100 TB shape: under
    * this orientation a vertex's OUT-degree is O(√m)-bounded
    * (Schank–Wagner), so a hub with degree 10⁶ anchors ZERO wedges
    * instead of ~10¹² — the skew that kills id-oriented wedge joins
    * on dense template families. Triangle counts are invariant under
    * any edge orientation, so results (and oracle hashes) don't move.
    */
  private[graft] def orientedEdges(e: DataFrame): DataFrame =
    orientedEdges(e, degreesOf(e))

  /** Per-vertex degree of a (doc_a < doc_b) edge set. */
  private def degreesOf(e: DataFrame): DataFrame =
    e.select(col("doc_a").as("v"))
      .unionAll(e.select(col("doc_b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))

  private def orientedEdges(e: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = e
      .join(deg.select(col("v").as("doc_a"), col("deg").as("da")), Seq("doc_a"))
      .join(deg.select(col("v").as("doc_b"), col("deg").as("db")), Seq("doc_b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("doc_a") < col("doc_b"))
    withDeg.select(
      when(aFirst, col("doc_a")).otherwise(col("doc_b")).as("u"),
      when(aFirst, col("doc_b")).otherwise(col("doc_a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
  }

  /** Exactly-once triangle enumeration over (doc_a < doc_b) edges via
    * the degree-oriented "forward" wedge join: a wedge is two
    * out-edges of the same LOW vertex u — (u→v, u→w) with
    * (deg v, v) < (deg w, w) — closed against the oriented edge v→w
    * its order implies. Every triangle has exactly one minimum-
    * (degree, id) vertex, so each is counted once; no 6-fold
    * overcount, no all-pairs, and hubs never anchor wedges (see
    * [[orientedEdges]]). Wedge totals come from a degree aggregate,
    * not a join.
    */
  private[graft] def triangleCensus(e: DataFrame): DataFrame = {
    // the degree table feeds both orientation joins AND the wedge
    // total — computed once; the oriented set feeds three wedge-join
    // sides — materialized once
    val deg = degreesOf(e).localCheckpoint(true)
    // The wedge join's WORK is its output rows (Σ deg·(deg−1)/2 — 22×
    // its input rows at sf0.1: 139k edges → 3.1M wedges → 2.3M
    // closures), but its input is a few MB, so AQE's bytes-blind
    // coalescing ran the whole enumerate+filter+probe stage on the
    // oriented set's ~4 checkpoint partitions (measured 1.6s serial
    // tail). Size the oriented layout by the wedge total instead —
    // one scalar over the already-checkpointed degree table, known
    // driver-side before the join is planned (guide §2.5 input
    // parallelism / §1.2 first-principles: parallelism must follow
    // fan-OUT work, which exchange bytes cannot express). Partitioned
    // by u, so the wedge self-join reuses the layout with no further
    // exchange; per-u skew is bounded by the degree orientation
    // (out-degree ≤ O(√m), Schank–Wagner).
    val nWedges = Option(deg
        .agg(sum(expr("deg * (deg - 1) div 2"))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val maxPar = e.sparkSession.sparkContext.defaultParallelism
    val wedgePar = math.max(1L,
      math.min(maxPar.toLong, nWedges / 100000L)).toInt
    val o = orientedEdges(e, deg).localCheckpoint(true)
    // explicit count so AQE cannot re-collapse it; the checkpoint
    // cannot carry the layout itself (LogicalRDD forgets partitioning)
    val oStream = o.repartition(wedgePar, col("u"))
    val wedge = oStream.select(col("u"), col("v"), col("dv"))
      .join(o.select(col("u"), col("v").as("w"), col("dv").as("dw")), Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val tri = wedge
      .join(o.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = deg
      .agg(sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    tri.crossJoin(wedges)
      .withColumn("gcc_bp",
        expr("CASE WHEN n_wedges > 0" +
          " THEN n_triangles * 3 * 10000 div n_wedges ELSE 0 END"))
  }

  private def gateVerdicts(s: SparkSession, d: String): DataFrame = {
    val base = gateStateless(Tables.documents(s, d))
    base
      .withColumn("bag_keeper",
        min(col("doc_id")).over(Window.partitionBy(col("bag_hash"))))
      .withColumn("verdict",
        when(col("n_tokens") < 16, "too_short")
          .when(col("n_dbg") * 2 < col("n_bigrams"), "repetitive")
          .when(col("doc_id") =!= col("bag_keeper"), "bag_dup")
          .when(col("score_bp") < 5000, "low_quality")
          .otherwise("pass"))
      .select(col("doc_id"), col("verdict"), col("score_bp"))
  }

  /** Flattened (vec_id, label, idx, qv) view of the quantized
    * embeddings — the join-friendly layout for centroid sums.
    */
  private def flatEmbQ(s: SparkSession, d: String): DataFrame =
    quantEmb(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("q")).as(Seq("idx", "qv")))

  /** The mm_wav_* synthesized mono 16-bit PCM WAV: sample(i) =
    * (id·37 + i²) mod 65536 − 32768, per-doc length 500 + id%1000 and
    * rate 8000 + (id%4)·4000 — one builder for the energy and the
    * sample-feature queries so their streams cannot drift apart.
    */
  private def wavBytesOf(id: Long): Array[Byte] = {
    val n = 500 + (id % 1000).toInt
    val rate = 8000 + (id % 4).toInt * 4000
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0L
    while (i < n) {
      bb.putShort((((id * 37 + i * i) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** SimHash signatures per document: 16-bit signature from per-token
    * md5 bits, majority-voted per bit. Map-side explode + two partial
    * aggregations — the single shared lineage behind `dd_simhash`,
    * `dd_simhash_pairs` and `dd_keeper_corpus`.
    */
  /** 16-bit simhash per (doc, lang) in ONE keyed aggregation (r17 opt
    * round, guide §2.3/§2.4): the old shape exploded every token ×16
    * bits and paid TWO shuffles (votes per (doc, bit), then the sig
    * fold per doc); here the 16 bit-votes are 16 codegen'd SUM buffers
    * over the un-exploded token rows — vote_b = Σ(±1 on bit b of the
    * token hash) exactly as before — and the signature folds from the
    * vote columns map-side after the single (doc, lang) shuffle.
    * Bit-identical to the exploded form (same votes, same majority,
    * same Σ 2^b), which the DuckDB oracle replays unchanged. */
  private def simhashSigs(s: SparkSession, d: String): DataFrame = {
    val votes = (0 until 16).map { b =>
      sum(when(expr(s"shiftright(tok_hash, $b) % 2") === 1, 1)
        .otherwise(-1)).as(s"v$b")
    }
    // NOTE (r18, measured and REJECTED): the documentsParallel scan-
    // parallelism floor read dd_simhash_pairs 0.55→1.22 s and
    // dd_kcore 1.36→2.36 s quiet — the simhash map work is light
    // (one 4-hex-digit md5 prefix per token) but the 32-partition
    // layout propagates into the cached sigs and every downstream
    // ball/expansion/peel stage pays 32-task scheduling across ~10
    // stages. The serial scan is the cheaper end of this family.
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(toks).as("tok"))
      .withColumn("tok_hash",
        conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("int"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), col("lang"),
        (0 until 16).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
  }

  /** Near-dup pairs (hamming <= 2) via SIGNATURE-space enumeration —
    * never doc×doc. The signature space is 2^16, so the distinct
    * (lang, sig) set is bounded at 65,536 rows per language REGARDLESS
    * of corpus size, and each sig's hamming<=2 ball has exactly
    * 1 + 16 + C(16,2) = 137 members. We enumerate the ball from each
    * present signature (canonicalized to sig_hi >= sig_lo), keep only
    * neighbors that actually occur (equi-join against the tiny
    * distinct-sig set — broadcastable at any scale), then expand the
    * surviving signature pairs back to document pairs with two
    * equi-joins on (lang, sig). Every join is hash-keyed; the only
    * quadratic term left is the true output itself (documents sharing
    * an identical signature — inherent to the answer, not the plan).
    * A single-language 100 TB corpus costs the same enumeration as a
    * multilingual one.
    */
  private[queries] def simhashNearDupPairs(s: SparkSession, d: String): DataFrame = {
    val sigs0 = simhashSigs(s, d)
      .cache() // read 3× below (distinct sigs + both expansion sides)
    // bounded pair generation: the doc-pair fan-out here is
    // |bucket(sig_a)| × |bucket(sig_b)| per signature pair, so one
    // signature shared by >cap documents (a boilerplate page at crawl
    // scale) explodes quadratically. Drop-and-log such signature
    // buckets; no-op on healthy data — see BoundedBuckets.
    val sigs = graft.operators.BoundedBuckets.cap(
      sigs0, Seq("lang", "sig"), tag = "dd_simhash_sig_buckets")
    val present = sigs.select(col("lang"), col("sig")).distinct()
    val ball = present.select(col("lang"), col("sig").as("sig_lo"),
        explode(expr(
          """concat(
            |  array(int(sig)),
            |  transform(sequence(0, 15), i -> int(sig) ^ shiftleft(1, i)),
            |  flatten(transform(sequence(0, 14), i ->
            |    transform(sequence(i + 1, 15), j ->
            |      int(sig) ^ shiftleft(1, i) ^ shiftleft(1, j))))
            |)""".stripMargin)).as("sig_hi"))
      .filter(col("sig_hi") >= col("sig_lo"))
    val sigPairs = ball.join(
        present.select(col("lang").as("lang_p"), col("sig").as("sig_p")),
        col("lang") === col("lang_p") && col("sig_hi") === col("sig_p"))
      .select(col("lang"), col("sig_lo"), col("sig_hi"))
    val lo = sigs.select(col("lang").as("lang_1"), col("sig").as("sig_1"),
      col("doc_id").as("d1"))
    val hi = sigs.select(col("lang").as("lang_2"), col("sig").as("sig_2"),
      col("doc_id").as("d2"))
    sigPairs
      .join(lo, col("lang") === col("lang_1") && col("sig_lo") === col("sig_1"))
      .join(hi, col("lang") === col("lang_2") && col("sig_hi") === col("sig_2"))
      // same-sig groups enumerate each unordered doc pair twice (d1,d2
      // swapped) — keep d1 < d2; cross-sig pairs appear exactly once
      // (the sig pair itself is canonical), so no dedup needed there.
      .filter(col("sig_lo") =!= col("sig_hi") || col("d1") < col("d2"))
      .select(least(col("d1"), col("d2")).as("doc_a"),
        greatest(col("d1"), col("d2")).as("doc_b"),
        expr("bit_count(sig_lo ^ sig_hi)").as("hamming"))
  }

  /** Per-label centroid arrays (idx-ordered, double) with their norms —
    * the trained "codebook" behind `sim_centroid_outlier` (distance to
    * OWN label centroid) and `dd_semantic_dedup` (assignment to the
    * NEAREST centroid). Bounded by labels × dims regardless of corpus
    * size, so it broadcasts forever.
    */
  private[queries] def labelCentroids(s: SparkSession, d: String): DataFrame =
    flatEmbQ(s, d).groupBy(col("label").as("clabel"), col("idx"))
      .agg(sum(col("qv")).as("sq"), count(lit(1)).as("nq"))
      // truncating integer division re-quantizes the centroid exactly
      // AND keeps it bounded by max|q| regardless of group size — an
      // exact sum-of-squares over raw per-label SUMS would overflow
      // long at ~5e9 rows/label; the re-quantized centroid never can
      .withColumn("cq", expr("cast(sq div nq as int)"))
      .groupBy(col("clabel"))
      .agg(transform(sort_array(collect_list(struct(col("idx"), col("cq")))),
        x => x.getField("cq")).as("carr"))
      .withColumn("cnorm",
        sqrt(expr("vector_dot_long(carr, carr)").cast("double")))

  /** Exact same-group cosine pairs via B×B block decomposition — the
    * skew-salting shape for exact within-group pairing, shared by
    * `dd_embcos_neardup` (group = given label) and `dd_semantic_dedup`
    * (group = assigned cluster). Each group is split into B sub-blocks
    * (deterministic id salt) and the B(B+1)/2 unordered block-pair
    * cells become separate equi-join cells: a hot group spreads over
    * bounded tasks instead of one quadratic task, and the tricky
    * exactly-once pair enumeration (cross-block cells fix sides,
    * same-block cells order by id) lives in ONE place. `e` must carry
    * (vec_id, group, q, qnorm) — the quantEmb layout.
    */
  private def blockedCosinePairs(s: SparkSession, e: DataFrame,
      group: String): DataFrame = {
    import s.implicits._
    val B = 8
    val blocked = e.withColumn("blk", pmod(col("vec_id"), lit(B)))
    val cells = (for (i <- 0 until B; j <- i until B) yield (i, j))
      .toDF("ba", "bb")
    val a = blocked.select(col("vec_id").as("ia"), col(group),
      col("q").as("qa"), col("qnorm").as("norm_a"), col("blk"))
    val b = blocked.select(col("vec_id").as("ib"),
      col(group).as(s"${group}_b"), col("q").as("qb"),
      col("qnorm").as("norm_b"), col("blk").as("blk_b"))
    a.join(broadcast(cells), col("blk") === col("ba"))
      // cross-block cells (ba < bb) see each unordered pair exactly
      // once with fixed sides; same-block cells order by id
      .join(b, col(group) === col(s"${group}_b") && col("blk_b") === col("bb") &&
        (col("ba") =!= col("bb") || col("ia") < col("ib")))
      .withColumn("cosine",
        round(expr("vector_dot_long(qa, qb)").cast("double") /
          (col("norm_a") * col("norm_b")), 4))
      .filter(col("cosine") >= 0.3)
      .select(col(group), least(col("ia"), col("ib")).as("va"),
        greatest(col("ia"), col("ib")).as("vb"), col("cosine"))
  }

  /** Random-hyperplane LSH bucket per vector: 8 deterministic
    * md5-derived planes → 8-bit bucket. Plane vectors are driver-built
    * literals broadcast to vector_dot — bucketing is one codegen pass
    * over the embeddings. Shared by `sim_lsh_bucket` (the bucket dump)
    * and `sim_lsh_topk` (candidate generation for the exact rerank).
    */
  private def lshBuckets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planes = (0 until 8).map { p =>
      (p, (0 until 64).map { dim =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p,$dim".getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        (Integer.parseInt(hex, 16) % 16 - 8).toLong
      })
    }.toDF("plane", "w")
    // integer-weight planes × quantized vectors: the side-of-plane
    // test is exact integer arithmetic, so bucket assignment can
    // never flip with accumulation order
    quantEmb(s, d)
      .crossJoin(broadcast(planes))
      .withColumn("dot", expr("vector_dot_long(q, w)"))
      .withColumn("bit", when(col("dot") > 0, expr("shiftleft(1, plane)")).otherwise(0))
      .groupBy(col("vec_id"))
      .agg(sum(col("bit")).as("bucket"))
  }

  /** The shared retrieval tail: exact cosine from the quantized
    * vectors (`qe`/`ne` + `qnorm`/`nnorm` on `scored`), rank per
    * query (cosine desc, nid asc — the engine-stable tie-break), cut
    * at k. ONE definition for the brute-force truth, the LSH and the
    * IVF paths, so a tie-break or rounding change can never make the
    * serving paths diverge from their recall oracle.
    */
  private[queries] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid").asc)
    scored
      .withColumn("cosine",
        round(expr("vector_dot_long(qe, ne)").cast("double") /
          (col("qnorm") * col("nnorm")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cosine"), col("rank"))
  }

  /** Brute-force cosine top-k for queries `vec_id < maxQid` — the
    * exact ground truth the ANN paths are audited against
    * (`sim_topk_bf`, and `sim_recall`'s truth set). Deliberately a
    * crossJoin: this is the oracle baseline, never a serving path.
    */
  private[queries] def bfTopK(s: SparkSession, d: String,
      maxQid: Int, k: Int): DataFrame = {
    val e = quantEmb(s, d)
    val q = e.filter(col("vec_id") < maxQid)
      .select(col("vec_id").as("qid"), col("q").as("qe"),
        col("qnorm"))
    val n = e.select(col("vec_id").as("nid"), col("q").as("ne"),
      col("qnorm").as("nnorm"))
    rankTopK(q.crossJoin(n).filter(col("qid") =!= col("nid")), k)
  }

  /** LSH-bucketed two-stage retrieval top-k: bucket candidate
    * generation, then exact cosine rerank of candidates only — the
    * pair join is keyed on the bucket, never query×corpus.
    */
  private[queries] def lshTopK(s: SparkSession, d: String,
      maxQid: Int, k: Int): DataFrame = {
    val e = quantEmb(s, d).join(lshBuckets(s, d), "vec_id")
    val q = e.filter(col("vec_id") < maxQid)
      .select(col("vec_id").as("qid"), col("q").as("qe"),
        col("qnorm"), col("bucket"))
    val n = e.select(col("vec_id").as("nid"), col("q").as("ne"),
      col("qnorm").as("nnorm"), col("bucket").as("nbucket"))
    rankTopK(q.join(n,
      col("bucket") === col("nbucket") && col("qid") =!= col("nid")), k)
  }

  /** Marker-token language-ID votes → per-doc argmax prediction —
    * shared by `tx_langid` (the predictions) and `tx_lang_confusion`
    * (the audit against the labeled language).
    */
  private def langidPredictions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val markers = Seq(
      ("en", "the"), ("en", "a"), ("en", "fast"),
      ("es", "value"), ("es", "data"),
      ("de", "join"), ("de", "merge"),
      ("fr", "stream"), ("fr", "batch"),
      ("zh", "spark"), ("zh", "vector")).toDF("m_lang", "marker")
    val votes = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
      .join(broadcast(markers), col("tok") === col("marker"))
      .groupBy(col("doc_id"), col("m_lang"))
      .agg(count(lit(1)).as("hits"))
    // argmax as a partial-aggregatable min_by instead of a rank-1
    // window (r17 opt round, guide §2.3): ordering struct
    // (−hits, m_lang) is the window's (hits desc, m_lang asc) and is
    // unique per (doc, lang), so the picked row is identical — minus
    // the Exchange+Sort over every vote row.
    votes.groupBy(col("doc_id"))
      .agg(min_by(struct(col("m_lang"), col("hits")),
        struct(negate(col("hits")), col("m_lang"))).as("best"))
      .select(col("doc_id"), col("best.m_lang").as("predicted_lang"),
        col("best.hits").as("hits"))
  }

  /** Scene-cut threshold in milli-luma units (`mm_scene_cuts`): the
    * synthetic videos' per-frame DC steps produce deltas well both
    * sides of it, so both classes are exercised at every SF. */
  private val SceneCutMilli = 5000L

  /** Per-frame decoded lumas of the synthetic MJPEG videos — the REAL
    * decode path (container build → box walk → in-house JPEG decode),
    * shared by `mm_mjpeg_frames` and `mm_scene_cuts`. */
  private[queries] def mjpegFrameLumas(s: SparkSession, d: String)
      : DataFrame = {
    import s.implicits._
    import graft.analytics.Multimodal
    Tables.documents(s, d)
      .select(col("doc_id")).filter(col("doc_id") < 100)
      .as[Long].flatMap { id =>
        val w = 9 + (id % 12).toInt
        val h = 9 + (id % 7).toInt
        val quantY = Array.fill(64)(8)
        def frame(f: Int): Array[Byte] =
          Multimodal.JpegBuilder.baselineGrey(w, h, quantY, (bx, by) => {
            val a = new Array[Int](64)
            a(0) = ((id * 7 + f * 11 + bx * 13 + by * 29) % 32).toInt - 16
            a
          })
        val mp4 = Multimodal.Mjpeg.container(w, h,
          timescale = 1000L, durationTicks = 4000L,
          frames = (0 until 4).map(frame))
        Multimodal.Mjpeg.frameFeatures(mp4).map { case (sampleNo, feat) =>
          (id, sampleNo - 1, feat.width, feat.height, feat.avgLumaMilli)
        }
      }
      .toDF("doc_id", "frame_no", "width", "height", "luma_milli")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: hash-groupBy; keeper = min doc_id per content hash.
    // At scale: one shuffle on the 128-bit digest, no data movement of
    // full texts (hash computed at the scan).
    "dd_exact_dedup" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
    }),

    // Cross-source overlap matrix: for every source pair, how many
    // DISTINCT 5-token shingles they share — the corpus-curation view
    // of cross-source contamination/syndication. JOIN-FREE: ONE
    // shuffle groups digests (collect_set(source) partial-aggregates
    // map-side, bounded by n_sources per digest), then the C(S,2)
    // pairs are exploded from each per-digest source set and counted.
    // The earlier self-join formulation computed the dominant
    // tokenize/explode/md5 map work TWICE (once per join branch) and
    // paid a second shuffle for the join; this shape pays the map work
    // once and its only wide exchange is the digest groupBy. Per-digest
    // fan-out is C(S,2), never corpus-sized, so it survives 100 TB.
    // The digest is xxhash64 (codegen'd native long hash), not an md5
    // hex string: at 100 TB the digest column IS the shuffle, 8 bytes
    // vs 32 is a 4× smaller exchange, and no per-shingle hex
    // allocation on the hot map path. The oracle joins on the raw
    // shingle STRING, so its counts are exact; the only approximation
    // anywhere is Spark-side 64-bit collisions (~n²/2⁶⁵, immaterial).
    "dd_source_overlap" -> ((s, d) => {
      // hash the 5-token tuple directly (xxhash64 is variadic) — the
      // shingle string never materializes; injective vs the joined
      // string because split-on-space tokens can't contain the
      // separator
      val digests = when(size(col("tk")) >= 5,
        transform(sequence(lit(1), size(col("tk")) - 4),
          i => xxhash64((0 until 5).map(j =>
            element_at(col("tk"), (i + j).cast("int"))): _*)))
        .otherwise(expr("cast(array() as array<bigint>)"))
      val sh = Tables.documentsParallel(s, d)
        .select(col("source"), split(col("text"), " ").as("tk"))
        .select(col("source"), explode(digests).as("dg"))
      val perDigest = sh.groupBy(col("dg"))
        .agg(array_sort(collect_set(col("source"))).as("ss"))
      perDigest
        .select(explode(flatten(transform(col("ss"), (a, i) =>
          transform(slice(col("ss"), i + lit(2), size(col("ss"))),
            b => struct(a.as("source_a"), b.as("source_b")))))).as("p"))
        .groupBy(col("p.source_a").as("source_a"),
          col("p.source_b").as("source_b"))
        .agg(count(lit(1)).as("n_shared"))
    }),

    // Span-level exact-substring dedup: find every 10-token window
    // whose text repeats in ANOTHER document, then merge overlapping
    // hits into maximal token spans per doc (gaps-and-islands). This
    // is the suffix-array substring-dedup of "Deduplicating Training
    // Data Makes Language Models Better" re-expressed relationally:
    // one shuffle groups 128-bit window hashes (cross-doc counts are
    // a partial agg), one keyed join marks hit positions, one
    // per-doc window pass merges spans. No doc×doc comparison exists
    // anywhere, so a 100 TB corpus costs O(tokens) map work plus two
    // hash shuffles — same asymptotics as exact doc dedup.
    "dd_span_dedup" -> ((s, d) => {
      val k = 10
      val wins = Tables.documentsParallel(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"),
          posexplode(Shingles.wordNgrams(col("tk"), k)).as(Seq("p0", "w")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
          // equality-only digest (never surfaces, the oracle hashes
          // its own windows): xxhash64 longs make the dup-group
          // shuffle key 8 bytes instead of a 32-char md5 string
          xxhash64(col("w")).as("h"))
        .cache() // read 2× (dup aggregate + hits join): without it the
                 // tokenize/posexplode/hash map work — the dominant
                 // cost — runs twice per execution
      val dup = wins.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
        .select(col("h"))
      val hits = wins.join(dup, "h").select(col("doc_id"), col("pos"))
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      hits
        // windows cover [pos, pos+k-1]; a hit starting within k tokens
        // of the previous hit overlaps-or-abuts it -> same span
        .withColumn("brk",
          when(col("pos") - lag(col("pos"), 1).over(byDoc) > k, 1)
            .otherwise(0))
        .withColumn("island", sum(col("brk")).over(byDoc))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("pos")).as("span_start"),
          (max(col("pos")) + k - 1).as("span_end"),
          count(lit(1)).as("n_windows"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          col("n_windows"))
    }),

    // MinHash + LSH near-dup candidates: 3-word shingles, hashed ONCE
    // (60-bit md5 prefix); the 8 minhash permutations are xors with
    // fixed 60-bit seed keys, folded in a single aggregate — no
    // per-seed row explosion, one md5 per shingle. 2 bands of 4 →
    // bucket join within (lang, band): O(n²) only inside buckets.
    "dd_minhash_lsh" -> ((s, d) => {
      // fixed (2, 4) banding needs exactly the first 8 seeds — the
      // shared table carries 24 for the largest data-scaled tier, and
      // aggregating the unused 16 would double this query's signature
      // cost for nothing
      val seedKeys = MinhashSeeds.keys.take(8)
      val docs = Tables.documents(s, d)
      val shingled = docs
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("lang"),
          explode(Shingles.wordNgrams(col("tk"), 3)).as("shingle"))
        .withColumn("h",
          conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long"))
      val mhCols = seedKeys.zipWithIndex.map { case (k, i) =>
        min(expr(s"h ^ ${k}L")).as(s"mh$i")
      }
      val minhashes = shingled
        .groupBy(col("doc_id"), col("lang"))
        .agg(mhCols.head, mhCols.tail: _*)
      val bands = minhashes.select(col("doc_id"), col("lang"),
          md5(concat(col("lang"), lit("|"),
            concat_ws(",", col("mh0"), col("mh1"), col("mh2"), col("mh3")))).as("bk0"),
          md5(concat(col("lang"), lit("|"),
            concat_ws(",", col("mh4"), col("mh5"), col("mh6"), col("mh7")))).as("bk1"))
        .select(col("doc_id"),
          explode(array(col("bk0"), col("bk1"))).as("band_key"))
        // 2 rows per doc; cached because BOTH sides of the band
        // self-join read it — uncached, the dominant shingle+signature
        // lineage executes twice
        .cache()
      // bounded candidate generation: drop (and log) band keys holding
      // more than BoundedBuckets.DefaultCap docs before the self-join —
      // no-op on healthy data, the 100 TB guard against one viral page
      // with millions of near-copies landing in a single band.
      val bounded = graft.operators.BoundedBuckets.cap(
        bands, Seq("band_key"), tag = "dd_minhash_lsh_bands")
      val a = bounded.select(col("doc_id").as("doc_a"), col("band_key"))
      val b = bounded.select(col("doc_id").as("doc_b"), col("band_key").as("band_key_b"))
      a.join(b, col("band_key") === col("band_key_b") && col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
    }),

    // SimHash document fingerprint: 16-bit signature from per-token
    // md5 bits, majority-voted per bit. Fully map-side + one agg.
    "dd_simhash" -> ((s, d) =>
      simhashSigs(s, d).select(col("doc_id"), col("sig").as("simhash"))),

    // SimHash near-dup pairs: hamming(sig_a, sig_b) <= 2, generated in
    // SIGNATURE space (see simhashNearDupPairs) — never a doc×doc join.
    "dd_simhash_pairs" -> ((s, d) => simhashNearDupPairs(s, d)),

    // Triangle census of the near-dup graph — the structural health
    // check of a dedup pass: a high global clustering coefficient
    // says near-dups arrive in dense clumps (one keeper drains many),
    // a low one says they are scattered chains (keeper election
    // removes little). See [[triangleCensus]] for the
    // degree-oriented enumeration.
    "dd_triangles" -> ((s, d) => {
      // the edge set feeds the orientation join and (oriented) three
      // wedge-join sides — materialize it once, eagerly, or the whole
      // signature pipeline re-executes per consumer. It is near-dup
      // pairs: tiny at any corpus scale, safe to pin.
      // lazy: the census action computes through it once and persists
      // the blocks for the wedge-join re-reads — the eager variant
      // paid a separate materialization job first (r17)
      val e = simhashNearDupPairs(s, d).select(col("doc_a"), col("doc_b"))
        .localCheckpoint(false)
      triangleCensus(e)
    }),

    // Keeper election → the post-dedup corpus: any doc with a smaller
    // near-dup neighbor (simhash hamming <= 2 in its language block)
    // is dropped; survivors are the training corpus. One anti-join
    // over the pair side — the "keep first occurrence" policy every
    // large-scale dedup ends with.
    "dd_keeper_corpus" -> ((s, d) => {
      val dropped = simhashNearDupPairs(s, d)
        .select(col("doc_b").as("doc_id")).distinct()
      Tables.documents(s, d)
        .join(dropped, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"))
    }),

    // Frame-sample offsets (multimodal): every 3rd frame boundary of
    // a fixed frame size over the payload length — pure arithmetic,
    // identical for a real container index.
    "mm_frame_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          octet_length(encode(col("text"), "UTF-8")).as("byte_len"))
        .filter(col("byte_len") > 0) // sequence(0,-1) throws on empty payloads
        .select(col("doc_id"),
          explode(expr("filter(sequence(0, byte_len - 1, 40), x -> (x div 40) % 3 = 0)"))
            .as("frame_offset"))
    }),

    // N-gram (word-bigram) Jaccard, exact at scale via prefix
    // filtering (AllPairs/PPJoin): under a global (rarity, hash)
    // bigram order, any pair with J >= t must share a bigram inside
    // each doc's prefix of length |d| - ceil(t*|d|) + 1 — the RARE
    // half at t=0.5. Candidates are generated only on prefix bigrams
    // (hot bigrams fall outside prefixes, so no dense-block pair
    // blowup), then verified exactly with array_intersect per
    // candidate pair. Output identical to the naive blocked self-join;
    // the candidate join input is bounded by rare-key fan-out.
    "dd_ngram_jaccard" -> ((s, d) => {
      val docs = Tables.documentsParallel(s, d)
        .withColumn("bucket", expr("n_chars div 10"))
      val bigrams = docs
        .select(col("doc_id"), col("lang"), col("bucket"),
          split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("lang"), col("bucket"),
          explode(array_distinct(Shingles.wordNgrams(col("tk"), 2))).as("bigram"))
      // hash bigrams to longs: the shuffle moves 8-byte keys and joins
      // compare longs (xxhash64 — codegen'd, no hex-string detour;
      // collisions negligible at any SF). Cached because THREE
      // consumers read it (both prefix branches of the candidate
      // self-join + the verify arrays) and the tokenize/explode/hash
      // map work dominates — same rationale as dd_span_dedup's cache.
      val hashed = bigrams.select(col("doc_id"), col("lang"), col("bucket"),
        xxhash64(col("bigram")).as("bh"))
        .cache()
      // Per-block document frequency → global order (df asc, bh asc);
      // prefix length for t=0.5: sz − ceil(sz/2) + 1. The df comes
      // from a partial-agg groupBy joined back on the bigram key (the
      // join reuses the aggregation's hash partitioning); the per-doc
      // ORDERING is then entirely MAP-SIDE — one collect_list of
      // (df, bh) structs per doc, sorted and sliced in the projection.
      // Compared to the window formulation this drops one full-data
      // shuffle (the rank window by doc_id AND the verify-array
      // groupBy collapse into the single per-doc aggregation) and
      // both data-sized sorts; documents are bounded, so the per-doc
      // array sort is O(doc len · log) in the map stage.
      val dfreq = hashed.groupBy(col("lang"), col("bucket"), col("bh"))
        .agg(count(lit(1)).as("df"))
      val perDoc = hashed.join(dfreq, Seq("lang", "bucket", "bh"))
        .groupBy(col("doc_id"), col("lang"), col("bucket"))
        .agg(sort_array(collect_list(struct(col("df"), col("bh")))).as("pairs"))
        .withColumn("sz", size(col("pairs")))
        // rarest-first prefix (PPJoin): two docs at Jaccard ≥ 0.5 must
        // share at least one prefix bigram — the pigeonhole bound
        .withColumn("prefix",
          expr("transform(slice(pairs, 1, sz - (sz + 1) div 2 + 1), p -> p.bh)"))
        // verify array, bh-sorted for the codegen'd array_intersect
        .withColumn("arr", sort_array(expr("transform(pairs, p -> p.bh)")))
        .drop("pairs")
        // read 4× below (both candidate sides + both verify sides)
        .cache()
      val pref = perDoc.select(col("doc_id"), col("lang"), col("bucket"),
        explode(col("prefix")).as("bh"))
      val cand = pref.select(col("doc_id").as("doc_a"), col("lang"),
          col("bucket"), col("bh"))
        .join(pref.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
            col("bucket").as("bucket_b"), col("bh").as("bh_b")),
          col("lang") === col("lang_b") && col("bucket") === col("bucket_b") &&
          col("bh") === col("bh_b") && col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      // exact verify per candidate: set intersection of the full
      // bigram arrays (bounded by doc length, no row explosion)
      cand
        .join(perDoc.select(col("doc_id").as("doc_a"), col("arr").as("arr_a")), "doc_a")
        .join(perDoc.select(col("doc_id").as("doc_b"), col("arr").as("arr_b")), "doc_b")
        .withColumn("n_inter", size(array_intersect(col("arr_a"), col("arr_b"))))
        .withColumn("jaccard", round(col("n_inter") /
          (size(col("arr_a")) + size(col("arr_b")) - col("n_inter")), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }),

    // Embedding-cosine near-dup: exact same-label all-pairs with the
    // codegen'd vector_dot, executed as a B×B block decomposition —
    // each label is split into B sub-blocks (deterministic id salt)
    // and the B(B+1)/2 unordered block-pair cells become separate
    // equi-join cells. Output is IDENTICAL to the naive label-blocked
    // self-join (an LSH candidate filter at threshold 0.3 would drop
    // true pairs), but a hot label is spread over 36 bounded tasks
    // whose build sides are |label|/B rows instead of one quadratic
    // task — the skew-salting shape for exact within-group pairing.
    // Cost: each row shuffles ~B/2 times; size B so (|label|/B)² rows
    // fit one task comfortably.
    "dd_embcos_neardup" -> ((s, d) => {
      blockedCosinePairs(s, quantEmb(s, d), "label")
        .select(col("va"), col("vb"), col("cosine"))
    }),

    // Brute-force cosine top-k (the ANN baseline): 20 query vectors
    // against the full set via vector_dot; rank on rounded cosine +
    // id tie-break so the cut is engine-stable.
    "sim_topk_bf" -> ((s, d) => bfTopK(s, d, maxQid = 20, k = 5)),

    // LSH-bucketed ANN (the scale path): 8 deterministic md5-derived
    // hyperplanes → 8-bit bucket per vector. Plane vectors are
    // driver-built literals broadcast to vector_dot — bucketing is
    // one codegen pass over the embeddings.
    "sim_lsh_bucket" -> ((s, d) => lshBuckets(s, d)),

    // Two-stage retrieval (the serving pattern): LSH bucket candidate
    // generation, then EXACT cosine rerank of candidates only. The
    // pair join is keyed on the bucket — never query×corpus — so the
    // rerank cost is (queries × bucket occupancy), not (queries × N);
    // the brute-force twin `sim_topk_bf` is this query's recall
    // oracle. Rank on rounded cosine + id tie-break (engine-stable).
    "sim_lsh_topk" -> ((s, d) => lshTopK(s, d, maxQid = 20, k = 3)),

    // Int8 vector quantization (the serving-layout compressor: 4×
    // smaller vectors, dot products in integer SIMD). Per vector:
    // scale = max |x|, q_i = floor(x_i / scale * 127). One map-side
    // pass, no shuffle at all. Floats are cast to double BEFORE any
    // arithmetic (both engines then run identical IEEE ops) and the
    // per-vector digest hashes the comma-joined ints, so the gate
    // compares the exact quantized payload without array-typed
    // columns.
    "sim_quantize" -> ((s, d) => {
      Tables.embeddings(s, d)
        .withColumn("de", transform(col("embedding"), x => x.cast("double")))
        .withColumn("scale", array_max(transform(col("de"), x => abs(x))))
        .withColumn("q", when(col("scale") > 0,
            transform(col("de"),
              x => floor(x / col("scale") * 127).cast("long")))
          .otherwise(transform(col("de"), _ => lit(0L))))
        .select(col("vec_id"),
          floor(col("scale") * 1000000).cast("long").as("scale_e6"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"),
          // guard q NULL (null embedding): concat_ws would fold it to
          // '' while DuckDB's array_to_string propagates NULL
          when(col("q").isNotNull, md5(concat_ws(",", col("q"))))
            .as("q_digest"))
    }),

    // Language-ID n-gram heuristic: marker-token voting with
    // deterministic argmax (count desc, lang asc).
    "tx_langid" -> ((s, d) => langidPredictions(s, d)),

    // Language-ID audit: confusion matrix of the heuristic's
    // prediction against the labeled language — the query that makes
    // tx_langid load-bearing (its precision is measured, not assumed);
    // docs hitting no marker read as 'unknown' instead of vanishing.
    // Broadcast marker join + two keyed aggs; output is bounded by
    // langs², never corpus size.
    "tx_lang_confusion" -> ((s, d) => {
      Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .join(langidPredictions(s, d), Seq("doc_id"), "left")
        .groupBy(col("lang"),
          coalesce(col("predicted_lang"), lit("unknown")).as("predicted"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Quality scoring: length/stopword/token-shape signals folded to
    // a bounded score and band. Outputs are floor-scaled integers —
    // the inputs are small rationals that land exactly on decimal
    // rounding boundaries, where Spark's and DuckDB's half-rounding
    // disagree; truncation of identical doubles is engine-stable.
    "tx_quality" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("n_tokens", size(toks))
        .withColumn("n_stop",
          size(filter(toks, t => array_contains(stopwords, t))))
        .withColumn("stop_ratio_raw", col("n_stop") / col("n_tokens"))
        .withColumn("avg_len_raw",
          (col("n_chars") - (col("n_tokens") - 1)) / col("n_tokens"))
        .withColumn("score_raw",
          qualityScoreRaw(col("n_tokens"), col("n_stop"), col("n_chars")))
        .withColumn("band",
          when(col("score_raw") >= 0.7, "high")
            .when(col("score_raw") >= 0.5, "medium").otherwise("low"))
        .select(col("doc_id"), col("n_tokens"),
          floor(col("stop_ratio_raw") * 10000).cast("long").as("stopword_bp"),
          floor(col("avg_len_raw") * 100).cast("long").as("avg_token_len_c"),
          floor(col("score_raw") * 10000).cast("long").as("score_bp"),
          col("band"))
    }),

    // Repetition filter (the Gopher-style duplicate-n-gram rule):
    // docs whose bigrams repeat heavily are boilerplate/spam. Outputs
    // are exact integers — a duplicate ratio of small ints would land
    // on rounding boundaries; the integer compare n_distinct*2 <
    // n_bigrams IS the >50%-duplicates verdict without a float.
    "tx_repetition" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), Shingles.wordNgrams(col("tk"), 2).as("bigrams"))
        .select(col("doc_id"),
          size(col("bigrams")).cast("long").as("n_bigrams"),
          size(array_distinct(col("bigrams"))).cast("long").as("n_distinct"))
        .withColumn("repetitive", col("n_distinct") * 2 < col("n_bigrams"))
    }),

    // Domain-mixing weights: the per-source up/down-sampling factor
    // that rebalances the corpus to a UNIFORM token share (the "data
    // mixing" step before training). weight = target_share /
    // actual_share = total_tokens / (n_sources · source_tokens), in
    // basis points via pure integer div. Totals arrive through a
    // broadcast single-row cross join — no driver collect.
    "dd_mixture_weights" -> ((s, d) => {
      val perSrc = Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      val tot = perSrc.agg(sum(col("n_tokens")).as("total_tokens"),
        count(lit(1)).as("n_sources"))
      perSrc.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("total_tokens * 10000 div (n_sources * n_tokens)")
            .as("weight_bp"))
    }),

    // Cumulative token share per language: sources ranked by token
    // count with a running share in basis points — the "how much of
    // my German data comes from the top k sources" curve. One window
    // cumsum per language partition; ties broken by source name so
    // the running sum is deterministic. Integer arithmetic only.
    "tx_token_share" -> ((s, d) => {
      val perSrc = Tables.documents(s, d)
        .select(col("lang"), col("source"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("toks")).as("n_tokens"))
      val byLang = Window.partitionBy(col("lang"))
      val cum = Window.partitionBy(col("lang"))
        .orderBy(col("n_tokens").desc, col("source").asc)
      perSrc
        .withColumn("lang_total", sum(col("n_tokens")).over(byLang))
        .withColumn("rk", row_number().over(cum))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(cum))
        .select(col("lang"), col("rk"), col("source"), col("n_tokens"),
          expr("cum_tokens * 10000 div lang_total").as("cum_share_bp"))
    }),

    // Sequence packing — the "concatenate all documents in corpus
    // order, split into fixed W-token context windows" step that turns
    // a cleaned corpus into pretraining examples. Per doc: its global
    // token offset and the window span it lands in. The global offset
    // is a prefix sum, and a bare `sum() OVER (ORDER BY doc_id)` is a
    // SINGLE-partition window — the one shape guaranteed to die at
    // 100 TB — so this computes it distributed in two phases: (1)
    // deterministic range buckets (doc_id against the broadcast max —
    // no sampled RangePartitioner, so bucket ids are stable across
    // engines and runs), per-bucket token subtotals (tiny: P rows),
    // exclusive-prefix them (P-row window, trivially single-partition)
    // and broadcast; (2) a per-bucket running sum, partitioned P ways.
    // Every big-side operation is partitioned; only the P-row offset
    // table is not.
    "tx_pack" -> ((s, d) => packSpans(s, d)),

    // Length-bucketed batching — the OTHER sequence-batching strategy
    // next to tx_pack's concatenation: pad every document in a batch
    // of B=32 to the batch max. Compares the padding bill of
    // length-SORTED batching against hash-ordered (random) batching —
    // the quantified reason trainers sort by length. Ranks are exact
    // but NEVER a global single-partition window: the same two-phase
    // trick as tx_pack — group counts per key value, an exclusive
    // prefix over the (tiny, value-bounded) per-key count table,
    // broadcast back, plus a per-key partitioned local rank. Output:
    // per strategy, batches, token totals, padding permille.
    "tx_pad_buckets" -> ((s, d) => {
      val B = 32
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
        .withColumn("hkey", md5(col("doc_id").cast("string")))
        .localCheckpoint(true) // read by both strategies
      // exact two-phase global rank (per-bucket local rank + tiny
      // offset table) — the extracted operator; bucket values here are
      // distinct lengths / 16 hash prefixes, trivially tiny
      def ranked(bucketOf: org.apache.spark.sql.Column,
          orderCols: Seq[org.apache.spark.sql.Column]): DataFrame =
        graft.operators.BucketedRank.withRank(
          docs.withColumn("bk", bucketOf), col("bk"), orderCols, "rank")
      def padding(r: DataFrame, strategy: String): DataFrame = r
        .withColumn("batch", expr(s"(rank - 1) div $B"))
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("bsz"), max(col("n_toks")).as("bmax"),
          sum(col("n_toks")).as("btoks"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("btoks")).as("total_tokens"),
          sum(col("bsz") * col("bmax") - col("btoks")).as("total_padding"))
        .select(lit(strategy).as("strategy"), col("n_batches"),
          col("total_tokens"), col("total_padding"),
          expr("total_padding * 1000 div (total_tokens + total_padding)")
            .as("padding_permille"))
      // sorted: batches group equal-ish lengths (bucket key = the
      // length itself); hashed: arrival-order stand-in (bucket key =
      // first hex nibble of the doc hash, rank by hash within)
      padding(ranked(col("n_toks"), Seq(col("n_toks"), col("doc_id"))),
          "sorted")
        .unionAll(padding(ranked(substring(col("hkey"), 1, 1),
          Seq(col("hkey"), col("doc_id"))), "hashed"))
    }),

    // The window-side view of the same packing: per context window,
    // how many docs contribute, the token fill (= W except the tail
    // window — the invariant that proves the split is airtight), and
    // how many of its docs spill across a boundary (the
    // attention-masking question: what fraction of windows need a
    // document-boundary reset). Derived from tx_pack's per-doc spans
    // by exploding each doc to the ≤(n_toks/W)+1 windows it overlaps —
    // fan-out bounded by doc length, never data size — then one
    // partial-agg groupBy on window id.
    "tx_pack_windows" -> ((s, d) => {
      val W = 512L
      packSpans(s, d)
        .withColumn("win",
          explode(sequence(col("win_first"), col("win_last"))))
        .groupBy(col("win"))
        .agg(count(lit(1)).as("n_docs"),
          sum(least(col("start_tok") + col("n_toks"), (col("win") + 1) * W) -
              greatest(col("start_tok"), col("win") * W)).as("n_tokens"),
          sum(when(col("win_first") < col("win") ||
                   col("win_last") > col("win"), 1L).otherwise(0L))
            .as("n_spanning"))
    }),

    // BM25 keyword retrieval (Robertson/Sparck Jones, k1=1.2 b=0.75) —
    // the lexical-search twin of the embedding ANN paths: score every
    // document holding any of a fixed query-term set. The classic
    // inverted-index shape in DataFrame form: explode→filter keeps
    // only query-term postings (the "inverted list"), tf/df are two
    // partial-agg groupBys, and corpus stats + the 3-row df table
    // broadcast. Determinism across engines: the ONLY float op is the
    // idf ln, snapped to integer micro-units immediately (per-corpus
    // it takes |terms| distinct values, never near a floor boundary);
    // the k1/b arithmetic is then EXACT integer division — with
    // k1=6/5, b=3/4: score = idf_u6·tf·(k1+1)/(tf + k1(1-b+b·dl/avgdl))
    // = idf_u6·tf·22·S div (10·tf·S + 3·S + 9·dl·N) where S=Σdl,
    // N=#docs — a last-ulp libm difference between engines can't
    // reorder results the way a float pipeline can (the first cut of
    // this query disagreed with DuckDB by ±1 micro-unit on 10% of
    // docs). Bounds: idf_u6 < 2^24, tf·22 < 2^11, S < 2^24 at sf0.1 —
    // product < 2^59; at larger corpora drop a common factor of S.
    "tx_bm25" -> ((s, d) => {
      val terms = Seq("spark", "table", "merge")
      val tk = Tables.documentsParallel(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
      val dl = tk.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val tf = tk.select(col("doc_id"), explode(col("tk")).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
        .join(dl, Seq("doc_id"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfreq), Seq("tok"))
        .crossJoin(broadcast(stats))
        .withColumn("idf_u6", expr(
          "cast(floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)" +
          " * 1000000.0) as bigint)"))
        .withColumn("term_u6", expr(
          "idf_u6 * tf * 22 * sum_dl div" +
          " (10 * tf * sum_dl + 3 * sum_dl + 9 * dl * n_docs)"))
        .groupBy(col("doc_id"))
        .agg(sum(col("term_u6")).as("score_u6"),
          count(lit(1)).as("n_terms"))
    }),

    // The END-TO-END corpus-to-training-examples pipeline — the
    // composition a real pretraining data build runs as ONE lineage:
    // (1) admission gate (shared gateVerdicts: length / repetition /
    // bag-dup / quality — keep only 'pass'); (2) decontamination
    // (drop any doc sharing a 3-gram with the held-out eval set,
    // doc_id < 5 — the same broadcast-semi-join shape as
    // tx_decontaminate, plus the eval docs themselves); (3) sequence-
    // pack the survivors into 512-token context windows (the
    // distributed prefix sum of tx_pack, re-run over the FILTERED id
    // space). Everything before the pack is map-side or
    // broadcast-joined — the corpus is never shuffled until it is
    // small enough to pack — and each stage reuses the standalone
    // query's exact definition, so the composed output can't drift
    // from the parts the gate/decon/pack oracles already pin.
    "pipe_corpus_windows" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pass = gateVerdicts(s, d)
        .filter(col("verdict") === "pass").select(col("doc_id"))
      def shingles3(df: DataFrame) = df
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"),
          explode(Shingles.wordNgrams(col("tk"), 3)).as("sh"))
      val bench = shingles3(docs.filter(col("doc_id") < 5))
        .select(col("sh")).distinct()
      val contaminated = shingles3(
          Tables.documentsParallel(s, d).filter(col("doc_id") >= 5))
        .join(broadcast(bench), Seq("sh"))
        .select(col("doc_id")).distinct()
      val kept = docs.filter(col("doc_id") >= 5)
        .join(pass, Seq("doc_id"), "left_semi")
        .join(contaminated, Seq("doc_id"), "left_anti")
      packSpansOf(kept.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks")))
    }),

    // MinHash estimator quality: for every LSH candidate pair, the
    // signature-estimated Jaccard (matching minhashes / 8) against
    // the exact shingle-set Jaccard — the evaluation that tells you
    // whether 8 permutations suffice before you trust the estimate
    // at scale. Exact side touches only candidate pairs (the LSH
    // bound); both outputs are integer basis points.
    "dd_minhash_est" -> ((s, d) => {
      // documentsParallel measured and REJECTED (r18 pair: 0.64→0.98
      // s) — the simhashSigs lesson again: the 32-partition layout
      // propagates through BOTH caches into ~8 downstream band/join
      // stages whose per-stage data is tiny
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("lang"),
          explode(Shingles.wordNgrams(col("tk"), 3)).as("shingle"))
        .select(col("doc_id"), col("lang"),
          conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h"))
        .distinct()
        .cache()
      // first 8 seeds only: this estimator is DEFINED over the fixed
      // (2, 4) scheme's 8 permutations, and `minhashes` is cached —
      // aggregating the 16 unused seeds would materialize 24 columns
      // in the cache for an 8-column consumer
      val mhCols = MinhashSeeds.keys.take(8).zipWithIndex.map { case (k, i) =>
        min(expr(s"h ^ ${k}L")).as(s"mh$i")
      }
      // one row per doc (8 longs): cached because THREE consumers read
      // it (the band build + both sides of the estimator join) and
      // each would otherwise re-run the signature aggregation over the
      // full shingle set
      val minhashes = sh.groupBy(col("doc_id"), col("lang"))
        .agg(mhCols.head, mhCols.tail: _*)
        .cache()
      val bands = minhashes.select(col("doc_id"),
          md5(concat(col("lang"), lit("|"),
            concat_ws(",", col("mh0"), col("mh1"), col("mh2"), col("mh3")))).as("bk0"),
          md5(concat(col("lang"), lit("|"),
            concat_ws(",", col("mh4"), col("mh5"), col("mh6"), col("mh7")))).as("bk1"))
        .select(col("doc_id"), explode(array(col("bk0"), col("bk1"))).as("band_key"))
      // bounded candidate generation (see BoundedBuckets): cheap here —
      // bands project off the cached minhashes, so the hot-key count
      // pass never re-runs the shingle aggregation.
      val bBands = graft.operators.BoundedBuckets.cap(
        bands, Seq("band_key"), tag = "dd_minhash_est_bands")
      val cands = bBands.as("a").join(bBands.as("b"),
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val mhA = minhashes.select(
        col("doc_id").as("doc_a") +: (0 until 8).map(i => col(s"mh$i").as(s"a$i")): _*)
      val mhB = minhashes.select(
        col("doc_id").as("doc_b") +: (0 until 8).map(i => col(s"mh$i").as(s"b$i")): _*)
      val est = cands.join(mhA, Seq("doc_a")).join(mhB, Seq("doc_b"))
        .withColumn("n_match",
          (0 until 8).map(i =>
            when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L)).reduce(_ + _))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      est
        .join(sh.select(col("doc_id").as("doc_a"), col("h")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("h").as("hb")), Seq("doc_b"))
        .filter(col("h") === col("hb"))
        .groupBy(col("doc_a"), col("doc_b"), col("n_match"))
        .agg(count(lit(1)).as("n_inter"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("n_match * 10000 div 8").as("est_bp"),
          expr("n_inter * 10000 div (sz_a + sz_b - n_inter)").as("exact_bp"))
    }),

    // Top-n-gram concentration (the other half of the Gopher
    // repetition rules): the share of tokens covered by the single
    // most frequent 2-gram / 3-gram, in basis points. Occurrences
    // may overlap, so the share can exceed 10000 for degenerate docs
    // — that IS the spam signal. All arithmetic is 64-bit integer
    // (count · n · 10000 div n_tokens): no float anywhere, so the
    // engines cannot disagree. Two keyed aggregations per n, joined
    // back on doc_id; everything before the agg is map-side explode.
    "tx_ngram_repetition" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .withColumn("n_tokens", size(col("tk")).cast("long"))
      def topN(n: Int) = base
        .select(col("doc_id").as(s"id_$n"),
          explode(Shingles.wordNgrams(col("tk"), n)).as("g"))
        .groupBy(col(s"id_$n"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col(s"id_$n")).agg(max(col("c")).as(s"top${n}_cnt"))
      base.select(col("doc_id"), col("n_tokens"))
        .join(topN(2), col("doc_id") === col("id_2"), "left")
        .join(topN(3), col("doc_id") === col("id_3"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("top2_cnt"), lit(0L)).as("top2_cnt"),
          coalesce(col("top3_cnt"), lit(0L)).as("top3_cnt"))
        .withColumn("top2_bp", expr("top2_cnt * 2 * 10000 div n_tokens"))
        .withColumn("top3_bp", expr("top3_cnt * 3 * 10000 div n_tokens"))
    }),

    // TF-IDF keyword extraction: top-3 tokens per doc by tf·ln(N/df).
    // Two keyed aggregations (term counts, then doc frequency), one
    // vocabulary join, one per-doc window — no N-scan of texts beyond
    // the tokenize. N arrives via a broadcast single-row cross join,
    // never a driver-side collect. Ranking compares the FLOORED
    // integer score (then token) so rank order can't hinge on a
    // last-ulp ln() difference between engines; ln itself is the one
    // non-IEEE-pinned op here, but a floor(·1e4) collision would need
    // the product within 1 ulp of an integer boundary.
    "tx_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tf = Tables.documentsParallel(s, d)
        .select(col("doc_id"), explode(toks).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, "tok").crossJoin(broadcast(n))
        .withColumn("score_e4",
          floor(col("tf") * log(col("n_docs") / col("df")) * 10000)
            .cast("long"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_e4").desc, col("tok").asc)
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("tok"), col("tf"), col("df"),
          col("score_e4"))
    }),

    // Composed corpus gate: the single-pass pass/fail verdict a
    // training pipeline applies before tokenization, folding the
    // individual filters (length floor, Gopher repetition rule,
    // order-insensitive near-dup, quality score) into one prioritized
    // reject reason per doc. The dup rule hashes the SORTED DISTINCT
    // token set, so shuffled copies collapse to one bag hash; the
    // keeper is elected with a window over that hash — one shuffle,
    // everything else map-side. Thresholds compare integers or
    // identical doubles (floor-scaled), never rounded rationals.
    "tx_corpus_gate" -> ((s, d) => gateVerdicts(s, d)),

    // BPE-style pre-tokenization (RE2-safe class regex — word / number
    // / punctuation runs), the unit-count a tokenizer-budget pipeline
    // needs before actual BPE merges.
    "tx_bpe_pretokenize" -> ((s, d) => {
      val re = "[a-z]+|[0-9]+|[^a-z0-9 ]+"
      Tables.documents(s, d)
        .select(col("source"),
          size(expr(s"regexp_extract_all(text, '$re', 0)")).as("n_pre"),
          size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_num"))
        .groupBy(col("source"))
        .agg(sum(col("n_pre")).as("pre_tokens"),
          sum(col("n_num")).as("num_tokens"))
    }),

    // Token counting: whitespace tokens vs regex word tokens vs
    // distinct vocabulary, per source.
    "tx_token_count" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"), col("text"),
          size(toks).as("ws_tokens"),
          size(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("word_tokens"))
        .withColumn("tok", explode(toks))
        .groupBy(col("source"))
        .agg(sum(col("ws_tokens")).as("chk_ws"),
             count(lit(1)).as("total_tokens"),
             countDistinct(col("tok")).as("distinct_tokens"))
        .select(col("source"), col("total_tokens"), col("distinct_tokens"))
    }),

    // Document fingerprint: normalized-content digest + 60-bit prefix
    // as a compact join key.
    "tx_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        .select(col("doc_id"), md5(col("norm")).as("fingerprint"),
          conv(substring(md5(col("norm")), 1, 15), 16, 10).cast("long").as("fp_int"))
    }),

    // Deterministic train/val/test split (80/10/10): bucket on a
    // content-free stable key hash so the assignment is reproducible
    // across runs, engines and reshards. Pure map-side — at 100 TB
    // this is a zero-shuffle projection the writer partitions by.
    "dd_train_split" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("bucket",
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 10)
        .select(col("doc_id"),
          when(col("bucket") < 8, "train")
            .when(col("bucket") === 8, "validation")
            .otherwise("test").as("split"))
    }),

    // PII scrub: email addresses (case-insensitive, full RFC-common
    // charset) then long digit runs replaced by placeholder tags,
    // with per-doc match counts. All codegen'd regexp — one map-side
    // pass at any scale. The fixture text contains no emails/digits,
    // so the query APPENDS a deterministic dirty suffix per doc —
    // otherwise the correctness gate would compare identity
    // transforms and never exercise the scrubbing.
    "tx_pii_scrub" -> ((s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
      val numRe = "[0-9][0-9][0-9]+"
      Tables.documents(s, d)
        // concat, not concat_ws: the oracle's || chain propagates a
        // NULL text/source to a NULL dirty string, and the engines
        // must agree on that path even though fixtures have no nulls
        .withColumn("dirty", concat(col("text"),
          lit(" Contact_"), col("source"), lit("."),
          col("doc_id").cast("string"), lit("@Example-"),
          col("source"), lit(".com ref"),
          (col("doc_id") * 12345).cast("string")))
        .withColumn("no_mail", regexp_replace(col("dirty"), emailRe, "<EMAIL>"))
        .withColumn("scrubbed", regexp_replace(col("no_mail"), numRe, "<NUM>"))
        .select(col("doc_id"),
          md5(col("scrubbed")).as("scrub_digest"),
          size(expr(s"regexp_extract_all(dirty, '$emailRe', 0)")).cast("long")
            .as("n_emails"),
          size(expr(s"regexp_extract_all(no_mail, '$numRe', 0)")).cast("long")
            .as("n_digit_runs"))
    }),

    // Benchmark decontamination: a corpus doc is contaminated when it
    // shares a word trigram with the benchmark set (doc_id < 5 stands
    // in for an eval suite). The benchmark shingle set is tiny at any
    // corpus scale → broadcast; one map-side-joined pass over the
    // corpus shingles, no corpus×corpus join anywhere.
    "tx_decontaminate" -> ((s, d) => {
      // no distinct on the corpus side: that would shuffle every
      // corpus shingle before the broadcast join, and the final
      // countDistinct dedups anyway — the corpus stays map-side
      def shingles(df: DataFrame) = df
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), explode(Shingles.wordNgrams(col("tk"), 3)).as("sh"))
      val docs = Tables.documents(s, d)
      val bench = shingles(docs.filter(col("doc_id") < 5))
        .select(col("sh")).distinct()
      shingles(Tables.documentsParallel(s, d))
        .join(broadcast(bench), Seq("sh"))
        .filter(col("doc_id") >= 5)
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("sh")).as("n_shared"))
    }),

    // The same decontamination at the 100 TB shape: when the eval
    // suite's exact shingle set is too big to broadcast-join against
    // every corpus shingle, ship a BLOOM FILTER of it instead (~10
    // bits/element, built by one tiny job with Spark's native
    // bloom_filter_agg) and prefilter the corpus scan map-side with
    // the codegen'd might_contain — only the ~FP-rate survivors reach
    // the exact join, which then needs to move almost nothing. False
    // positives are killed by that exact verify, so the result is
    // bit-identical to tx_decontaminate (same oracle SQL).
    "tx_decontaminate_bloom" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      def shingles(df: DataFrame) = df
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), explode(Shingles.wordNgrams(col("tk"), 3)).as("sh"))
      val docs = Tables.documents(s, d)
      val bench = shingles(docs.filter(col("doc_id") < 5))
        .select(col("sh")).distinct()
      // phase 1 (control-plane sized): aggregate the bench shingles
      // into one serialized bloom filter on the driver
      val bloomBytes = bench.select(ColumnBridge.column(
          new BloomFilterAggregate(
            ColumnBridge.expression(xxhash64(col("sh"))))
            .toAggregateExpression()).as("bf"))
        .head().getAs[Array[Byte]](0)
      // phase 2: one corpus pass; might_contain evaluates inside the
      // scan's codegen span against the broadcast-as-literal filter
      val survivors = shingles(Tables.documentsParallel(s, d))
        .filter(col("doc_id") >= 5)
        .filter(ColumnBridge.column(BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.Literal
            .create(bloomBytes, org.apache.spark.sql.types.BinaryType),
          ColumnBridge.expression(xxhash64(col("sh"))))))
      survivors
        .join(bench, Seq("sh")) // exact verify: bloom FPs die here
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("sh")).as("n_shared"))
    }),

    // Vocabulary head: top-10 tokens per language by frequency with a
    // deterministic tie-break — the corpus statistic a tokenizer
    // training run starts from. Partial agg map-side; rank<=10 pushes
    // down as a WindowGroupLimit before the exchange.
    "tx_vocab_topk" -> ((s, d) => {
      // documentsParallel measured and REJECTED here (r18 pair:
      // 0.23→0.38 s): plain split+explode+count is too light to repay
      // the exchange — the floor only wins where the map side hashes
      // or builds shingle strings (see tx_decontaminate/tx_tfidf)
      val counts = Tables.documents(s, d)
        .select(col("lang"), explode(toks).as("tok"))
        .groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("tok").asc)
      counts.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("lang"), col("tok"), col("n"), col("rank"))
    }),

    // Stratified deterministic sample: ~10% per language from the md5
    // key-hash — reproducible without RNG state, pure map-side, and
    // the per-language rate holds under reshuffling/resharding. The
    // sampling primitive every ablation / data-mix pipeline needs.
    "dd_stratified_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(conv(substring(md5(concat(col("lang"), lit("|"),
          col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10 === 0)
        .select(col("doc_id"), col("lang"))
    }),

    // Weighted sample WITHOUT replacement, k distinct docs with
    // probability proportional to length — the third sampling
    // primitive next to stratified (uniform per stratum) and
    // importance resampling (multiplicities): build the training-mix
    // subset where long documents deserve proportionally more slots
    // but each doc appears ONCE. Entirely integer and deterministic:
    // the Efraimidis–Spirakis key u^(1/w) is equal in distribution to
    // the MAX of w iid uniforms, so priority = max over the doc's w
    // unit copies of the 60-bit copy hash — no pow/ln, bit-identical
    // in both engines. Weights are token-count div 16 + 1 (bounded
    // explode); the top-k cut is the exact two-phase rank.
    "dd_weighted_sample" -> ((s, d) => {
      val K = 32
      val pri = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("size(split(text, ' ')) div 16 + 1").cast("long").as("w"))
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(0L), col("w") - 1)).as("i"))
        .select(col("doc_id"), col("w"), expr(
          "cast(conv(substring(md5(concat(cast(doc_id as string), ':'," +
          " cast(i as string))),1,15),16,10) as bigint)").as("h"))
        .groupBy(col("doc_id"))
        .agg(max(col("w")).as("w"), max(col("h")).as("priority"))
      val n = graft.operators.TwoPhaseTopK.shards(pri)
      val ord = Seq(col("priority").desc, col("doc_id").asc)
      val w1 = Window.partitionBy(col("shard")).orderBy(ord: _*)
      val w2 = Window.orderBy(ord: _*) // ≤ shards·K rows
      pri.withColumn("shard",
          graft.operators.TwoPhaseTopK.shardCol(col("doc_id"), n))
        .withColumn("r1", row_number().over(w1)).filter(col("r1") <= K)
        .withColumn("r2", row_number().over(w2)).filter(col("r2") <= K)
        .select(col("doc_id"), col("w"), col("priority"),
          col("r2").as("rank"))
    }),

    // The IMPERATIVE form of the same weighted sample: one
    // es_topk(doc_id, w) pass whose ≤ k-entry buffer computes the
    // identical max-of-w-copy-hashes identity WITHOUT the O(Σw)
    // explode — no unit-copy rows materialize, nothing wider than
    // the k-entry partial buffers crosses an exchange. Same oracle
    // SQL as dd_weighted_sample: a hash match proves the two forms
    // element-equal (also pinned under forced partition orders in
    // EsTopKAggSpec).
    "dd_weighted_sample_agg" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("size(split(text, ' ')) div 16 + 1").cast("long").as("w"))
        .agg(expr("es_topk(doc_id, w)").as("sk"))
        .select(expr("inline(sk)"))
        .withColumn("rank", row_number().over( // ≤ k rows by construction
          Window.orderBy(col("priority").desc, col("k").asc)))
        .select(col("k").as("doc_id"), col("w"), col("priority"),
          col("rank"))
    }),

    // Train/val/test leakage audit: near-dup content (same sorted
    // DISTINCT token set — shuffled copies collapse to one bag hash,
    // the tx_corpus_gate dup key) that lands in more than one split of
    // the deterministic dd_train_split assignment — the eval-integrity
    // check every pipeline runs after splitting (a val doc whose
    // shuffled twin is in train invalidates the benchmark). Split
    // membership is map-side (the same md5-bucket arithmetic as
    // dd_train_split); one shuffle on the bag hash.
    "dd_split_leakage" -> ((s, d) => {
      val assigned = Tables.documents(s, d)
        .withColumn("bucket",
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 10)
        .select(col("doc_id"),
          md5(concat_ws(" ",
            array_sort(array_distinct(split(col("text"), " ")))))
            .as("content_hash"),
          when(col("bucket") < 8, "train")
            .when(col("bucket") === 8, "validation")
            .otherwise("test").as("split"))
      assigned.groupBy(col("content_hash"))
        .agg(countDistinct(col("split")).as("n_splits"),
          concat_ws(",", sort_array(collect_set(col("split")))).as("splits"),
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("keeper"))
        .filter(col("n_splits") > 1)
    }),

    // Unigram log-prob quality proxy (the "perplexity filter" without
    // a neural LM): corpus unigram distribution → per-doc mean
    // negative log-likelihood in micro-nats. The ONLY float op is one
    // ln per DISTINCT vocab entry, floored to an integer immediately;
    // per-doc totals are integer sums (tf · nll_e6), so accumulation
    // order cannot perturb the result in either engine. Two keyed
    // aggs (term counts, vocab counts) + a broadcast single-row
    // total; the doc side joins nothing bigger than the vocabulary.
    "tx_unigram_logprob" -> ((s, d) => {
      // documentsParallel measured and REJECTED here (r18 pair:
      // 0.40→0.43 s — light map work, multi-consumer tf)
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val vocab = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
      val tot = vocab.agg(sum(col("cnt")).as("total"))
      val nll = vocab.crossJoin(broadcast(tot))
        .select(col("tok"),
          floor((log(col("total")) - log(col("cnt"))) * 1000000)
            .cast("long").as("nll_e6"))
      tf.join(nll, "tok")
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tokens"),
          expr("sum(tf * nll_e6) div sum(tf)").as("avg_nll_e6"))
    }),

    // Pointwise mutual information over doc-level co-occurrence — the
    // collocation/statistical-NLP primitive ("which token pairs occur
    // together far more than chance"). The naive all-token pair
    // explosion is quadratic per document; the scale-safe form
    // restricts pairs to a broadcast top-V vocabulary (V=50 by doc
    // frequency, ties by token), so per-doc fan-out is bounded by V
    // regardless of corpus or document size. PMI = ln(n_ab·D) −
    // ln(n_a·n_b): two ln's of exact integers, micro-nat-quantized —
    // the established cross-engine determinism contract. Support
    // floor n_ab ≥ 5 keeps the output statistical, not anecdotal.
    "tx_pmi_pairs" -> ((s, d) => {
      val dtok = Tables.documentsParallel(s, d)
        .select(col("doc_id"), explode(array_distinct(toks)).as("tok"))
      val dfreq = dtok.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val vocab = dfreq.orderBy(col("n").desc, col("tok").asc).limit(50)
      val ft = dtok.join(broadcast(vocab.select(col("tok"))), Seq("tok"))
      val dTotal = Tables.documents(s, d).agg(count(lit(1)).as("d_total"))
      val pairs = ft.as("a").join(ft.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
        .groupBy(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 5)
      pairs
        .join(broadcast(vocab.select(col("tok").as("tok_a"),
          col("n").as("n_a"))), Seq("tok_a"))
        .join(broadcast(vocab.select(col("tok").as("tok_b"),
          col("n").as("n_b"))), Seq("tok_b"))
        .crossJoin(broadcast(dTotal))
        .select(col("tok_a"), col("tok_b"), col("n_ab"),
          floor((log(col("n_ab") * col("d_total")) -
                 log(col("n_a") * col("n_b"))) * 1000000)
            .cast("long").as("pmi_u6"))
    }),

    // Distributed BPE merge TRAINING (Sennrich-style byte-pair
    // encoding — the tokenizer-learning step, not just
    // pre-tokenization): start from characters, then per round count
    // adjacent symbol pairs across the whole corpus (frequency-
    // weighted), pick the most frequent pair (count desc, then
    // lexicographic — deterministic in both engines, UTF-8 byte order
    // == codepoint order), and merge it everywhere. Merge application
    // is literal string replace on the space-delimited symbol
    // sequence bounded by sentinel spaces — left-to-right
    // non-overlapping replacement, RE-APPLIED to a fixpoint
    // (bpeMergePasses nested passes) so runs of the merged pair fully
    // collapse: 'a a a a' → 'aa aa', matching greedy BPE's token
    // count (a single pass would under-merge to [aa, a, a] because
    // each replacement consumes the shared sentinel space). Odd runs
    // settle as [aa, a, aa] where a strict pairwise scan gives
    // [aa, aa, a] — same token count, deterministic, and applied
    // IDENTICALLY by the mirrored oracle's nested replace() calls.
    //
    // Scale shape (the kmeans pattern): the corpus collapses to the
    // bounded word-frequency table once (Heaps' law — vocabulary
    // grows sublinearly, so this is the 100 TB reduction step); each
    // round is one partial-agg pair count over that table, ONE
    // driver-collected row (the argmax — control-plane sized), and a
    // map-side replace, with localCheckpoint truncating the per-round
    // lineage. Output: the learned merge table, top-5 pairs per round
    // with exact counts. Oracle: the same four rounds unrolled as
    // CTEs.
    "tx_bpe_train" -> ((s, d) => {
      import s.implicits._
      val (learned, _) = bpeTrain(s, d, rounds = 4)
      learned.toDF("round", "rank", "left_sym", "right_sym", "pair_count")
    }),

    // The inference side of the learned tokenizer: apply the four
    // trained merges to the whole corpus and report each document's
    // token economics — words, post-BPE tokens, and tokens per 1000
    // word-chars (the compression a tokenizer buys, the number a
    // training-cost estimate runs on). The per-word symbol table is
    // vocabulary-bounded (Heaps' law), so the document join
    // broadcasts it — per-doc work never touches the training corpus
    // again.
    "tx_bpe_encode" -> ((s, d) => {
      val (_, seqs) = bpeTrain(s, d, rounds = 4)
      val encoded = seqs.select(col("word"),
        size(split(trim(col("seq")), " ")).as("n_tok"),
        length(col("word")).as("wlen"))
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .join(broadcast(encoded), Seq("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("wlen")).as("n_word_chars"))
        .select(col("doc_id"), col("n_words"), col("n_tokens"),
          expr("n_tokens * 1000 div n_word_chars").as("tokens_permille"))
    }),

    // Deterministic importance RESAMPLING by quality weight — the
    // mixture-shifting primitive (upweight high-quality documents in
    // the training mix): systematic sampling with K=1000 draws at
    // positions (2k+1)·W/2K along the cumulative-weight axis, so a
    // document's sample multiplicity is proportional to its gate
    // quality score with zero variance and zero randomness — the
    // whole computation is exact integer arithmetic (the position
    // count inside [cum_prev, cum) is a closed-form div), identical
    // in both engines, and Σ multiplicities = K by construction.
    // The cumulative weights come from the same two-phase prefix-sum
    // shape as tx_pack (deterministic doc_id range buckets; the only
    // unpartitioned window is the P-row bucket-offset prefix).
    "dd_importance_resample" -> ((s, d) => {
      val P = 8; val K = 1000L
      val wts = Tables.documents(s, d).select(col("doc_id"), col("source"))
        .join(gateVerdicts(s, d).select(col("doc_id"), col("score_bp")),
          Seq("doc_id"))
        // three consumers (max-id, total weight, the bucketed prefix);
        // checkpointed so the gate's scoring window runs once
        .localCheckpoint(true)
      // percentile-balanced buckets: boundaries move only the
      // partition layout, never a cum value (see percentileBuckets)
      val b = percentileBuckets(wts, "doc_id", P)
      val offW = Window.orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = b.groupBy(col("pid")).agg(sum(col("score_bp")).as("ps"))
        .withColumn("off", coalesce(sum(col("ps")).over(offW), lit(0L)))
        .select(col("pid"), col("off"))
      val local = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      val tot = wts.agg(sum(col("score_bp")).as("tw"))
      val cum = b
        .withColumn("lc", sum(col("score_bp")).over(local))
        .join(broadcast(off), Seq("pid"))
        .withColumn("cum", col("off") + col("lc"))
        .withColumn("cum_prev", col("cum") - col("score_bp"))
        .crossJoin(broadcast(tot))
        // f(x) = #draws strictly below x; guarded so the dividend is
        // never negative (Spark div truncates, DuckDB // floors —
        // they only agree on non-negative operands)
        .withColumn("cnt",
          expr(s"""CASE WHEN 2 * $K * cum > tw
                   THEN (2 * $K * cum - 1 - tw) div (2 * tw) + 1 ELSE 0 END -
                   CASE WHEN 2 * $K * cum_prev > tw
                   THEN (2 * $K * cum_prev - 1 - tw) div (2 * tw) + 1 ELSE 0 END"""))
      cum.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("score_bp")).as("total_weight"),
          sum(col("cnt")).as("n_sampled"),
          sum(when(col("cnt") > 0, 1L).otherwise(0L)).as("n_docs_sampled"))
    }),

    // The curation FUNNEL flagship (the dedup-side sibling of
    // pipe_corpus_windows): quality gate → content-defined-chunk
    // cleanliness (drop documents over 50% duplicated boilerplate,
    // dup detection run over the GATED survivors) → deterministic
    // train/validation/test split, one lineage, with document and
    // token counts reported at every stage — the funnel report a
    // curation run publishes. Every stage reuses the production
    // operator (gate verdicts, the codegen'd CdcChunks, the split
    // hash), so this pins their COMPOSITION, not re-implementations.
    "pipe_dedup_funnel" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge
      // r17 opt round (guide §1.2, §5): the old shape checkpointed
      // FOUR frames — two of them carrying full document text — and
      // aggregated each funnel stage off its own lineage (21 jobs).
      // The funnel is four aggregates over ONE per-doc flag frame:
      // compute (gated, clean) per doc once, checkpoint only
      // (doc_id, n_toks, flags) — text never enters a checkpoint —
      // and fold every stage row off that. Same stage rows (oracle
      // hash unchanged): dup detection still runs over the GATED
      // survivors only, and 3_cdc_clean still means gated AND
      // dup_permille ≤ 500 with missing dfrac reading as 0.
      val gatedIds = gateVerdicts(s, d).filter(col("verdict") === "pass")
        .select(col("doc_id"))
        .localCheckpoint(true) // tiny; read by the chunker + flag frame
      val chunks = Tables.documents(s, d)
        .join(gatedIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), explode(ColumnBridge.column(
          graft.functions.CdcChunks(ColumnBridge.expression(col("text")))))
          .as("chunk"))
        .filter(col("chunk") =!= "")
        .select(col("doc_id"), md5(col("chunk")).as("ch"),
          length(col("chunk")).as("clen"))
        .localCheckpoint(true) // dup aggregate + join back
      val dup = chunks.groupBy(col("ch"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      val dfrac = chunks.join(dup, Seq("ch"))
        .groupBy(col("doc_id"))
        .agg(expr("sum(CASE WHEN nd >= 2 THEN clen ELSE 0 END) * 1000 div sum(clen)")
          .as("dup_permille"))
      val perDoc = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
        .join(gatedIds.withColumn("gated", lit(true)), Seq("doc_id"), "left")
        .join(dfrac, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks"),
          coalesce(col("gated"), lit(false)).as("gated"),
          (coalesce(col("gated"), lit(false)) &&
            coalesce(col("dup_permille"), lit(0L)) <= 500).as("clean"))
        .localCheckpoint(true) // doc_id + three numbers/doc — no text
      def stage(df: DataFrame, name: String): DataFrame = df
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
      val splits = perDoc.filter(col("clean"))
        .withColumn("b",
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 10)
        .withColumn("stage", concat(lit("4_"),
          when(col("b") < 8, "train").when(col("b") === 8, "validation")
            .otherwise("test")))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
        .select(col("stage"), col("n_docs"), col("n_tokens"))
      stage(perDoc, "1_raw")
        .unionAll(stage(perDoc.filter(col("gated")), "2_gated"))
        .unionAll(stage(perDoc.filter(col("clean")), "3_cdc_clean"))
        .unionAll(splits)
    }),

    // Content-defined chunking (CDC) dedup — the rolling-hash chunk
    // technique (Rabin/Gear-style, the rsync/LBFS/backup-dedup
    // primitive): chunk boundaries fall where a w=8-char polynomial
    // rolling hash H(i) = Σⱼ c(i−j)·31ʲ hits 0 mod 64, so boundaries
    // are a function of CONTENT, not position — an insertion early in
    // a document shifts every fixed-width chunk but leaves all CDC
    // chunks after the edit point identical, which is exactly what
    // fixed-position banding (tx_editdist_pairs) cannot give. Chunks
    // are then deduped ACROSS documents by md5 and each document
    // reports how much of it is boilerplate: chunk count, duplicated
    // chars, and the dup fraction (permille, exact integer).
    //
    // Scale shape: chunking is the codegen'd [[graft.functions.
    // CdcChunks]] expression — one O(n) rolling-hash pass per document
    // inside whole-stage codegen (an equivalent transform/slice/
    // zip_with formulation ran interpreted and 20x slower); cross-doc
    // dedup is ONE partial-agg groupBy on the chunk hash plus a keyed
    // join back — aggregation, not a self-join, so there is no
    // quadratic pair risk to cap.
    "dd_cdc_dupfrac" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge
      val chunkArr = ColumnBridge.column(graft.functions.CdcChunks(
        ColumnBridge.expression(col("text"))))
      val chunks = Tables.documents(s, d)
        .select(col("doc_id"), explode(chunkArr).as("chunk"))
        .select(col("doc_id"), md5(col("chunk")).as("ch"),
          length(col("chunk")).as("clen"))
        // two consumers (the dup aggregation and the join back) —
        // checkpointed so the chunking scan runs once
        .localCheckpoint(true)
      val dup = chunks.groupBy(col("ch"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      chunks.join(dup, Seq("ch"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") >= 2, col("clen")).otherwise(0L)).as("dup_chars"),
          sum(col("clen")).as("total_chars"))
        .select(col("doc_id"), col("n_chunks"), col("dup_chars"),
          col("total_chars"),
          expr("dup_chars * 1000 div total_chars").as("dup_permille"))
    }),

    // Banded edit-distance join — the entity-resolution / fuzzy-match
    // primitive (dedup by NEAR-IDENTICAL leading content, catching
    // what exact hashing misses by one typo): pairs of documents
    // whose 48-char prefixes are within Levenshtein distance 4.
    // Candidate generation is position-fixed chunk banding (3×16-char
    // chunks; pairs sharing any aligned chunk become candidates — the
    // pigeonhole guarantee for substitution-only edits, an explicit
    // recall approximation for shifts, identical in the oracle), then
    // the exact DP distance verifies candidates only. The quadratic
    // DP runs on bounded 48-char prefixes over the banded candidate
    // set — never doc×doc, never full-text.
    "tx_editdist_pairs" -> ((s, d) => {
      val p = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 48).as("pfx"))
      val chunks = p.select(col("doc_id"),
        explode(array(
          struct(lit(1).as("pos"), substring(col("pfx"), 1, 16).as("c")),
          struct(lit(2).as("pos"), substring(col("pfx"), 17, 16).as("c")),
          struct(lit(3).as("pos"), substring(col("pfx"), 33, 16).as("c"))))
          .as("ch"))
        .select(col("doc_id"), col("ch.pos").as("pos"), col("ch.c").as("c"))
        // degenerate-chunk guard: a document shorter than 33 (or 17)
        // chars leaves its pos-3 (pos-2) chunk EMPTY, and empty chunks
        // all collide — every short doc would pair with every other
        // short doc, an all-pairs explosion the banding exists to
        // avoid. Drop empty chunks (mirrored in the oracle); a short
        // doc can still pair through its non-empty aligned chunks.
        .filter(col("c") =!= "")
        // both the hot-bucket count and both self-join sides read the
        // chunk table; cached so the documents scan runs once
        .cache()
      // bounded candidate generation (see BoundedBuckets): a (pos,
      // chunk) bucket shared by >cap docs — identical leading 16 chars
      // across millions of boilerplate pages — would explode the
      // self-join quadratically.
      val bChunks = graft.operators.BoundedBuckets.cap(
        chunks, Seq("pos", "c"), tag = "tx_editdist_chunks")
      val cand = bChunks.as("a").join(bChunks.as("b"),
          col("a.pos") === col("b.pos") && col("a.c") === col("b.c") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(p.select(col("doc_id").as("doc_a"), col("pfx").as("pfx_a")),
          Seq("doc_a"))
        .join(p.select(col("doc_id").as("doc_b"), col("pfx").as("pfx_b")),
          Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("pfx_a"), col("pfx_b")).as("dist"))
        .filter(col("dist") <= 4)
    }),

    // Interpolated bigram language-model NLL per document — the
    // step up from tx_unigram_logprob's bag model: fluency-sensitive
    // quality scoring (scrambled word salad keeps its unigram NLL but
    // collapses under a bigram LM). P(w₂|w₁) = λ·c₁₂/c₁ + (1-λ)·c₂/N
    // with λ = 4/5 and ALL counts derived from one bigram table
    // (c₁ = bigram starts, c₂ = bigram ends, N = total bigrams), so
    // the interpolation is the exact rational (4·c₁₂·N + c₁·c₂) /
    // (5·c₁·N) and the per-bigram NLL is a difference of two ln's of
    // exact integers, quantized to micro-nats before the per-doc
    // sum — the same determinism contract as the unigram query.
    // Shapes: two partial-agg groupBys + broadcast totals; the
    // per-bigram model table joins back on the bigram key.
    "tx_bigram_nll" -> ((s, d) => {
      // bigrams keyed on the (w1, w2) pair, not the joined string
      // (r17 opt round, guide §2.3 "narrower types"/per-task work):
      // no concat_ws per exploded occurrence, no substring_index pair
      // per model row — bijective with the string key, so every count
      // and the output are unchanged (oracle hash pins it)
      val docBg = Tables.documentsParallel(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), explode(Shingles.wordPairs(col("tk"))).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("tf"))
      // c12 checkpointed ONCE (r18, guide §2.4): the r18 plan showed
      // only the scan exchange reused — the tokenize+explode+two-level
      // aggregation subtree executed FIVE times per action (docBg
      // broadcast side + c12 + c1 + c2 + tot), 22.7 s of task time at
      // sf0.1 for a 1.3 s query. The checkpoint is VOCAB-sized
      // (distinct bigram types), so c1/c2/tot/model fold a tiny
      // materialized frame and the tokenize runs twice (checkpoint
      // job + the docBg probe side), not five times. This is NOT the
      // r17-rejected variant, which checkpointed the CORPUS-sized
      // docBg as well (1.26->2.29 s on tx_kn_bigram — serializing the
      // doc-level rows cost more than the saved re-aggregation);
      // docBg deliberately stays in recompute shape.
      val c12 = docBg.groupBy(col("w1"), col("w2"))
        .agg(sum(col("tf")).as("c12"))
        .localCheckpoint(true)
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      val c2 = c12.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
      val tot = c12.agg(sum(col("c12")).as("n"))
      val model = c12.join(c1, Seq("w1")).join(c2, Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"),
          floor((log(col("c1") * lit(5L) * col("n")) -
                 log(col("c12") * lit(4L) * col("n") + col("c1") * col("c2")))
            * 1000000).cast("long").as("nll_e6"))
      docBg.join(model, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_bigrams"),
          expr("sum(tf * nll_e6) div sum(tf)").as("avg_nll_e6"))
    }),

    // Kneser-Ney-smoothed bigram NLL (the LM-quality signal CCNet-
    // style pipelines actually use, vs tx_bigram_nll's additive
    // interpolation): P(w|v) = max(c(vw)-D,0)/c(v) +
    // D*N1+(v.)/c(v) * N1+(.w)/N1+(..) with the textbook D=0.75.
    // D=3/4 makes every probability RATIONAL, so the model is exact
    // scaled-integer arithmetic: p_u9 = (4c12-3)^+ * 1e9 div (4*c1)
    //   + 3*n1v*n1w*1e9 div (4*c1*n11)  — two floored divisions both
    // engines compute identically (all terms non-negative). Scale
    // 1e9 keeps the discounted term nonzero whenever c12 >= 1 and
    // 4*c1 <= 1e9 (c1 < 2.5e8 occurrences of one left token; at
    // larger corpora widen to 1e12 and drop the n11 factor first).
    // Bounds at sf0.1: (4c12)*1e9 < 2e15, 3*n1v*n1w*1e9 < 3e12,
    // 4*c1*n11 < 4e9 — all inside a long. The only float is the
    // final per-bigram ln, snapped to micro-nats before the exact
    // integer per-doc average (the tx_bigram_nll convention). Plan
    // shape: three partial-agg groupBys over bigram types (vocab-
    // sized, not corpus-sized) + one broadcast scalar; scoring is one
    // join of doc bigrams against the model keyed on the bigram.
    "tx_kn_bigram" -> ((s, d) => {
      // (w1, w2) pair key instead of the joined string, and the
      // vocab-sized c12 checkpointed once — see tx_bigram_nll's note
      // (docBg stays recompute; only c12 materializes)
      val docBg = Tables.documentsParallel(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), explode(Shingles.wordPairs(col("tk"))).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("tf"))
      val c12 = docBg.groupBy(col("w1"), col("w2"))
        .agg(sum(col("tf")).as("c12"))
        .localCheckpoint(true)
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"),
        count(lit(1)).as("n1v"))
      val n1w = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1w"))
      val n11 = c12.agg(count(lit(1)).as("n11"))
      val model = c12.join(c1, Seq("w1")).join(n1w, Seq("w2"))
        .crossJoin(broadcast(n11))
        .select(col("w1"), col("w2"), (
          expr("greatest(4 * c12 - 3, 0) * cast(1000000000 as bigint)" +
            " div (4 * c1)") +
          expr("3 * n1v * n1w * cast(1000000000 as bigint)" +
            " div (4 * c1 * n11)")).as("p_u9"))
        .select(col("w1"), col("w2"),
          expr("cast(floor(ln(1000000000.0 / p_u9) * 1000000) as bigint)")
            .as("nll_u6"))
      docBg.join(model, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_bigrams"),
          expr("sum(tf * nll_u6) div sum(tf)").as("avg_nll_u6"))
    }),

    // Intra-document repeated-window fraction (the within-doc half of
    // the Gopher duplicate-n-gram rules; the CROSS-doc half is
    // dd_span_dedup): share of 10-token windows whose exact text
    // occurs more than once in the SAME document, in basis points.
    // Pure integer arithmetic; map-side explode + one (doc, hash)
    // partial agg — no join anywhere, so corpus size only scales the
    // map work. The window digest is variadic xxhash64 over the
    // 10-token tuple (as dd_source_overlap): no window-string concat,
    // no md5 hex detour — and since the digest is an internal group
    // key that never reaches the output, the oracle keeps counting on
    // raw-text windows; the only approximation is Spark-side 64-bit
    // collisions (~n²/2⁶⁵, immaterial). Injective vs the joined
    // string because split-on-space tokens can't contain the
    // separator.
    "tx_dup_window_frac" -> ((s, d) => {
      val digests = when(size(col("tk")) >= 10,
        transform(sequence(lit(1), size(col("tk")) - 9),
          i => xxhash64((0 until 10).map(j =>
            element_at(col("tk"), (i + j).cast("int"))): _*)))
        .otherwise(expr("cast(array() as array<bigint>)"))
      Tables.documentsParallel(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), explode(digests).as("h"))
        .groupBy(col("doc_id"), col("h"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_windows"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup"))
        .withColumn("dup_bp", expr("n_dup * 10000 div n_windows"))
    }),

    // Token-length distribution per language: exact nearest-rank
    // p25/p50/p75/p90 over token counts — the length profile a
    // curation pass reads before setting min/max-length gates. Same
    // integer nearest-rank shape as q_percentiles (rank position of
    // the sorted value; ties don't matter because only the VALUE at
    // the rank is kept).
    "tx_length_percentiles" -> ((s, d) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("n_tokens"))
      val wAll = Window.partitionBy(col("lang"))
      Tables.documents(s, d)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy(col("lang"))
        .agg(max(col("n")).as("n_docs"),
          max(when(col("rn") === ceil(col("n") * 0.25), col("n_tokens"))).as("p25"),
          max(when(col("rn") === ceil(col("n") * 0.5), col("n_tokens"))).as("p50"),
          max(when(col("rn") === ceil(col("n") * 0.75), col("n_tokens"))).as("p75"),
          max(when(col("rn") === ceil(col("n") * 0.9), col("n_tokens"))).as("p90"))
    }),

    // Per-label centroid outliers: each vector's cosine to its OWN
    // label centroid, 3 farthest per label — the embedding-space
    // mislabel/contamination probe run before training on a labeled
    // corpus. Centroids are one keyed agg bounded by labels × dims,
    // broadcast back; scoring is a single codegen vector_dot pass.
    "sim_centroid_outlier" -> ((s, d) => {
      val w = Window.partitionBy(col("label"))
        .orderBy(col("cosine").asc, col("vec_id").asc)
      quantEmb(s, d)
        .join(broadcast(labelCentroids(s, d)), col("label") === col("clabel"))
        .withColumn("cosine",
          round(expr("vector_dot_long(q, carr)").cast("double") /
            (col("qnorm") * col("cnorm")), 4))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("label"), col("vec_id"), col("cosine"), col("rank"))
    }),

    // SemDeDup-style semantic dedup: assign every vector to its
    // NEAREST centroid by cosine (a k-means-style assignment — NOT its
    // given label), then near-dup pairs (cosine >= 0.3) only within
    // the assigned cluster, with the same B×B block decomposition as
    // dd_embcos_neardup. Cluster assignment bounds every pair block
    // at any corpus size (pick k so N/k fits a task); the centroid
    // table is labels × dims — broadcastable forever.
    "dd_semantic_dedup" -> ((s, d) => {
      val cent = labelCentroids(s, d)
      val e = quantEmb(s, d)
      // nearest-centroid assignment as a partial-aggregatable min_by
      // over the ×k fan-out instead of a row_number window (r17 opt
      // round, guide §2.3): the ordering struct (−pcos, clabel) is
      // the window's (pcos desc, clabel asc) and is UNIQUE per
      // (vec_id, centroid) — clabel breaks every cosine tie — so the
      // argmin row is exactly the window's prank = 1 row, with the
      // Exchange+Sort over the k·N exploded rows replaced by a
      // map-side-collapsing hash aggregate (k·N rows never shuffle).
      val assigned = e.crossJoin(broadcast(cent))
        .withColumn("pcos",
          round(expr("vector_dot_long(q, carr)").cast("double") /
            (col("qnorm") * col("cnorm")), 4))
        .groupBy(col("vec_id"))
        .agg(min_by(
          struct(col("clabel"), col("q"), col("qnorm")),
          struct(negate(col("pcos")), col("clabel"))).as("best"))
        .select(col("vec_id"), col("best.clabel").as("cluster"),
          col("best.q").as("q"), col("best.qnorm").as("qnorm"))
      blockedCosinePairs(s, assigned, "cluster")
    }),

    // Zipf-slope fit per language: least-squares slope of ln(freq) on
    // ln(rank) over the top-100 vocabulary — the healthy-corpus check
    // (natural text ≈ −1; spam/generated text drifts). Each ln is
    // floored to an integer scale per (rank, freq) ENTRY, so the
    // regression sums are exact integer arithmetic — accumulation
    // order cannot move the result. The slope is emitted NEGATED
    // (positive bp) so the single integer division stays positive —
    // truncating (Spark div) and flooring (DuckDB //) division only
    // agree on non-negative operands. One vocab agg + a rank window
    // bounded to 100 rows per language.
    "tx_zipf_slope" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("tok").asc)
      Tables.documents(s, d)
        .select(col("lang"), explode(toks).as("tok"))
        .groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 100)
        .select(col("lang"),
          floor(log(col("rank")) * 10000).cast("long").as("x"),
          floor(log(col("n")) * 10000).cast("long").as("y"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("lang"), col("cnt"),
          expr("(sx * sy - cnt * sxy) * 10000 div (cnt * sxx - sx * sx)")
            .as("neg_slope_bp"))
    }),

    // Per-source KL divergence from the corpus unigram mixture over
    // the shared top-100 vocabulary — the data-mixture drift
    // diagnostic: which source's token distribution departs from the
    // blend it feeds (the counterpart of dd_mixture_weights' size
    // rebalance). Global top-V via the rank<=k pushdown (map-side
    // partial top-100 per partition, one ~100·P-row final — never a
    // vocab-sized single partition), then a 100-row broadcast against
    // the token stream. Per-term contribution is
    // c_sw · (ln(c_sw·C_tot) − ln(C_w·S_tot)) with both lns taken on
    // EXACT INTEGER products and micro-nat-quantized BEFORE the exact
    // integer sum (the PMI/Kneser-Ney discipline) — cross-engine
    // parity is unconditional. Absent terms contribute 0 (the
    // 0·ln 0 = 0 convention), kept implicit by the inner join; KL is
    // between the top-V-renormalized distributions, so it is ≥ 0 up
    // to quantization.
    "tx_source_kl" -> ((s, d) => {
      // documentsParallel measured and REJECTED (r18 pair: 0.43→0.60
      // s): split+explode map work is too light, and the vocab
      // checkpoint consumer multiplies the layout's stage tax
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(toks).as("tok"))
      // 100 rows, fanned out twice (total + join) — materialize once
      val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("cw"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cw").desc, col("tok").asc)))
        .filter(col("rank") <= 100)
        .select(col("tok"), col("cw"))
        .localCheckpoint(true)
      val vtot = vocab.agg(sum(col("cw")).as("c_tot"))
      val src = tok.join(broadcast(vocab), Seq("tok"))
        .groupBy(col("source"), col("tok"), col("cw"))
        .agg(count(lit(1)).as("csw"))
      val stot = src.groupBy(col("source")).agg(sum(col("csw")).as("s_tot"))
      src.join(broadcast(stot), Seq("source"))
        .crossJoin(broadcast(vtot))
        .withColumn("term_mnat", col("csw") * expr(
          "cast(floor((ln(cast(csw * c_tot as double))" +
            " - ln(cast(cw * s_tot as double))) * 1000000) as bigint)"))
        .groupBy(col("source"))
        .agg(max(col("s_tot")).as("s_tot"),
          sum(col("term_mnat")).as("kl_mnat"))
    }),

    // Multimodal plumbing: opaque binary column + typed metadata.
    // The decode step is stubbed (no codec libs in this container);
    // the schema/bytes/digest path is real (see graft.analytics.Multimodal).
    "mm_binary_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("blob", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          octet_length(col("blob")).as("byte_len"),
          md5(col("blob")).as("digest"),
          substring(base64(col("blob")), 1, 8).as("magic"))
    }),

    // Real PNG decode, ORACLE-CHECKED: per document build a
    // deterministic greyscale PNG — pixel(i) = (doc_id*31 + i) % 256,
    // row filters cycling through ALL five PNG filter types — then
    // decode it through the REAL codec (deflate→inflate, filter→
    // unfilter, luma). The oracle computes the same average luma
    // arithmetically from the pixel formula, so a hash match proves
    // the full byte-level encode/compress/decompress/unfilter round
    // trip (absolute spec-conformance of each filter is pinned
    // separately by MultimodalSpec's hand-built vectors).
    "mm_png_luma" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      val media = Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 200)
        .as[Long].map { id =>
          val w = 4 + (id % 5).toInt
          val h = 3 + (id % 4).toInt
          val pixels = Array.tabulate(w * h)(i => ((id * 31 + i) % 256).toByte)
          Multimodal.MediaRow(id, "image",
            Multimodal.PngBuilder.grey8(w, h, pixels, y => ((id + y) % 5).toInt))
        }
      Multimodal.extractFeatures(media, new Multimodal.FormatAwareCodec)
        .toDF()
        .select(col("mediaId").as("doc_id"), col("width"), col("height"),
          col("avgLumaMilli").as("luma_milli"))
    }),

    // Real PCM WAV decode, ORACLE-CHECKED (the audio twin of
    // mm_png_luma — until now the WAV codec was pinned by spec
    // vectors only): per document synthesize a mono 16-bit WAV
    // (sample(i) = (id·37 + i²) mod 65536 − 32768, per-doc length and
    // rate), run it through the real RIFF-chunk walk + sign-extended
    // sample scan, and have the oracle recompute sample count,
    // duration and the mean-square energy from the formula with the
    // SAME truncating division chain. A hash match proves header
    // parse, chunk alignment, sign extension and the energy
    // arithmetic byte-exactly.
    "mm_wav_energy" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 200)
        .as[Long].map(id => Multimodal.MediaRow(id, "audio", wavBytesOf(id)))
        .transform(m => Multimodal.extractFeatures(m,
          new Multimodal.FormatAwareCodec))
        .toDF()
        .select(col("mediaId").as("doc_id"),
          col("sampleRate").as("sample_rate"), col("channels"),
          col("durationMs").as("duration_ms"),
          col("energyMilli").as("energy_milli"))
    }),

    // Real sample-level audio features, ORACLE-CHECKED (the feature
    // tier above mm_wav_energy's one scalar): the same synthesized
    // WAVs decode through the RIFF walk into actual sample arrays
    // (Multimodal.Wav), from which integer-exact features compute —
    // zero-crossing count (sign = v ≥ 0), peak |v|, and the
    // correlation against a ±1 square wave of period 16 (the
    // deterministic spectral proxy a tone/silence gate uses). The
    // oracle recomputes all three from the sample formula with a
    // per-doc lag window.
    "mm_wav_features" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 200)
        .as[Long].map { id =>
          val (n, zc, peak, corr) = Multimodal.Wav.decode(wavBytesOf(id))
            .map(Multimodal.Wav.features)
            .getOrElse((-1L, -1L, -1L, 0L))
          (id, n, zc, peak, corr)
        }
        .toDF("doc_id", "n_samples", "zero_cross", "peak_abs", "sq_corr")
    }),

    // Real 24-bit BMP decode, ORACLE-CHECKED (the last decoder to get
    // an arithmetic oracle — WAV/PNG/JPEG/MP4 already have theirs):
    // per document build an uncompressed bottom-up BMP with
    // deterministic per-channel pixel formulas and 4-byte row
    // padding, decode through the real header parse + padded-row
    // walk, and have the oracle recompute the Rec.601 luma sum from
    // the formulas. A hash match proves the data-offset handling, row
    // stride, BGR channel order and luma arithmetic byte-exactly.
    "mm_bmp_luma" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 200)
        .as[Long].map { id =>
          val w = 5 + (id % 6).toInt
          val h = 4 + (id % 5).toInt
          val rowBytes = ((w * 3 + 3) / 4) * 4
          val dataLen = rowBytes * h
          val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(54 + dataLen)
          bb.putShort(0); bb.putShort(0); bb.putInt(54)
          bb.putInt(40); bb.putInt(w); bb.putInt(h)
          bb.putShort(1); bb.putShort(24)
          bb.putInt(0); bb.putInt(dataLen)
          bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              bb.put(((id + x * 3 + y * 7) % 256).toByte)        // B
              bb.put(((id * 2 + x * 5 + y * 11) % 256).toByte)   // G
              bb.put(((id * 3 + x * 7 + y * 13) % 256).toByte)   // R
              x += 1
            }
            var pad = w * 3
            while (pad < rowBytes) { bb.put(0.toByte); pad += 1 }
            y += 1
          }
          Multimodal.MediaRow(id, "image", bb.array())
        }
        .transform(m => Multimodal.extractFeatures(m,
          new Multimodal.FormatAwareCodec))
        .toDF()
        .select(col("mediaId").as("doc_id"), col("width"), col("height"),
          col("avgLumaMilli").as("luma_milli"))
    }),

    // Perceptual average-hash through the REAL PNG decode path,
    // ORACLE-CHECKED: per document build a deterministic greyscale
    // PNG (pixel(i) = (doc_id·31 + i) % 256, row filters cycling all
    // five types, dims ≥ 8 so the 8×8 resample is a true
    // downsample), decode + nearest-neighbor-resize + threshold it
    // with ImageHash, and have the oracle recompute the identical
    // bits arithmetically from the pixel formula. A hash match
    // proves the decode → resize → mean-threshold chain bit-exactly;
    // the hash is the image near-dup primitive (hamming-banded at
    // scale, like SimHash on text).
    "mm_ahash" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 200)
        .as[Long].map { id =>
          val w = 8 + (id % 9).toInt
          val h = 8 + (id % 7).toInt
          val pixels = Array.tabulate(w * h)(i => ((id * 31 + i) % 256).toByte)
          val png = Multimodal.PngBuilder.grey8(w, h, pixels,
            y => ((id + y) % 5).toInt)
          val (ww, hh, hi, lo) = Multimodal.ImageHash.ahashGrey8(png)
            .getOrElse((-1, -1, -1L, -1L))
          (id, ww, hh, hi, lo)
        }
        .toDF("doc_id", "width", "height", "ahash_hi", "ahash_lo")
    }),

    // Image near-dup pairs over the perceptual hash, ORACLE-CHECKED —
    // the full image-dedup composition: for each doc < 100 build a
    // base PNG and a PERTURBED copy (media_id + 1000, one source
    // pixel nudged by +8), hash both through the real
    // decode→resize→threshold path, then find near-dup pairs the way
    // 100 TB of images would: band the 64 hash bits into 4×16-bit
    // keys, equi-join on (band, value) — never all-pairs — and
    // verify candidates by exact hamming distance (bit_count of xor)
    // ≤ 8. The planted copies guarantee the result is non-trivial;
    // unrelated band collisions are filtered by the verify step. The
    // oracle recomputes every bit arithmetically.
    // Real GIF decode, ORACLE-CHECKED: per document build a GIF89a
    // (256-entry greyscale palette, REAL LZW compression — every
    // third one interlaced) with pixel(i) = (id·53 + i·7) mod 256,
    // then decode through the magic-byte dispatch: signature, screen
    // descriptor, palette, LZW decompression, de-interlacing and the
    // palette-resolved Rec.601 luma all sit on the hash-checked path.
    // With the grey palette, luma(v) = v exactly, so the oracle is
    // pure integer arithmetic over the pixel formula.
    "mm_gif_luma" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      val media = Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 200)
        .as[Long].map { id =>
          val w = 4 + (id % 5).toInt
          val h = 3 + (id % 4).toInt
          val px = Array.tabulate(w * h)(i => ((id * 53 + i * 7) % 256).toByte)
          Multimodal.MediaRow(id, "image",
            Multimodal.GifBuilder.grey8(w, h, px, interlaced = id % 3 == 0))
        }
      Multimodal.extractFeatures(media, new Multimodal.FormatAwareCodec)
        .toDF()
        .select(col("mediaId").as("doc_id"), col("width"), col("height"),
          col("avgLumaMilli").as("luma_milli"))
    }),

    // Real ANIMATED-GIF frame decode, ORACLE-CHECKED (the palette
    // twin of mm_mjpeg_frames): 3 full-screen frames per document,
    // pixel(f, i) = (id·31 + f·17 + i·3) mod 256, per-frame
    // graphic-control delays 4+f centiseconds. Every frame decodes
    // through the real LZW chain; frame order, per-frame delay and
    // per-frame exact luma are all hash-checked.
    "mm_gif_frames" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 100)
        .as[Long].flatMap { id =>
          val w = 5 + (id % 6).toInt
          val h = 4 + (id % 5).toInt
          def frame(f: Int) = Array.tabulate(w * h)(i =>
            ((id * 31 + f * 17 + i * 3) % 256).toByte)
          val gif = Multimodal.GifBuilder.animGrey8(w, h,
            (0 until 3).map(frame), delaysCs = Seq(4, 5, 6))
          Multimodal.Gif.frames(gif).zipWithIndex.map { case (fr, i) =>
            (id, i, fr.width, fr.height, fr.delayCs,
              Multimodal.Gif.lumaMilliOf(fr))
          }
        }
        .toDF("doc_id", "frame_no", "width", "height", "delay_cs", "luma_milli")
    }),

    // Real QOI decode, ORACLE-CHECKED: per document run the real
    // greedy QOI encoder (run/index/diff/luma/rgb op selection) over
    // a pixel pattern designed to hit RUN, LUMA, RGB and INDEX ops —
    // plateaus of 2, a +100 jump mid-group, a fall back to the
    // already-indexed base, +29 between groups — then decode through
    // the magic-byte dispatch: header, the 64-entry index, wrapped
    // deltas and the end-marker check all sit on the hash-checked
    // path (QoiSpec pins the op coverage and the fuzz contract).
    "mm_qoi_luma" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.{Multimodal, Qoi}
      val media = Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 200)
        .as[Long].map { id =>
          val w = 4 + (id % 5).toInt
          val h = 3 + (id % 4).toInt
          val px = Array.tabulate(w * h) { i =>
            ((id * 37 + (i / 5) * 29 +
              (if (i % 5 == 2 || i % 5 == 3) 100 else 0)) % 256).toByte
          }
          Multimodal.MediaRow(id, "image", Qoi.Builder.grey8(w, h, px))
        }
      Multimodal.extractFeatures(media, new Multimodal.FormatAwareCodec)
        .toDF()
        .select(col("mediaId").as("doc_id"), col("width"), col("height"),
          col("avgLumaMilli").as("luma_milli"))
    }),

    // Real WebP-lossless (VP8L) decode, ORACLE-CHECKED: per document
    // build a greyscale VP8L (subtract-green transform, normal
    // code-length-coded literal tree; every SECOND one additionally
    // LZ77-compressed — plateau pixels become real backward
    // references) with pixel(i) = (id·29 + (i − i mod 5)·11) mod 256,
    // then decode through the magic-byte dispatch: RIFF walk, prefix
    // codes, the backref loop and the inverse transform all sit on
    // the hash-checked path. Grey pixels make Rec.601 luma(v) = v
    // exactly, so the oracle is pure integer arithmetic.
    "mm_webp_luma" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.{Multimodal, Webp}
      val media = Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 200)
        .as[Long].map { id =>
          val w = 5 + (id % 6).toInt
          val h = 4 + (id % 5).toInt
          val px = Array.tabulate(w * h)(i =>
            ((id * 29 + (i - i % 5) * 11) % 256).toByte)
          Multimodal.MediaRow(id, "image",
            Webp.Builder.grey8(w, h, px, withRuns = id % 2 == 0))
        }
      Multimodal.extractFeatures(media, new Multimodal.FormatAwareCodec)
        .toDF()
        .select(col("mediaId").as("doc_id"), col("width"), col("height"),
          col("avgLumaMilli").as("luma_milli"))
    }),

    "mm_ahash_pairs" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      val hashes = Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 100)
        .as[Long].flatMap { id =>
          val w = 8 + (id % 9).toInt
          val h = 8 + (id % 7).toInt
          // quadratic-residue term de-aliases the image family: a
          // pure linear ramp mod 256 hashes identically across many
          // (id, w, h) combinations, drowning the planted copies in
          // accidental exact-hash pairs
          def pix(perturb: Boolean) = Array.tabulate(w * h) { i =>
            val base = ((id * 31 + i + (i * i % 257) * 5) % 256).toInt
            val v = if (perturb && i == (id % (w * h)).toInt) (base + 8) % 256
                    else base
            v.toByte
          }
          Seq(false, true).map { p =>
            val png = Multimodal.PngBuilder.grey8(w, h, pix(p),
              y => ((id + y) % 5).toInt)
            val (_, _, hi, lo) = Multimodal.ImageHash.ahashGrey8(png).get
            (if (p) id + 1000 else id, hi, lo)
          }
        }
        .toDF("media_id", "hi", "lo")
      val bands = hashes.select(col("media_id"), col("hi"), col("lo"),
        explode(expr(
          "array(named_struct('b', 0, 'v', lo          % 65536)," +
          "      named_struct('b', 1, 'v', (lo div 65536) % 65536)," +
          "      named_struct('b', 2, 'v', hi          % 65536)," +
          "      named_struct('b', 3, 'v', (hi div 65536) % 65536))"))
          .as("band"))
        .select(col("media_id"), col("hi"), col("lo"),
          col("band.b").as("b"), col("band.v").as("v"))
        // cached: the hot-bucket count pass and both self-join sides
        // would otherwise each re-run the PNG encode+decode flatMap
        .cache()
      // bounded candidate generation (see BoundedBuckets): a 16-bit
      // hash band shared by >cap images (solid-color thumbnails at
      // crawl scale) would explode the self-join quadratically.
      val bBands = graft.operators.BoundedBuckets.cap(
        bands, Seq("b", "v"), tag = "mm_ahash_bands")
      bBands.as("x").join(bBands.as("y"),
          col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
          col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("media_a"),
          col("y.media_id").as("media_b"),
          (expr("bit_count(x.hi ^ y.hi)") + expr("bit_count(x.lo ^ y.lo)"))
            .cast("int").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 8)
    }),

    // REAL VIDEO FRAME DECODE, ORACLE-CHECKED — Motion-JPEG: per
    // document build a 4-frame MJPEG ISO-BMFF container (each sample
    // a complete baseline JPEG with engineered solid-DC blocks,
    // dc(f,bx,by) = (id·7 + f·11 + bx·13 + by·29) % 32 − 16), then
    // decode actual frames through the full chain — sample-index
    // walk → frame byte ranges → in-house Huffman+IDCT JPEG decode —
    // with the oracle recomputing every frame's visible-area-weighted
    // luma arithmetically. This retires the video-frame stub for the
    // one codec-free interchange format; inter-coded codecs stay the
    // honest boundary.
    "mm_mjpeg_frames" -> ((s, d) => mjpegFrameLumas(s, d)),

    // Scene-cut detection over the REAL MJPEG frame decode — the
    // video-curation primitive behind keyframe sampling budgets:
    // consecutive-frame luma delta per video, flagged against a fixed
    // threshold. The window partitions by video with ≤ frame-count
    // rows per partition, so the shape holds at any corpus size.
    "mm_scene_cuts" -> ((s, d) => {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
      mjpegFrameLumas(s, d)
        .withColumn("delta_milli",
          abs(col("luma_milli") - lag(col("luma_milli"), 1).over(w)))
        .filter(col("delta_milli").isNotNull)
        .select(col("doc_id"), col("frame_no"), col("delta_milli"),
          when(col("delta_milli") >= SceneCutMilli, 1).otherwise(0)
            .as("is_cut"))
    }),

    // Real baseline JPEG decode, ORACLE-CHECKED: per document encode
    // a JPEG whose blocks hold one quantized DC each — dc(bx,by) =
    // (doc_id*7 + bx*13 + by*29) % 32 - 16, DC quant step 8 — so the
    // IDCT of every block is EXACTLY the solid value dc+128. Odd ids
    // are grayscale with restart markers every 3 blocks; even ids
    // 4:2:0 color whose chroma carries DC+AC bits the decoder must
    // consume without disturbing Y. The oracle recomputes the
    // visible-area-weighted average arithmetically: a hash match
    // proves Huffman coding, DC prediction + restart resets,
    // dequantization and the IDCT round-trip byte-exactly (AC
    // coefficients and the reference-IDCT cross-check are pinned in
    // MultimodalSpec).
    "mm_jpeg_luma" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      val media = Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 200)
        .as[Long].map { id =>
          val w = 9 + (id % 12).toInt // 9..20 → 2-3 visible block cols
          val h = 9 + (id % 7).toInt  // 9..15 → 2 visible block rows
          def dc(bx: Int, by: Int): Int =
            ((id * 7 + bx * 13 + by * 29) % 32).toInt - 16
          def yb(bx: Int, by: Int): Array[Int] = {
            val a = new Array[Int](64); a(0) = dc(bx, by); a
          }
          val quantY = Array.fill(64)(8)
          val bytes =
            if (id % 2 == 1)
              Multimodal.JpegBuilder.baselineGrey(w, h, quantY, yb,
                restartInterval = 3)
            else {
              val quantC = Array.fill(64)(16)
              def cbb(bx: Int, by: Int) = {
                val a = new Array[Int](64)
                a(0) = ((id + bx) % 7).toInt - 3; a(1) = ((id + by) % 5).toInt - 2
                a
              }
              def crb(bx: Int, by: Int) = {
                val a = new Array[Int](64)
                a(0) = ((id * 3 + by) % 7).toInt - 3; a(9) = (bx % 3) - 1
                a
              }
              Multimodal.JpegBuilder.baseline420(w, h, quantY, yb,
                quantC, cbb, crb)
            }
          Multimodal.MediaRow(id, "image", bytes)
        }
      Multimodal.extractFeatures(media, new Multimodal.FormatAwareCodec)
        .toDF()
        .select(col("mediaId").as("doc_id"), col("width"), col("height"),
          col("avgLumaMilli").as("luma_milli"))
    }),

    // Real PROGRESSIVE JPEG decode, ORACLE-CHECKED: per document a
    // deterministic SOF2 stream whose scan script exercises DC
    // successive approximation (top bits, then two refinement
    // passes) and AC band scans — decoded through the full
    // multi-scan coefficient accumulation + IDCT. DC-only blocks at
    // quant step 8 make each block's luma exactly dc+128, so the
    // oracle recomputes the visible-area average arithmetically; a
    // hash match proves every approximation bit landed.
    "mm_jpeg_progressive" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      val media = Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 200)
        .as[Long].map { id =>
          val w = 9 + (id % 12).toInt
          val h = 9 + (id % 7).toInt
          def yb(bx: Int, by: Int): Array[Int] = {
            val a = new Array[Int](64)
            a(0) = ((id * 5 + bx * 11 + by * 23) % 48).toInt - 24
            a
          }
          val bytes = Multimodal.JpegBuilder.progressiveGrey(w, h,
            Array.fill(64)(8), yb,
            Seq((0, 0, 0, 2), (1, 63, 0, 1),
              (0, 0, 2, 1), (0, 0, 1, 0), (1, 63, 1, 0)))
          Multimodal.MediaRow(id, "image", bytes)
        }
      Multimodal.extractFeatures(media, new Multimodal.FormatAwareCodec)
        .toDF()
        .select(col("mediaId").as("doc_id"), col("width"), col("height"),
          col("avgLumaMilli").as("luma_milli"))
    }),

    // Real MP4/JPEG container parse, ORACLE-CHECKED: per document
    // build a deterministic container — even ids an ISO-BMFF box tree
    // (v1 layout every third id), odd ids a JPEG marker stream — then
    // recover duration and dimensions through the REAL box/marker
    // walks. The oracle recomputes the same fields arithmetically, so
    // a hash match proves the byte-level build→parse round trip for
    // both layouts (hand-built offset vectors are pinned separately
    // in MultimodalSpec).
    "mm_container_meta" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      val media = Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 200)
        .as[Long].map { id =>
          val w = 160 + (id % 17).toInt
          val h = 90 + (id % 11).toInt
          if (id % 2 == 0)
            Multimodal.MediaRow(id, "mp4",
              Multimodal.Mp4Builder.minimal(600, 600L * (id + 1), w, h,
                version1 = id % 3 == 0))
          else
            Multimodal.MediaRow(id, "jpeg",
              Multimodal.JpegBuilder.headerOnly(w, h,
                progressive = id % 5 == 0))
        }
      Multimodal.extractFeatures(media, new Multimodal.FormatAwareCodec)
        .toDF()
        .select(col("mediaId").as("doc_id"), col("mediaType").as("fmt"),
          col("width"), col("height"), col("durationMs").as("duration_ms"))
    }),

    // Real MP4 keyframe index, ORACLE-CHECKED: per document build a
    // container whose stss/stsc/stsz/stco sample tables follow an
    // arithmetic formula, then recover each sync sample's true byte
    // offset through the REAL box-tree walk (Mp4Index) — the
    // container-seek a video frame-sampling pipeline performs. The
    // oracle recomputes the offsets from the same formulas, so a hash
    // match proves chunk/size/sync accounting end to end.
    "mm_mp4_keyframes" -> ((s, d) => {
      import s.implicits._
      import graft.analytics.Multimodal
      Tables.documents(s, d)
        .select(col("doc_id")).filter(col("doc_id") < 120)
        .as[Long].flatMap { id =>
          val n = 6 + (id % 5).toInt
          val size = 100L + (id % 7) * 10
          val chunks = (n + 1) / 2
          val container = Multimodal.Mp4Builder.withSampleIndex(
            600, 600L * n, 320, 240,
            sampleCount = n, uniformSize = size, sampleSizes = Nil,
            samplesPerChunk = 2,
            chunkOffsets = (0 until chunks).map(i => 1000L + i * 4096L),
            syncSamples = (1 to n by 3))
          Multimodal.Mp4Index.syncSampleOffsets(container).map {
            case (sn, off) => (id, sn, off)
          }
        }
        .toDF("doc_id", "sample_no", "byte_offset")
    })
  )

  override def oracle: Map[String, String] = Map(
    "tx_pmi_pairs" ->
      """WITH dtok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |dfreq AS (SELECT tok, count(*)::BIGINT AS n FROM dtok GROUP BY 1),
        |vocab AS (
        |  SELECT tok, n FROM dfreq ORDER BY n DESC, tok ASC LIMIT 50),
        |ft AS (SELECT d.doc_id, d.tok FROM dtok d JOIN vocab USING (tok)),
        |dt AS (SELECT count(*)::BIGINT AS d_total FROM documents),
        |pairs AS (
        |  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*)::BIGINT AS n_ab
        |  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 5)
        |SELECT tok_a, tok_b, n_ab,
        |  floor((ln(n_ab * d_total) - ln(va.n * vb.n)) * 1000000)::BIGINT
        |    AS pmi_u6
        |FROM pairs
        |JOIN vocab va ON va.tok = pairs.tok_a
        |JOIN vocab vb ON vb.tok = pairs.tok_b
        |CROSS JOIN dt""".stripMargin,
    "dd_importance_resample" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars, string_split(text, ' ') AS tk
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, n_chars, len(tk) AS n_tokens,
        |    CASE WHEN len(tk) >= 2
        |      THEN list_transform(generate_series(1, len(tk) - 1),
        |             i -> tk[i] || ' ' || tk[i + 1])
        |      ELSE [] END AS bigrams,
        |    len(list_filter(tk,
        |      t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop
        |  FROM base),
        |scored AS (
        |  SELECT doc_id,
        |    floor((least(n_tokens / 100.0, 1.0) * 0.4 +
        |           (1.0 - n_stop / n_tokens) * 0.3 +
        |           least((n_chars - (n_tokens - 1)) / n_tokens / 8.0, 1.0) * 0.3)
        |          * 10000)::BIGINT AS score_bp
        |  FROM feat),
        |wts AS (
        |  SELECT d.doc_id, d.source, s.score_bp
        |  FROM documents d JOIN scored s USING (doc_id)),
        |cums AS (
        |  SELECT doc_id, source, score_bp,
        |    sum(score_bp) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM wts),
        |tot AS (SELECT sum(score_bp)::BIGINT AS tw FROM wts),
        |cnts AS (
        |  SELECT source, score_bp,
        |    (CASE WHEN 2 * 1000 * cum > tw
        |          THEN (2 * 1000 * cum - 1 - tw) // (2 * tw) + 1 ELSE 0 END -
        |     CASE WHEN 2 * 1000 * (cum - score_bp) > tw
        |          THEN (2 * 1000 * (cum - score_bp) - 1 - tw) // (2 * tw) + 1
        |          ELSE 0 END) AS cnt
        |  FROM cums CROSS JOIN tot)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(score_bp)::BIGINT AS total_weight,
        |  sum(cnt)::BIGINT AS n_sampled,
        |  sum(CASE WHEN cnt > 0 THEN 1 ELSE 0 END)::BIGINT AS n_docs_sampled
        |FROM cnts GROUP BY source""".stripMargin,
    "pipe_dedup_funnel" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars, string_split(text, ' ') AS tk
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, n_chars, len(tk) AS n_tokens,
        |    md5(array_to_string(list_sort(list_distinct(tk)), ' ')) AS bag_hash,
        |    CASE WHEN len(tk) >= 2
        |      THEN list_transform(generate_series(1, len(tk) - 1),
        |             i -> tk[i] || ' ' || tk[i + 1])
        |      ELSE [] END AS bigrams,
        |    len(list_filter(tk,
        |      t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop
        |  FROM base),
        |scored AS (
        |  SELECT doc_id, n_tokens, bag_hash,
        |    len(bigrams) AS n_bigrams,
        |    len(list_distinct(bigrams)) AS n_dbg,
        |    floor((least(n_tokens / 100.0, 1.0) * 0.4 +
        |           (1.0 - n_stop / n_tokens) * 0.3 +
        |           least((n_chars - (n_tokens - 1)) / n_tokens / 8.0, 1.0) * 0.3)
        |          * 10000)::BIGINT AS score_bp
        |  FROM feat),
        |keep AS (
        |  SELECT *, min(doc_id) OVER (PARTITION BY bag_hash) AS bag_keeper
        |  FROM scored),
        |verd AS (
        |  SELECT doc_id,
        |    CASE WHEN n_tokens < 16 THEN 'too_short'
        |         WHEN n_dbg * 2 < n_bigrams THEN 'repetitive'
        |         WHEN doc_id != bag_keeper THEN 'bag_dup'
        |         WHEN score_bp < 5000 THEN 'low_quality'
        |         ELSE 'pass' END AS verdict
        |  FROM keep),
        |docs0 AS (
        |  SELECT doc_id, text, len(string_split(text, ' '))::BIGINT AS n_toks
        |  FROM documents),
        |gated AS (
        |  SELECT d.doc_id, d.text, d.n_toks FROM docs0 d
        |  JOIN verd v USING (doc_id) WHERE v.verdict = 'pass'),
        |cd AS (SELECT doc_id, text, length(text) AS n FROM gated),
        |ccs AS (SELECT doc_id, text, n,
        |  list_transform(range(1, n + 1),
        |    i -> ascii(substr(text, i, 1))::BIGINT) AS c
        |  FROM cd),
        |chs AS (SELECT doc_id, text, n,
        |  CASE WHEN n >= 8 THEN list_transform(range(8, n + 1), i ->
        |    c[i]*1 + c[i-1]*31 + c[i-2]*961 + c[i-3]*29791 +
        |    c[i-4]*923521 + c[i-5]*28629151 + c[i-6]*887503681 +
        |    c[i-7]*27512614111)
        |  ELSE [] END AS h
        |  FROM ccs),
        |cbs AS (SELECT doc_id, text, n,
        |  [0::BIGINT] || list_transform(
        |    list_filter(list_transform(range(1, len(h) + 1),
        |        k -> {'pos': k + 7, 'hv': h[k]}),
        |      x -> x.hv % 64 = 0), x -> x.pos)
        |    || [n::BIGINT] AS bounds
        |  FROM chs),
        |ck0 AS (SELECT doc_id, unnest(list_transform(range(1, len(bounds)),
        |    k -> substr(text, (bounds[k] + 1)::INT,
        |                (bounds[k+1] - bounds[k])::INT))) AS chunk
        |  FROM cbs),
        |ck AS (SELECT doc_id, md5(chunk) AS ch, length(chunk) AS clen
        |  FROM ck0 WHERE chunk <> ''),
        |cdup AS (SELECT ch, count(DISTINCT doc_id) AS nd FROM ck GROUP BY 1),
        |dfrac AS (
        |  SELECT doc_id,
        |    (sum(CASE WHEN nd >= 2 THEN clen ELSE 0 END)::BIGINT * 1000
        |       // sum(clen)::BIGINT) AS dup_permille
        |  FROM ck JOIN cdup USING (ch) GROUP BY doc_id),
        |clean AS (
        |  SELECT g.doc_id, g.n_toks FROM gated g
        |  LEFT JOIN dfrac USING (doc_id)
        |  WHERE coalesce(dup_permille, 0) <= 500),
        |spl AS (
        |  SELECT n_toks,
        |    CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'validation'
        |         ELSE 'test' END AS sp
        |  FROM (SELECT n_toks,
        |          ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 10 AS b
        |        FROM clean))
        |SELECT '1_raw' AS stage, count(*)::BIGINT AS n_docs,
        |  sum(n_toks)::BIGINT AS n_tokens FROM docs0
        |UNION ALL
        |SELECT '2_gated', count(*)::BIGINT, sum(n_toks)::BIGINT FROM gated
        |UNION ALL
        |SELECT '3_cdc_clean', count(*)::BIGINT, sum(n_toks)::BIGINT FROM clean
        |UNION ALL
        |SELECT '4_' || sp, count(*)::BIGINT, sum(n_toks)::BIGINT FROM spl GROUP BY sp""".stripMargin,
    "tx_pad_buckets" ->
      """WITH docs AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_toks,
        |    md5(doc_id::VARCHAR) AS hkey
        |  FROM documents),
        |rs AS (SELECT doc_id, n_toks,
        |  row_number() OVER (ORDER BY n_toks, doc_id) AS rnk FROM docs),
        |rh AS (SELECT doc_id, n_toks,
        |  row_number() OVER (ORDER BY hkey, doc_id) AS rnk FROM docs),
        |ps AS (
        |  SELECT count(*)::BIGINT AS n_batches,
        |    sum(btoks)::BIGINT AS total_tokens,
        |    sum(bsz * bmax - btoks)::BIGINT AS total_padding FROM (
        |    SELECT (rnk - 1) // 32 AS batch, count(*) AS bsz,
        |      max(n_toks) AS bmax, sum(n_toks) AS btoks FROM rs GROUP BY 1)),
        |ph AS (
        |  SELECT count(*)::BIGINT AS n_batches,
        |    sum(btoks)::BIGINT AS total_tokens,
        |    sum(bsz * bmax - btoks)::BIGINT AS total_padding FROM (
        |    SELECT (rnk - 1) // 32 AS batch, count(*) AS bsz,
        |      max(n_toks) AS bmax, sum(n_toks) AS btoks FROM rh GROUP BY 1))
        |SELECT 'sorted' AS strategy, n_batches, total_tokens, total_padding,
        |  (total_padding * 1000 // (total_tokens + total_padding))
        |    AS padding_permille FROM ps
        |UNION ALL
        |SELECT 'hashed', n_batches, total_tokens, total_padding,
        |  (total_padding * 1000 // (total_tokens + total_padding)) FROM ph"""
        .stripMargin,
    "tx_bpe_encode" ->
      s"""WITH w AS (
        |  SELECT word, count(*)::BIGINT AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> ''
        |  GROUP BY word),
        |s0 AS (SELECT word, freq,
        |  ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS seq
        |  FROM w),
        |p1 AS (
        |  SELECT p.l AS l, p.r AS r, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(syms)),
        |      i -> {'l': syms[i], 'r': syms[i+1]})) AS p
        |    FROM (SELECT freq, string_split(trim(seq), ' ') AS syms FROM s0))
        |  GROUP BY 1, 2),
        |b1 AS (SELECT l, r FROM (SELECT l, r,
        |  row_number() OVER (ORDER BY cnt DESC, l, r) AS rnk FROM p1) WHERE rnk = 1),
        |s1 AS (SELECT word, freq,
        |  ${bpeMergeSql(1)}
        |  FROM s0 CROSS JOIN b1),
        |p2 AS (
        |  SELECT p.l AS l, p.r AS r, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(syms)),
        |      i -> {'l': syms[i], 'r': syms[i+1]})) AS p
        |    FROM (SELECT freq, string_split(trim(seq), ' ') AS syms FROM s1))
        |  GROUP BY 1, 2),
        |b2 AS (SELECT l, r FROM (SELECT l, r,
        |  row_number() OVER (ORDER BY cnt DESC, l, r) AS rnk FROM p2) WHERE rnk = 1),
        |s2 AS (SELECT word, freq,
        |  ${bpeMergeSql(2)}
        |  FROM s1 CROSS JOIN b2),
        |p3 AS (
        |  SELECT p.l AS l, p.r AS r, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(syms)),
        |      i -> {'l': syms[i], 'r': syms[i+1]})) AS p
        |    FROM (SELECT freq, string_split(trim(seq), ' ') AS syms FROM s2))
        |  GROUP BY 1, 2),
        |b3 AS (SELECT l, r FROM (SELECT l, r,
        |  row_number() OVER (ORDER BY cnt DESC, l, r) AS rnk FROM p3) WHERE rnk = 1),
        |s3 AS (SELECT word, freq,
        |  ${bpeMergeSql(3)}
        |  FROM s2 CROSS JOIN b3),
        |p4 AS (
        |  SELECT p.l AS l, p.r AS r, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(syms)),
        |      i -> {'l': syms[i], 'r': syms[i+1]})) AS p
        |    FROM (SELECT freq, string_split(trim(seq), ' ') AS syms FROM s3))
        |  GROUP BY 1, 2),
        |b4 AS (SELECT l, r FROM (SELECT l, r,
        |  row_number() OVER (ORDER BY cnt DESC, l, r) AS rnk FROM p4) WHERE rnk = 1),
        |s4 AS (SELECT word, freq,
        |  ${bpeMergeSql(4)}
        |  FROM s3 CROSS JOIN b4),
        |enc AS (SELECT word,
        |  len(string_split(trim(seq), ' '))::BIGINT AS n_tok,
        |  length(word)::BIGINT AS wlen
        |  FROM s4),
        |dw AS (SELECT doc_id, word FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> '')
        |SELECT doc_id, count(*)::BIGINT AS n_words, sum(n_tok)::BIGINT AS n_tokens,
        |  (sum(n_tok)::BIGINT * 1000 // sum(wlen)::BIGINT) AS tokens_permille
        |FROM dw JOIN enc USING (word)
        |GROUP BY doc_id""".stripMargin,
    "tx_bpe_train" ->
      s"""WITH w AS (
        |  SELECT word, count(*)::BIGINT AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> ''
        |  GROUP BY word),
        |s0 AS (SELECT freq,
        |  ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS seq
        |  FROM w),
        |p1 AS (
        |  SELECT p.l AS l, p.r AS r, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(syms)),
        |      i -> {'l': syms[i], 'r': syms[i+1]})) AS p
        |    FROM (SELECT freq, string_split(trim(seq), ' ') AS syms FROM s0))
        |  GROUP BY 1, 2),
        |t1 AS (SELECT 1 AS round,
        |  row_number() OVER (ORDER BY cnt DESC, l, r) AS rnk, l, r, cnt
        |  FROM p1 QUALIFY rnk <= 5),
        |b1 AS (SELECT l, r FROM t1 WHERE rnk = 1),
        |s1 AS (SELECT freq,
        |  ${bpeMergeSql(1)}
        |  FROM s0 CROSS JOIN b1),
        |p2 AS (
        |  SELECT p.l AS l, p.r AS r, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(syms)),
        |      i -> {'l': syms[i], 'r': syms[i+1]})) AS p
        |    FROM (SELECT freq, string_split(trim(seq), ' ') AS syms FROM s1))
        |  GROUP BY 1, 2),
        |t2 AS (SELECT 2 AS round,
        |  row_number() OVER (ORDER BY cnt DESC, l, r) AS rnk, l, r, cnt
        |  FROM p2 QUALIFY rnk <= 5),
        |b2 AS (SELECT l, r FROM t2 WHERE rnk = 1),
        |s2 AS (SELECT freq,
        |  ${bpeMergeSql(2)}
        |  FROM s1 CROSS JOIN b2),
        |p3 AS (
        |  SELECT p.l AS l, p.r AS r, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(syms)),
        |      i -> {'l': syms[i], 'r': syms[i+1]})) AS p
        |    FROM (SELECT freq, string_split(trim(seq), ' ') AS syms FROM s2))
        |  GROUP BY 1, 2),
        |t3 AS (SELECT 3 AS round,
        |  row_number() OVER (ORDER BY cnt DESC, l, r) AS rnk, l, r, cnt
        |  FROM p3 QUALIFY rnk <= 5),
        |b3 AS (SELECT l, r FROM t3 WHERE rnk = 1),
        |s3 AS (SELECT freq,
        |  ${bpeMergeSql(3)}
        |  FROM s2 CROSS JOIN b3),
        |p4 AS (
        |  SELECT p.l AS l, p.r AS r, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest(list_transform(range(1, len(syms)),
        |      i -> {'l': syms[i], 'r': syms[i+1]})) AS p
        |    FROM (SELECT freq, string_split(trim(seq), ' ') AS syms FROM s3))
        |  GROUP BY 1, 2),
        |t4 AS (SELECT 4 AS round,
        |  row_number() OVER (ORDER BY cnt DESC, l, r) AS rnk, l, r, cnt
        |  FROM p4 QUALIFY rnk <= 5)
        |SELECT round::INT AS round, rnk::INT AS "rank", l AS left_sym,
        |  r AS right_sym, cnt AS pair_count
        |FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3 UNION ALL SELECT * FROM t4)""".stripMargin,
    "dd_cdc_dupfrac" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |cs AS (SELECT doc_id, text, n,
        |  list_transform(range(1, n + 1),
        |    i -> ascii(substr(text, i, 1))::BIGINT) AS c
        |  FROM d),
        |hs AS (SELECT doc_id, text, n,
        |  CASE WHEN n >= 8 THEN list_transform(range(8, n + 1), i ->
        |    c[i]*1 + c[i-1]*31 + c[i-2]*961 + c[i-3]*29791 +
        |    c[i-4]*923521 + c[i-5]*28629151 + c[i-6]*887503681 +
        |    c[i-7]*27512614111)
        |  ELSE [] END AS h
        |  FROM cs),
        |bs AS (SELECT doc_id, text, n,
        |  [0::BIGINT] || list_transform(
        |    list_filter(list_transform(range(1, len(h) + 1),
        |        k -> {'pos': k + 7, 'hv': h[k]}),
        |      x -> x.hv % 64 = 0), x -> x.pos)
        |    || [n::BIGINT] AS bounds
        |  FROM hs),
        |ck0 AS (SELECT doc_id, unnest(list_transform(range(1, len(bounds)),
        |    k -> substr(text, (bounds[k] + 1)::INT,
        |                (bounds[k+1] - bounds[k])::INT))) AS chunk
        |  FROM bs),
        |ck AS (SELECT doc_id, md5(chunk) AS ch, length(chunk) AS clen
        |  FROM ck0 WHERE chunk <> ''),
        |dup AS (SELECT ch, count(DISTINCT doc_id) AS nd FROM ck GROUP BY 1)
        |SELECT doc_id, count(*)::BIGINT AS n_chunks,
        |  sum(CASE WHEN nd >= 2 THEN clen ELSE 0 END)::BIGINT AS dup_chars,
        |  sum(clen)::BIGINT AS total_chars,
        |  (sum(CASE WHEN nd >= 2 THEN clen ELSE 0 END)::BIGINT * 1000
        |     // sum(clen)::BIGINT) AS dup_permille
        |FROM ck JOIN dup USING (ch)
        |GROUP BY doc_id""".stripMargin,
    "tx_editdist_pairs" ->
      """WITH p AS (
        |  SELECT doc_id, substr(text, 1, 48) AS pfx FROM documents),
        |ch AS (
        |  SELECT doc_id, pos, CASE pos WHEN 1 THEN substr(pfx, 1, 16)
        |    WHEN 2 THEN substr(pfx, 17, 16) ELSE substr(pfx, 33, 16)
        |  END AS c
        |  FROM p, (SELECT unnest([1, 2, 3]) AS pos)
        |  WHERE c <> ''),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM ch a JOIN ch b
        |    ON a.pos = b.pos AND a.c = b.c AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, levenshtein(pa.pfx, pb.pfx)::INT AS dist
        |FROM cand
        |JOIN p pa ON pa.doc_id = cand.doc_a
        |JOIN p pb ON pb.doc_id = cand.doc_b
        |WHERE levenshtein(pa.pfx, pb.pfx) <= 4""".stripMargin,
    "tx_bigram_nll" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |bg0 AS (
        |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
        |    THEN list_transform(generate_series(1, len(tk) - 1),
        |           i -> tk[i] || ' ' || tk[i + 1])
        |    ELSE [] END) AS bg
        |  FROM tk),
        |docbg AS (
        |  SELECT doc_id, bg, count(*)::BIGINT AS tf FROM bg0 GROUP BY 1, 2),
        |c12 AS (
        |  SELECT bg, split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
        |    sum(tf)::BIGINT AS c12
        |  FROM docbg GROUP BY 1, 2, 3),
        |c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1),
        |c2 AS (SELECT w2, sum(c12)::BIGINT AS c2 FROM c12 GROUP BY 1),
        |tot AS (SELECT sum(c12)::BIGINT AS n FROM c12),
        |model AS (
        |  SELECT bg,
        |    floor((ln(c1.c1 * 5 * n) - ln(c12.c12 * 4 * n + c1.c1 * c2.c2))
        |          * 1000000)::BIGINT AS nll_e6
        |  FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN tot)
        |SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
        |  sum(tf * nll_e6)::BIGINT // sum(tf)::BIGINT AS avg_nll_e6
        |FROM docbg JOIN model USING (bg)
        |GROUP BY 1""".stripMargin,
    "tx_kn_bigram" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |bg0 AS (
        |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
        |    THEN list_transform(generate_series(1, len(tk) - 1),
        |           i -> tk[i] || ' ' || tk[i + 1])
        |    ELSE [] END) AS bg
        |  FROM tk),
        |docbg AS (
        |  SELECT doc_id, bg, count(*)::BIGINT AS tf FROM bg0 GROUP BY 1, 2),
        |c12 AS (
        |  SELECT bg, split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
        |    sum(tf)::BIGINT AS c12
        |  FROM docbg GROUP BY 1, 2, 3),
        |c1 AS (
        |  SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS n1v
        |  FROM c12 GROUP BY 1),
        |n1w AS (SELECT w2, count(*)::BIGINT AS n1w FROM c12 GROUP BY 1),
        |n11 AS (SELECT count(*)::BIGINT AS n11 FROM c12),
        |model AS (
        |  SELECT bg,
        |    (greatest(4 * c12.c12 - 3, 0) * 1000000000) // (4 * c1.c1)
        |      + (3 * c1.n1v * n1w.n1w * 1000000000)
        |        // (4 * c1.c1 * n11.n11) AS p_u9
        |  FROM c12 JOIN c1 USING (w1) JOIN n1w USING (w2) CROSS JOIN n11),
        |scored AS (
        |  SELECT bg, floor(ln(1000000000.0 / p_u9) * 1000000)::BIGINT AS nll_u6
        |  FROM model)
        |SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
        |  sum(tf * nll_u6)::BIGINT // sum(tf)::BIGINT AS avg_nll_u6
        |FROM docbg JOIN scored USING (bg)
        |GROUP BY 1""".stripMargin,
    "tx_bm25" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |dl AS (SELECT doc_id, len(tk)::BIGINT AS dl FROM tk),
        |stats AS (
        |  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl
        |  FROM dl),
        |tf AS (
        |  SELECT t.doc_id, t.tok, count(*)::BIGINT AS tf
        |  FROM (SELECT doc_id, unnest(tk) AS tok FROM tk) t
        |  WHERE t.tok IN ('spark', 'table', 'merge')
        |  GROUP BY 1, 2),
        |dfreq AS (
        |  SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |idf AS (
        |  SELECT tok, floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |    * 1000000.0)::BIGINT AS idf_u6
        |  FROM dfreq CROSS JOIN stats)
        |SELECT tf.doc_id,
        |  sum((idf_u6 * tf * 22 * sum_dl)
        |      // (10 * tf * sum_dl + 3 * sum_dl + 9 * dl * n_docs))::BIGINT
        |    AS score_u6,
        |  count(*) AS n_terms
        |FROM tf
        |JOIN dl ON dl.doc_id = tf.doc_id
        |JOIN idf ON idf.tok = tf.tok
        |CROSS JOIN stats
        |GROUP BY 1""".stripMargin,
    "pipe_corpus_windows" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars, string_split(text, ' ') AS tk
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, n_chars, len(tk) AS n_tokens,
        |    md5(array_to_string(list_sort(list_distinct(tk)), ' ')) AS bag_hash,
        |    CASE WHEN len(tk) >= 2
        |      THEN list_transform(generate_series(1, len(tk) - 1),
        |             i -> tk[i] || ' ' || tk[i + 1])
        |      ELSE [] END AS bigrams,
        |    len(list_filter(tk,
        |      t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop
        |  FROM base),
        |scored AS (
        |  SELECT doc_id, n_tokens, bag_hash,
        |    len(bigrams) AS n_bigrams,
        |    len(list_distinct(bigrams)) AS n_dbg,
        |    floor((least(n_tokens / 100.0, 1.0) * 0.4 +
        |           (1.0 - n_stop / n_tokens) * 0.3 +
        |           least((n_chars - (n_tokens - 1)) / n_tokens / 8.0, 1.0) * 0.3)
        |          * 10000)::BIGINT AS score_bp
        |  FROM feat),
        |keep AS (
        |  SELECT *, min(doc_id) OVER (PARTITION BY bag_hash) AS bag_keeper
        |  FROM scored),
        |pass AS (
        |  SELECT doc_id FROM keep
        |  WHERE NOT (n_tokens < 16) AND NOT (n_dbg * 2 < n_bigrams)
        |    AND doc_id = bag_keeper AND score_bp >= 5000),
        |toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w AS sh
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(tok,2) OVER w IS NOT NULL),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 5),
        |contaminated AS (
        |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON b.sh = s.sh
        |  WHERE s.doc_id >= 5),
        |kept AS (
        |  SELECT d.doc_id, len(string_split(d.text, ' '))::BIGINT AS n_toks
        |  FROM documents d
        |  JOIN pass p ON p.doc_id = d.doc_id
        |  WHERE d.doc_id >= 5
        |    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |c AS (
        |  SELECT doc_id, n_toks,
        |    (sum(n_toks) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |     - n_toks)::BIGINT AS start_tok
        |  FROM kept)
        |SELECT doc_id, n_toks, start_tok,
        |  start_tok // 512 AS win_first,
        |  (start_tok + n_toks - 1) // 512 AS win_last,
        |  (start_tok + n_toks - 1) // 512 - start_tok // 512 + 1
        |    AS n_windows
        |FROM c""".stripMargin,
    "tx_pack" ->
      """WITH s AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_toks,
        |    (sum(n_toks) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |     - n_toks)::BIGINT AS start_tok
        |  FROM s)
        |SELECT doc_id, n_toks, start_tok,
        |  start_tok // 512 AS win_first,
        |  (start_tok + n_toks - 1) // 512 AS win_last,
        |  (start_tok + n_toks - 1) // 512 - start_tok // 512 + 1
        |    AS n_windows
        |FROM c""".stripMargin,
    "tx_pack_windows" ->
      """WITH s AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_toks,
        |    (sum(n_toks) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |     - n_toks)::BIGINT AS start_tok
        |  FROM s),
        |w AS (
        |  SELECT doc_id, n_toks, start_tok,
        |    start_tok // 512 AS win_first,
        |    (start_tok + n_toks - 1) // 512 AS win_last
        |  FROM c),
        |x AS (
        |  SELECT *, unnest(generate_series(win_first, win_last)) AS win
        |  FROM w)
        |SELECT win, count(*) AS n_docs,
        |  sum(least(start_tok + n_toks, (win + 1) * 512)
        |      - greatest(start_tok, win * 512))::BIGINT AS n_tokens,
        |  sum(CASE WHEN win_first < win OR win_last > win
        |           THEN 1 ELSE 0 END)::BIGINT AS n_spanning
        |FROM x GROUP BY win""".stripMargin,
    "tx_vocab_topk" ->
      """WITH c AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |n AS (SELECT lang, tok, count(*) AS n FROM c GROUP BY 1, 2),
        |r AS (SELECT lang, tok, n,
        |        row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok ASC)
        |          AS rank
        |      FROM n)
        |SELECT lang, tok, n, rank FROM r WHERE rank <= 10""".stripMargin,
    "dd_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(lang || '|' || doc_id::VARCHAR), 1, 4))::BIGINT
        |  % 10 = 0""".stripMargin,
    "dd_weighted_sample" ->
      """WITH wd AS (
        |  SELECT doc_id, len(string_split(text, ' ')) // 16 + 1 AS w
        |  FROM documents),
        |pri AS (
        |  SELECT doc_id, max(w)::BIGINT AS w,
        |    max(('0x' || substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),
        |      1, 15))::BIGINT) AS priority
        |  FROM wd CROSS JOIN LATERAL unnest(generate_series(0, w - 1))
        |    AS t(i)
        |  GROUP BY doc_id),
        |r AS (
        |  SELECT *, row_number() OVER
        |    (ORDER BY priority DESC, doc_id ASC) AS rank
        |  FROM pri)
        |SELECT doc_id, w, priority, rank FROM r WHERE rank <= 32""".stripMargin,
    // identical recompute — the imperative aggregate must be
    // element-equal to the relational explode form
    "dd_weighted_sample_agg" ->
      """WITH wd AS (
        |  SELECT doc_id, len(string_split(text, ' ')) // 16 + 1 AS w
        |  FROM documents),
        |pri AS (
        |  SELECT doc_id, max(w)::BIGINT AS w,
        |    max(('0x' || substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),
        |      1, 15))::BIGINT) AS priority
        |  FROM wd CROSS JOIN LATERAL unnest(generate_series(0, w - 1))
        |    AS t(i)
        |  GROUP BY doc_id),
        |r AS (
        |  SELECT *, row_number() OVER
        |    (ORDER BY priority DESC, doc_id ASC) AS rank
        |  FROM pri)
        |SELECT doc_id, w, priority, rank FROM r WHERE rank <= 32""".stripMargin,
    "dd_train_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 8 THEN 'train'
        |       WHEN b = 8 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 10 AS b
        |      FROM documents)""".stripMargin,
    "tx_pii_scrub" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |    text || ' Contact_' || source || '.' || doc_id
        |         || '@Example-' || source || '.com'
        |         || ' ref' || (doc_id * 12345) AS dirty
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, dirty,
        |    regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
        |      '<EMAIL>', 'g') AS no_mail
        |  FROM dirty)
        |SELECT doc_id,
        |  md5(regexp_replace(no_mail, '[0-9][0-9][0-9]+', '<NUM>', 'g'))
        |    AS scrub_digest,
        |  len(regexp_extract_all(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+'))::BIGINT
        |    AS n_emails,
        |  len(regexp_extract_all(no_mail, '[0-9][0-9][0-9]+'))::BIGINT
        |    AS n_digit_runs
        |FROM s""".stripMargin,
    "tx_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w AS sh
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(tok,2) OVER w IS NOT NULL),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 5)
        |SELECT s.doc_id, count(DISTINCT s.sh) AS n_shared
        |FROM sh s JOIN bench b ON b.sh = s.sh
        |WHERE s.doc_id >= 5
        |GROUP BY s.doc_id""".stripMargin,
    "tx_decontaminate_bloom" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w AS sh
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(tok,2) OVER w IS NOT NULL),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 5)
        |SELECT s.doc_id, count(DISTINCT s.sh) AS n_shared
        |FROM sh s JOIN bench b ON b.sh = s.sh
        |WHERE s.doc_id >= 5
        |GROUP BY s.doc_id""".stripMargin,
    "dd_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "dd_source_overlap" ->
      """WITH tk AS (
        |  SELECT source, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT source, g FROM (
        |    SELECT source, unnest(list_transform(
        |      generate_series(1, len(t) - 4),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
        |           t[i+3] || ' ' || t[i+4])) AS g
        |    FROM tk WHERE len(t) >= 5))
        |SELECT a.source AS source_a, b.source AS source_b,
        |  count(*) AS n_shared
        |FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    "dd_mixture_weights" ->
      """WITH per_src AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT sum(n_tokens)::BIGINT AS total_tokens,
        |    count(*) AS n_sources
        |  FROM per_src)
        |SELECT source, n_docs, n_tokens,
        |  total_tokens * 10000 // (n_sources * n_tokens) AS weight_bp
        |FROM per_src CROSS JOIN tot""".stripMargin,
    "tx_token_share" ->
      """WITH per_src AS (
        |  SELECT lang, source,
        |    sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY 1, 2)
        |SELECT lang, row_number() OVER w AS rk, source, n_tokens,
        |  (sum(n_tokens) OVER w)::BIGINT * 10000
        |    // (sum(n_tokens) OVER (PARTITION BY lang))::BIGINT
        |    AS cum_share_bp
        |FROM per_src
        |WINDOW w AS (PARTITION BY lang ORDER BY n_tokens DESC, source ASC)
        |""".stripMargin,
    "dd_minhash_est" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, lang,
        |    ('0x' || substr(md5(tok || ' ' || lead(tok,1) OVER w
        |       || ' ' || lead(tok,2) OVER w), 1, 15))::BIGINT AS h
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(tok,2) OVER w IS NOT NULL),
        |mh AS (
        |  SELECT doc_id, lang,
        |    min(xor(h, 935853755618645598)) AS mh0,
        |    min(xor(h, 886263699231969848)) AS mh1,
        |    min(xor(h, 901255563090117366)) AS mh2,
        |    min(xor(h, 1066434503623691823)) AS mh3,
        |    min(xor(h, 758855882668719729)) AS mh4,
        |    min(xor(h, 1030659900335514164)) AS mh5,
        |    min(xor(h, 101208472399937786)) AS mh6,
        |    min(xor(h, 644382284193898855)) AS mh7
        |  FROM sh GROUP BY doc_id, lang),
        |bands AS (
        |  SELECT doc_id, unnest([
        |    md5(lang || '|' || mh0 || ',' || mh1 || ',' || mh2 || ',' || mh3),
        |    md5(lang || '|' || mh4 || ',' || mh5 || ',' || mh6 || ',' || mh7)
        |  ]) AS band_key FROM mh),
        |cands AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |est AS (
        |  SELECT c.doc_a, c.doc_b,
        |    (CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) AS n_match
        |  FROM cands c
        |  JOIN mh a ON a.doc_id = c.doc_a
        |  JOIN mh b ON b.doc_id = c.doc_b),
        |inter AS (
        |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
        |  FROM cands c
        |  JOIN sh sa ON sa.doc_id = c.doc_a
        |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
        |  GROUP BY 1, 2)
        |SELECT e.doc_a, e.doc_b,
        |  n_match * 10000 // 8 AS est_bp,
        |  n_inter * 10000 // (za.sz + zb.sz - n_inter) AS exact_bp
        |FROM est e
        |JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
        |JOIN sizes za ON za.doc_id = e.doc_a
        |JOIN sizes zb ON zb.doc_id = e.doc_b""".stripMargin,
    "dd_span_dedup" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |win AS (
        |  SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+9], ' ')) AS h
        |  FROM tk, unnest(generate_series(1, len(t) - 9)) AS g(i)
        |  WHERE len(t) >= 10),
        |dup AS (
        |  SELECT h FROM win GROUP BY h HAVING count(DISTINCT doc_id) > 1),
        |hit AS (SELECT doc_id, pos FROM win JOIN dup USING (h)),
        |brk AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |              > 10 THEN 1 ELSE 0 END AS b
        |  FROM hit),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM brk)
        |SELECT doc_id, min(pos)::BIGINT AS span_start,
        |  (max(pos) + 9)::BIGINT AS span_end,
        |  count(*)::BIGINT AS n_windows
        |FROM isl GROUP BY doc_id, island""".stripMargin,
    "dd_minhash_lsh" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents),
        |shingles AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(tok || ' ' || lead(tok,1) OVER w
        |       || ' ' || lead(tok,2) OVER w), 1, 15))::BIGINT AS h
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(tok,2) OVER w IS NOT NULL),
        |mh AS (
        |  SELECT doc_id, lang,
        |    min(xor(h, 935853755618645598)) AS mh0,
        |    min(xor(h, 886263699231969848)) AS mh1,
        |    min(xor(h, 901255563090117366)) AS mh2,
        |    min(xor(h, 1066434503623691823)) AS mh3,
        |    min(xor(h, 758855882668719729)) AS mh4,
        |    min(xor(h, 1030659900335514164)) AS mh5,
        |    min(xor(h, 101208472399937786)) AS mh6,
        |    min(xor(h, 644382284193898855)) AS mh7
        |  FROM shingles GROUP BY doc_id, lang),
        |bands AS (
        |  SELECT doc_id, unnest([
        |    md5(lang || '|' || mh0 || ',' || mh1 || ',' || mh2 || ',' || mh3),
        |    md5(lang || '|' || mh4 || ',' || mh5 || ',' || mh6 || ',' || mh7)
        |  ]) AS band_key
        |  FROM mh)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM bands a JOIN bands b
        |  ON a.band_key = b.band_key AND a.doc_id < b.doc_id""".stripMargin,
    "dd_simhash" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(unnest(string_split(text,' '))),1,4))::INT AS tok_hash
        |  FROM documents),
        |votes AS (
        |  SELECT doc_id, bit,
        |    sum(CASE WHEN (tok_hash >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM t, (SELECT unnest(generate_series(0,15)) AS bit)
        |  GROUP BY doc_id, bit)
        |SELECT doc_id,
        |  sum(CASE WHEN vote > 0 THEN 1 << bit ELSE 0 END)::BIGINT AS simhash
        |FROM votes GROUP BY doc_id""".stripMargin,
    "dd_simhash_pairs" ->
      """WITH t AS (
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
        |  FROM votes GROUP BY doc_id, lang)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  bit_count(xor(a.sig, b.sig)) AS hamming
        |FROM sigs a JOIN sigs b
        |  ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 2""".stripMargin,
    "dd_triangles" ->
      """WITH t AS (
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
        |e AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sigs a JOIN sigs b
        |    ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
        |tri AS (
        |  SELECT count(*)::BIGINT AS n_triangles
        |  FROM e ab
        |  JOIN e bc ON bc.doc_a = ab.doc_b
        |  JOIN e ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b),
        |deg AS (
        |  SELECT v, count(*)::BIGINT AS deg FROM (
        |    SELECT doc_a AS v FROM e UNION ALL SELECT doc_b AS v FROM e)
        |  GROUP BY v),
        |w AS (SELECT sum(deg * (deg - 1) // 2)::BIGINT AS n_wedges FROM deg)
        |SELECT n_triangles, n_wedges,
        |  CASE WHEN n_wedges > 0 THEN n_triangles * 3 * 10000 // n_wedges
        |       ELSE 0 END AS gcc_bp
        |FROM tri CROSS JOIN w""".stripMargin,
    "dd_keeper_corpus" ->
      """WITH t AS (
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
        |dropped AS (
        |  SELECT DISTINCT b.doc_id
        |  FROM sigs a JOIN sigs b
        |    ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.sig, b.sig)) <= 2)
        |SELECT d.doc_id, d.lang FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin,
    "mm_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(text::BLOB) AS byte_len
        |  FROM documents WHERE doc_id < 50 AND octet_length(text::BLOB) > 0),
        |frames AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, byte_len - 1, 40)) AS frame_offset
        |  FROM d)
        |SELECT doc_id, frame_offset FROM frames
        |WHERE (frame_offset // 40) % 3 = 0""".stripMargin,
    "dd_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, n_chars // 10 AS bucket,
        |    unnest(string_split(text,' ')) AS tok,
        |    generate_subscripts(string_split(text,' '),1) AS pos
        |  FROM documents),
        |bigrams AS (
        |  SELECT DISTINCT doc_id, lang, bucket,
        |    tok || ' ' || lead(tok,1) OVER w AS bigram
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(tok,1) OVER w IS NOT NULL),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM bigrams GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |  FROM bigrams a JOIN bigrams b
        |    ON a.lang = b.lang AND a.bucket = b.bucket
        |    AND a.bigram = b.bigram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(n_inter / (sa.sz + sb.sz - n_inter), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE round(n_inter / (sa.sz + sb.sz - n_inter), 4) >= 0.5""".stripMargin,
    "dd_embcos_neardup" ->
      """WITH f AS (
        |  SELECT vec_id, label,
        |    generate_subscripts(embedding,1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |dots AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |    sum(a.qv * b.qv)::DOUBLE AS dot
        |  FROM f a JOIN f b ON a.label = b.label AND a.idx = b.idx
        |    AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |norms AS (
        |  SELECT vec_id, sqrt(sum(qv * qv)::DOUBLE) AS norm FROM f GROUP BY 1)
        |SELECT va, vb, round(dot / (na.norm * nb.norm), 4) AS cosine
        |FROM dots JOIN norms na ON na.vec_id = va
        |JOIN norms nb ON nb.vec_id = vb
        |WHERE round(dot / (na.norm * nb.norm), 4) >= 0.3""".stripMargin,
    "sim_topk_bf" ->
      """WITH f AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |dots AS (
        |  SELECT q.vec_id AS qid, n.vec_id AS nid,
        |    sum(q.qv * n.qv)::DOUBLE AS dot
        |  FROM f q JOIN f n ON q.idx = n.idx AND q.vec_id <> n.vec_id
        |  WHERE q.vec_id < 20
        |  GROUP BY 1, 2),
        |norms AS (
        |  SELECT vec_id, sqrt(sum(qv * qv)::DOUBLE) AS norm FROM f GROUP BY 1),
        |scored AS (
        |  SELECT qid, nid, round(dot / (nq.norm * nn.norm), 4) AS cosine
        |  FROM dots JOIN norms nq ON nq.vec_id = qid
        |  JOIN norms nn ON nn.vec_id = nid)
        |SELECT qid, nid, cosine, rank FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    "sim_lsh_bucket" ->
      """WITH planes AS (
        |  SELECT p.plane, d.dim,
        |    ('0x' || substr(md5(p.plane || ',' || d.dim),1,4))::INT % 16 - 8 AS w
        |  FROM (SELECT unnest(generate_series(0,7)) AS plane) p,
        |       (SELECT unnest(generate_series(0,63)) AS dim) d),
        |f AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) - 1 AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |dots AS (
        |  SELECT vec_id, plane, sum(qv * w) AS dot
        |  FROM f JOIN planes ON idx = dim
        |  GROUP BY 1, 2)
        |SELECT vec_id,
        |  sum(CASE WHEN dot > 0 THEN 1 << plane::INT ELSE 0 END)::BIGINT AS bucket
        |FROM dots GROUP BY vec_id""".stripMargin,
    "sim_lsh_topk" ->
      """WITH planes AS (
        |  SELECT p.plane, d.dim,
        |    ('0x' || substr(md5(p.plane || ',' || d.dim),1,4))::INT % 16 - 8 AS w
        |  FROM (SELECT unnest(generate_series(0,7)) AS plane) p,
        |       (SELECT unnest(generate_series(0,63)) AS dim) d),
        |f AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) - 1 AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |pdots AS (
        |  SELECT vec_id, plane, sum(qv * w) AS dot
        |  FROM f JOIN planes ON idx = dim
        |  GROUP BY 1, 2),
        |buckets AS (
        |  SELECT vec_id,
        |    sum(CASE WHEN dot > 0 THEN 1 << plane::INT ELSE 0 END)::BIGINT AS bucket
        |  FROM pdots GROUP BY vec_id),
        |norms AS (
        |  SELECT vec_id, sqrt(sum(qv * qv)::DOUBLE) AS norm FROM f GROUP BY 1),
        |cand AS (
        |  SELECT q.vec_id AS qid, n.vec_id AS nid,
        |    sum(q.qv * n.qv)::DOUBLE AS dot
        |  FROM f q JOIN f n ON q.idx = n.idx AND q.vec_id <> n.vec_id
        |  JOIN buckets bq ON bq.vec_id = q.vec_id
        |  JOIN buckets bn ON bn.vec_id = n.vec_id AND bq.bucket = bn.bucket
        |  WHERE q.vec_id < 20
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT qid, nid, round(dot / (nq.norm * nn.norm), 4) AS cosine
        |  FROM cand JOIN norms nq ON nq.vec_id = qid
        |  JOIN norms nn ON nn.vec_id = nid)
        |SELECT qid, nid, cosine, rank FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 3""".stripMargin,
    "sim_quantize" ->
      """WITH base AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings),
        |scaled AS (
        |  SELECT vec_id, de,
        |    list_max(list_transform(de, x -> abs(x))) AS scale
        |  FROM base),
        |quant AS (
        |  SELECT vec_id, scale,
        |    CASE WHEN scale > 0
        |      THEN list_transform(de, x -> floor(x / scale * 127)::BIGINT)
        |      ELSE list_transform(de, x -> 0::BIGINT) END AS q
        |  FROM scaled)
        |SELECT vec_id,
        |  floor(scale * 1000000)::BIGINT AS scale_e6,
        |  list_sum(q)::BIGINT AS q_sum,
        |  list_min(q) AS q_min,
        |  list_max(q) AS q_max,
        |  md5(array_to_string(q, ',')) AS q_digest
        |FROM quant""".stripMargin,
    "tx_langid" ->
      """WITH markers(m_lang, marker) AS (VALUES
        |  ('en','the'),('en','a'),('en','fast'),
        |  ('es','value'),('es','data'),
        |  ('de','join'),('de','merge'),
        |  ('fr','stream'),('fr','batch'),
        |  ('zh','spark'),('zh','vector')),
        |votes AS (
        |  SELECT doc_id, m_lang, count(*) AS hits
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS tok
        |        FROM documents) t
        |  JOIN markers ON tok = marker
        |  GROUP BY 1, 2)
        |SELECT doc_id, m_lang AS predicted_lang, hits FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY hits DESC, m_lang ASC) AS rn
        |  FROM votes)
        |WHERE rn = 1""".stripMargin,
    "tx_lang_confusion" ->
      """WITH markers(m_lang, marker) AS (VALUES
        |  ('en','the'),('en','a'),('en','fast'),
        |  ('es','value'),('es','data'),
        |  ('de','join'),('de','merge'),
        |  ('fr','stream'),('fr','batch'),
        |  ('zh','spark'),('zh','vector')),
        |votes AS (
        |  SELECT doc_id, m_lang, count(*) AS hits
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS tok
        |        FROM documents) t
        |  JOIN markers ON tok = marker
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT doc_id, m_lang AS predicted_lang FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY hits DESC, m_lang ASC) AS rn
        |    FROM votes)
        |  WHERE rn = 1)
        |SELECT d.lang, coalesce(p.predicted_lang, 'unknown') AS predicted,
        |  count(*) AS n_docs
        |FROM documents d LEFT JOIN pred p ON p.doc_id = d.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "tx_quality" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars,
        |    len(string_split(text,' ')) AS n_tokens,
        |    len(list_filter(string_split(text,' '),
        |        t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop
        |  FROM documents),
        |derived AS (
        |  SELECT doc_id, n_tokens,
        |    n_stop / n_tokens AS stop_ratio_raw,
        |    (n_chars - (n_tokens - 1)) / n_tokens AS avg_len_raw
        |  FROM base),
        |scored AS (
        |  SELECT doc_id, n_tokens, stop_ratio_raw, avg_len_raw,
        |    least(n_tokens / 100.0, 1.0) * 0.4 +
        |    (1.0 - stop_ratio_raw) * 0.3 +
        |    least(avg_len_raw / 8.0, 1.0) * 0.3 AS score_raw
        |  FROM derived)
        |SELECT doc_id, n_tokens,
        |  floor(stop_ratio_raw * 10000)::BIGINT AS stopword_bp,
        |  floor(avg_len_raw * 100)::BIGINT AS avg_token_len_c,
        |  floor(score_raw * 10000)::BIGINT AS score_bp,
        |  CASE WHEN score_raw >= 0.7 THEN 'high'
        |       WHEN score_raw >= 0.5 THEN 'medium'
        |       ELSE 'low' END AS band
        |FROM scored""".stripMargin,
    "tx_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    CASE WHEN len(tk) >= 2
        |      THEN list_transform(generate_series(1, len(tk) - 1),
        |             i -> tk[i] || ' ' || tk[i + 1])
        |      ELSE [] END AS bigrams
        |  FROM base)
        |SELECT doc_id, len(bigrams)::BIGINT AS n_bigrams,
        |  len(list_distinct(bigrams))::BIGINT AS n_distinct,
        |  len(list_distinct(bigrams)) * 2 < len(bigrams) AS repetitive
        |FROM bg""".stripMargin,
    "tx_ngram_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |tok AS (SELECT doc_id, len(tk)::BIGINT AS n_tokens FROM base),
        |g2 AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)-1),
        |    i -> tk[i] || ' ' || tk[i+1])) AS g
        |  FROM base WHERE len(tk) >= 2),
        |t2 AS (
        |  SELECT doc_id, max(c)::BIGINT AS top2_cnt FROM (
        |    SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2)
        |  GROUP BY 1),
        |g3 AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)-2),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
        |  FROM base WHERE len(tk) >= 3),
        |t3 AS (
        |  SELECT doc_id, max(c)::BIGINT AS top3_cnt FROM (
        |    SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT tok.doc_id, n_tokens,
        |  coalesce(top2_cnt, 0) AS top2_cnt,
        |  coalesce(top3_cnt, 0) AS top3_cnt,
        |  coalesce(top2_cnt, 0) * 2 * 10000 // n_tokens AS top2_bp,
        |  coalesce(top3_cnt, 0) * 3 * 10000 // n_tokens AS top3_bp
        |FROM tok LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
        |""".stripMargin,
    "tx_tfidf" ->
      """WITH tfs AS (
        |  SELECT doc_id, tok, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents) t
        |  GROUP BY 1, 2),
        |dfs AS (SELECT tok, count(*) AS df FROM tfs GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tok, tfs.tf, dfs.df,
        |    floor(tfs.tf * ln(n_docs / dfs.df) * 10000)::BIGINT AS score_e4
        |  FROM tfs JOIN dfs USING (tok) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score_e4 DESC, tok ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, tok, tf, df, score_e4
        |FROM ranked WHERE rk <= 3""".stripMargin,
    "tx_corpus_gate" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars, string_split(text, ' ') AS tk
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, n_chars, len(tk) AS n_tokens,
        |    md5(array_to_string(list_sort(list_distinct(tk)), ' ')) AS bag_hash,
        |    CASE WHEN len(tk) >= 2
        |      THEN list_transform(generate_series(1, len(tk) - 1),
        |             i -> tk[i] || ' ' || tk[i + 1])
        |      ELSE [] END AS bigrams,
        |    len(list_filter(tk,
        |      t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop
        |  FROM base),
        |scored AS (
        |  SELECT doc_id, n_tokens, bag_hash,
        |    len(bigrams) AS n_bigrams,
        |    len(list_distinct(bigrams)) AS n_dbg,
        |    floor((least(n_tokens / 100.0, 1.0) * 0.4 +
        |           (1.0 - n_stop / n_tokens) * 0.3 +
        |           least((n_chars - (n_tokens - 1)) / n_tokens / 8.0, 1.0) * 0.3)
        |          * 10000)::BIGINT AS score_bp
        |  FROM feat),
        |keep AS (
        |  SELECT *, min(doc_id) OVER (PARTITION BY bag_hash) AS bag_keeper
        |  FROM scored)
        |SELECT doc_id,
        |  CASE WHEN n_tokens < 16 THEN 'too_short'
        |       WHEN n_dbg * 2 < n_bigrams THEN 'repetitive'
        |       WHEN doc_id != bag_keeper THEN 'bag_dup'
        |       WHEN score_bp < 5000 THEN 'low_quality'
        |       ELSE 'pass' END AS verdict,
        |  score_bp
        |FROM keep""".stripMargin,
    "tx_bpe_pretokenize" ->
      """SELECT source,
        |  sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')))::BIGINT AS pre_tokens,
        |  sum(len(regexp_extract_all(text, '[0-9]+')))::BIGINT AS num_tokens
        |FROM documents GROUP BY source""".stripMargin,
    "tx_token_count" ->
      """WITH t AS (
        |  SELECT source, unnest(string_split(text,' ')) AS tok
        |  FROM documents)
        |SELECT source, count(*) AS total_tokens,
        |  count(DISTINCT tok) AS distinct_tokens
        |FROM t GROUP BY source""".stripMargin,
    "tx_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS fingerprint,
        |  ('0x' || substr(md5(norm),1,15))::BIGINT AS fp_int
        |FROM n""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(text::BLOB) AS byte_len,
        |  md5(text) AS digest,
        |  substr(base64(text::BLOB), 1, 8) AS magic
        |FROM documents""".stripMargin,
    // arithmetic twin of the PNG round trip: same pixel formula,
    // no codec involved
    "mm_bmp_luma" ->
      """WITH d AS (
        |  SELECT doc_id AS id, 5 + doc_id % 6 AS w, 4 + doc_id % 5 AS h
        |  FROM documents WHERE doc_id < 200),
        |xs AS (SELECT id, w, h, unnest(generate_series(0, w - 1)) AS x
        |       FROM d),
        |px AS (SELECT id, w, h, x, unnest(generate_series(0, h - 1)) AS y
        |       FROM xs),
        |l AS (
        |  SELECT id, w, h,
        |    sum(299 * ((id * 3 + x * 7 + y * 13) % 256)
        |      + 587 * ((id * 2 + x * 5 + y * 11) % 256)
        |      + 114 * ((id + x * 3 + y * 7) % 256))::BIGINT AS lsum
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT id AS doc_id, w::INT AS width, h::INT AS height,
        |  (lsum // (w * h))::BIGINT AS luma_milli
        |FROM l""".stripMargin,
    "mm_wav_energy" ->
      """WITH d AS (
        |  SELECT doc_id AS id, 500 + doc_id % 1000 AS n,
        |    8000 + (doc_id % 4) * 4000 AS rate
        |  FROM documents WHERE doc_id < 200),
        |s AS (
        |  SELECT id, n, rate, unnest(generate_series(0, n - 1)) AS i
        |  FROM d),
        |agg AS (
        |  SELECT id, max(n) AS n, max(rate) AS rate,
        |    sum(((id * 37 + i * i) % 65536 - 32768)
        |        * ((id * 37 + i * i) % 65536 - 32768))::BIGINT AS ss
        |  FROM s GROUP BY 1)
        |SELECT id AS doc_id, rate::INT AS sample_rate, 1::INT AS channels,
        |  ((n * 1000) // rate)::BIGINT AS duration_ms,
        |  (((ss * 1000) // n) // 1073741824)::BIGINT AS energy_milli
        |FROM agg""".stripMargin,
    "mm_wav_features" ->
      """WITH d AS (
        |  SELECT doc_id AS id, 500 + doc_id % 1000 AS n
        |  FROM documents WHERE doc_id < 200),
        |s AS (
        |  SELECT id, unnest(generate_series(0, n - 1)) AS i FROM d),
        |v AS (
        |  SELECT id, i, (id * 37 + i * i) % 65536 - 32768 AS v FROM s),
        |zc AS (
        |  SELECT id, i, v,
        |    CASE WHEN lag(v) OVER w IS NOT NULL
        |          AND (v >= 0) != (lag(v) OVER w >= 0)
        |         THEN 1 ELSE 0 END AS z
        |  FROM v WINDOW w AS (PARTITION BY id ORDER BY i))
        |SELECT id AS doc_id, count(*)::BIGINT AS n_samples,
        |  sum(z)::BIGINT AS zero_cross,
        |  max(abs(v))::BIGINT AS peak_abs,
        |  sum(CASE WHEN (i // 8) % 2 = 0 THEN v ELSE -v END)::BIGINT
        |    AS sq_corr
        |FROM zc GROUP BY id""".stripMargin,
    "mm_ahash" ->
      """WITH g AS (SELECT unnest(range(8)) AS v),
        |cells AS (
        |  SELECT d.doc_id, (8 + d.doc_id % 9) AS w, (8 + d.doc_id % 7) AS h,
        |    gx.v AS x, gy.v AS y
        |  FROM documents d, g gx, g gy WHERE d.doc_id < 200),
        |px AS (
        |  SELECT doc_id, w, h, x, y,
        |    (doc_id * 31 + ((y * h) // 8) * w + ((x * w) // 8)) % 256 AS p
        |  FROM cells),
        |m AS (SELECT doc_id, sum(p) AS s FROM px GROUP BY 1),
        |bits AS (
        |  SELECT px.doc_id, px.w, px.h, y * 8 + x AS j,
        |    CASE WHEN p * 64 >= s THEN 1 ELSE 0 END AS bit
        |  FROM px JOIN m ON m.doc_id = px.doc_id)
        |SELECT doc_id, w::INT AS width, h::INT AS height,
        |  sum(CASE WHEN j >= 32 THEN bit * (1::BIGINT << (j - 32))
        |           ELSE 0 END)::BIGINT AS ahash_hi,
        |  sum(CASE WHEN j < 32 THEN bit * (1::BIGINT << j)
        |           ELSE 0 END)::BIGINT AS ahash_lo
        |FROM bits GROUP BY 1, 2, 3""".stripMargin,
    "mm_ahash_pairs" ->
      """WITH g AS (SELECT unnest(range(8)) AS v),
        |imgs AS (
        |  SELECT d.doc_id AS id, d.doc_id + off AS media_id,
        |    (8 + d.doc_id % 9) AS w, (8 + d.doc_id % 7) AS h, off
        |  FROM documents d, (SELECT unnest([0, 1000]) AS off) ms
        |  WHERE d.doc_id < 100),
        |cells AS (
        |  SELECT i.*, gx.v AS x, gy.v AS y,
        |    ((gy.v * h) // 8) * w + ((gx.v * w) // 8) AS idx
        |  FROM imgs i, g gx, g gy),
        |px AS (
        |  SELECT media_id, x, y,
        |    CASE WHEN off = 1000 AND idx = id % (w * h)
        |         THEN ((id * 31 + idx + (idx * idx % 257) * 5) % 256 + 8) % 256
        |         ELSE (id * 31 + idx + (idx * idx % 257) * 5) % 256 END AS p
        |  FROM cells),
        |m AS (SELECT media_id, sum(p) AS s FROM px GROUP BY 1),
        |bits AS (
        |  SELECT px.media_id, y * 8 + x AS j,
        |    CASE WHEN p * 64 >= s THEN 1 ELSE 0 END AS bit
        |  FROM px JOIN m USING (media_id)),
        |hl AS (
        |  SELECT media_id,
        |    sum(CASE WHEN j >= 32 THEN bit * (1::BIGINT << (j - 32))
        |             ELSE 0 END)::BIGINT AS hi,
        |    sum(CASE WHEN j < 32 THEN bit * (1::BIGINT << j)
        |             ELSE 0 END)::BIGINT AS lo
        |  FROM bits GROUP BY 1),
        |bands AS (
        |  SELECT media_id, hi, lo, b,
        |    CASE b WHEN 0 THEN lo % 65536 WHEN 1 THEN (lo // 65536) % 65536
        |           WHEN 2 THEN hi % 65536 ELSE (hi // 65536) % 65536
        |    END AS val
        |  FROM hl, (SELECT unnest(range(4)) AS b) bb)
        |SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
        |  (bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)))::INT
        |    AS hamming
        |FROM bands x JOIN bands y
        |  ON x.b = y.b AND x.val = y.val AND x.media_id < y.media_id
        |WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) <= 8
        |""".stripMargin,
    // same arithmetic shape as mm_png_luma: grey palette makes
    // luma(v) = v, so the decode chain must reproduce the integer
    // pixel mean exactly (delays fixed 4/5/6 cs in frame order)
    "mm_gif_luma" ->
      """WITH s AS (SELECT unnest(range(48)) AS i),
        |px AS (
        |  SELECT d.doc_id, (4 + d.doc_id % 5) AS w, (3 + d.doc_id % 4) AS h, s.i
        |  FROM documents d, s
        |  WHERE d.doc_id < 200 AND s.i < (4 + d.doc_id % 5) * (3 + d.doc_id % 4))
        |SELECT doc_id, w::INT AS width, h::INT AS height,
        |  (sum((doc_id*53 + i*7) % 256) * 1000 // (w * h))::BIGINT AS luma_milli
        |FROM px GROUP BY doc_id, w, h""".stripMargin,
    "mm_gif_frames" ->
      """WITH fs AS (SELECT unnest(range(3)) AS f),
        |s AS (SELECT unnest(range(80)) AS i),
        |px AS (
        |  SELECT d.doc_id, fs.f, (5 + d.doc_id % 6) AS w,
        |         (4 + d.doc_id % 5) AS h, s.i
        |  FROM documents d, fs, s
        |  WHERE d.doc_id < 100
        |    AND s.i < (5 + d.doc_id % 6) * (4 + d.doc_id % 5))
        |SELECT doc_id, f::INT AS frame_no, w::INT AS width, h::INT AS height,
        |  (4 + f)::INT AS delay_cs,
        |  (sum((doc_id*31 + f*17 + i*3) % 256) * 1000 // (w * h))::BIGINT
        |    AS luma_milli
        |FROM px GROUP BY doc_id, f, w, h""".stripMargin,
    "mm_qoi_luma" ->
      """WITH s AS (SELECT unnest(range(48)) AS i),
        |px AS (
        |  SELECT d.doc_id, (4 + d.doc_id % 5) AS w, (3 + d.doc_id % 4) AS h, s.i
        |  FROM documents d, s
        |  WHERE d.doc_id < 200 AND s.i < (4 + d.doc_id % 5) * (3 + d.doc_id % 4))
        |SELECT doc_id, w::INT AS width, h::INT AS height,
        |  (sum((doc_id*37 + (i//5)*29 +
        |        CASE WHEN i%5 IN (2,3) THEN 100 ELSE 0 END) % 256)
        |     * 1000 // (w * h))::BIGINT AS luma_milli
        |FROM px GROUP BY doc_id, w, h""".stripMargin,
    "mm_png_luma" ->
      """WITH s AS (SELECT unnest(range(48)) AS i),
        |px AS (
        |  SELECT d.doc_id, (4 + d.doc_id % 5) AS w, (3 + d.doc_id % 4) AS h, s.i
        |  FROM documents d, s
        |  WHERE d.doc_id < 200 AND s.i < (4 + d.doc_id % 5) * (3 + d.doc_id % 4))
        |SELECT doc_id, w::INT AS width, h::INT AS height,
        |  (sum((doc_id*31 + i) % 256) * 1000 // (w * h))::BIGINT AS luma_milli
        |FROM px GROUP BY doc_id, w, h""".stripMargin,
    // arithmetic twin of the JPEG round trip: every visible block is
    // the solid value dc(bx,by)+128, weighted by its cropped area
    "mm_mjpeg_frames" ->
      """WITH fs AS (SELECT unnest(range(4)) AS f),
        |bxs AS (SELECT unnest(range(3)) AS bx),
        |bys AS (SELECT unnest(range(2)) AS by),
        |blk AS (
        |  SELECT d.doc_id, fs.f, (9 + d.doc_id % 12) AS w,
        |         (9 + d.doc_id % 7) AS h, bxs.bx, bys.by
        |  FROM documents d, fs, bxs, bys
        |  WHERE d.doc_id < 100
        |    AND bxs.bx * 8 < (9 + d.doc_id % 12)
        |    AND bys.by * 8 < (9 + d.doc_id % 7))
        |SELECT doc_id, f::INT AS frame_no, w::INT AS width,
        |  h::INT AS height,
        |  (sum(((doc_id*7 + f*11 + bx*13 + by*29) % 32 - 16 + 128)
        |       * least(8, w - bx*8) * least(8, h - by*8))
        |     * 1000 // (w * h))::BIGINT AS luma_milli
        |FROM blk GROUP BY doc_id, f, w, h""".stripMargin,
    // the same arithmetic frame-luma twin, then a per-video lag —
    // threshold mirrored from SceneCutMilli
    "mm_scene_cuts" ->
      """WITH fs AS (SELECT unnest(range(4)) AS f),
        |bxs AS (SELECT unnest(range(3)) AS bx),
        |bys AS (SELECT unnest(range(2)) AS by),
        |blk AS (
        |  SELECT d.doc_id, fs.f, (9 + d.doc_id % 12) AS w,
        |         (9 + d.doc_id % 7) AS h, bxs.bx, bys.by
        |  FROM documents d, fs, bxs, bys
        |  WHERE d.doc_id < 100
        |    AND bxs.bx * 8 < (9 + d.doc_id % 12)
        |    AND bys.by * 8 < (9 + d.doc_id % 7)),
        |fl AS (
        |  SELECT doc_id, f::INT AS frame_no,
        |    (sum(((doc_id*7 + f*11 + bx*13 + by*29) % 32 - 16 + 128)
        |         * least(8, w - bx*8) * least(8, h - by*8))
        |       * 1000 // (w * h))::BIGINT AS luma_milli
        |  FROM blk GROUP BY doc_id, f, w, h),
        |dl AS (
        |  SELECT doc_id, frame_no,
        |    abs(luma_milli - lag(luma_milli) OVER (
        |      PARTITION BY doc_id ORDER BY frame_no)) AS delta_milli
        |  FROM fl)
        |SELECT doc_id, frame_no, delta_milli::BIGINT AS delta_milli,
        |  CASE WHEN delta_milli >= 5000 THEN 1 ELSE 0 END AS is_cut
        |FROM dl WHERE delta_milli IS NOT NULL""".stripMargin,
    // arithmetic twin of the VP8L decode: grey palette-free pixels,
    // luma(v) = v, plateau formula mirrored exactly
    "mm_webp_luma" ->
      """WITH dims AS (
        |  SELECT doc_id, (5 + doc_id % 6) AS w, (4 + doc_id % 5) AS h
        |  FROM documents WHERE doc_id < 200),
        |px AS (
        |  SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM dims),
        |v AS (
        |  SELECT doc_id, w, h,
        |    (doc_id * 29 + (i - i % 5) * 11) % 256 AS val
        |  FROM px)
        |SELECT doc_id, w::INT AS width, h::INT AS height,
        |  (sum(1000 * val) // (w * h))::BIGINT AS luma_milli
        |FROM v GROUP BY doc_id, w, h""".stripMargin,
    "mm_jpeg_luma" ->
      """WITH bxs AS (SELECT unnest(range(3)) AS bx),
        |bys AS (SELECT unnest(range(2)) AS by),
        |blk AS (
        |  SELECT d.doc_id, (9 + d.doc_id % 12) AS w, (9 + d.doc_id % 7) AS h,
        |         bxs.bx, bys.by
        |  FROM documents d, bxs, bys
        |  WHERE d.doc_id < 200
        |    AND bxs.bx * 8 < (9 + d.doc_id % 12)
        |    AND bys.by * 8 < (9 + d.doc_id % 7))
        |SELECT doc_id, w::INT AS width, h::INT AS height,
        |  (sum(((doc_id*7 + bx*13 + by*29) % 32 - 16 + 128)
        |       * least(8, w - bx*8) * least(8, h - by*8))
        |     * 1000 // (w * h))::BIGINT AS luma_milli
        |FROM blk GROUP BY doc_id, w, h""".stripMargin,
    // arithmetic twin of the progressive decode: DC-only blocks at
    // quant 8 are solid dc+128, averaged over the visible crop
    "mm_jpeg_progressive" ->
      """WITH bxs AS (SELECT unnest(range(3)) AS bx),
        |bys AS (SELECT unnest(range(2)) AS by),
        |blk AS (
        |  SELECT d.doc_id, (9 + d.doc_id % 12) AS w, (9 + d.doc_id % 7) AS h,
        |         bxs.bx, bys.by
        |  FROM documents d, bxs, bys
        |  WHERE d.doc_id < 200
        |    AND bxs.bx * 8 < (9 + d.doc_id % 12)
        |    AND bys.by * 8 < (9 + d.doc_id % 7))
        |SELECT doc_id, w::INT AS width, h::INT AS height,
        |  (sum(((doc_id*5 + bx*11 + by*23) % 48 - 24 + 128)
        |       * least(8, w - bx*8) * least(8, h - by*8))
        |     * 1000 // (w * h))::BIGINT AS luma_milli
        |FROM blk GROUP BY doc_id, w, h""".stripMargin,
    // arithmetic twin of the MP4 keyframe index: every 3rd sample is
    // a sync; chunks of 2 uniform-size samples at 4096-spaced offsets
    "mm_mp4_keyframes" ->
      """WITH s AS (SELECT unnest(range(1, 11)) AS sn)
        |SELECT d.doc_id, sn::INT AS sample_no,
        |  (1000 + ((sn - 1) // 2) * 4096
        |    + ((sn - 1) % 2) * (100 + (d.doc_id % 7) * 10))::BIGINT
        |    AS byte_offset
        |FROM documents d, s
        |WHERE d.doc_id < 120 AND sn <= 6 + d.doc_id % 5
        |  AND (sn - 1) % 3 = 0""".stripMargin,
    // arithmetic twin of the MP4/JPEG build→parse round trip
    "mm_container_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'jpeg' END AS fmt,
        |  (160 + doc_id % 17)::INT AS width,
        |  (90 + doc_id % 11)::INT AS height,
        |  (CASE WHEN doc_id % 2 = 0 THEN (doc_id + 1) * 1000 ELSE 0 END)::BIGINT
        |    AS duration_ms
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "tx_zipf_slope" ->
      """WITH c AS (
        |  SELECT lang, tok, count(*) AS n
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |        FROM documents) t
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, n,
        |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok ASC)
        |      AS rank
        |  FROM c),
        |f AS (
        |  SELECT lang,
        |    floor(ln(rank) * 10000)::BIGINT AS x,
        |    floor(ln(n) * 10000)::BIGINT AS y
        |  FROM r WHERE rank <= 100),
        |a AS (
        |  SELECT lang, count(*)::BIGINT AS cnt,
        |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |    sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
        |  FROM f GROUP BY 1)
        |SELECT lang, cnt,
        |  ((sx * sy - cnt * sxy) * 10000 // (cnt * sxx - sx * sx))::BIGINT
        |    AS neg_slope_bp
        |FROM a""".stripMargin,
    "tx_source_kl" ->
      """WITH tokf AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, count(*) AS cw FROM tokf GROUP BY 1),
        |vocab AS (
        |  SELECT tok, cw FROM (
        |    SELECT tok, cw,
        |      row_number() OVER (ORDER BY cw DESC, tok ASC) AS r
        |    FROM v) rv
        |  WHERE r <= 100),
        |vtot AS (SELECT sum(cw)::BIGINT AS c_tot FROM vocab),
        |src AS (
        |  SELECT t.source, t.tok, vocab.cw, count(*)::BIGINT AS csw
        |  FROM tokf t JOIN vocab USING (tok) GROUP BY 1, 2, 3),
        |stot AS (
        |  SELECT source, sum(csw)::BIGINT AS s_tot FROM src GROUP BY 1)
        |SELECT s.source, max(st.s_tot)::BIGINT AS s_tot,
        |  sum(s.csw * floor((ln((s.csw * c_tot)::DOUBLE)
        |      - ln((s.cw * st.s_tot)::DOUBLE)) * 1000000)::BIGINT)::BIGINT
        |    AS kl_mnat
        |FROM src s JOIN stot st USING (source) CROSS JOIN vtot
        |GROUP BY 1""".stripMargin,
    "dd_split_leakage" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
        |        ' ')) AS content_hash,
        |    CASE WHEN b < 8 THEN 'train'
        |         WHEN b = 8 THEN 'validation'
        |         ELSE 'test' END AS split
        |  FROM (SELECT doc_id, text,
        |          ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 10 AS b
        |        FROM documents))
        |SELECT content_hash,
        |  count(DISTINCT split)::BIGINT AS n_splits,
        |  array_to_string(list_sort(list(DISTINCT split)), ',') AS splits,
        |  count(*)::BIGINT AS n_docs,
        |  min(doc_id) AS keeper
        |FROM s GROUP BY content_hash
        |HAVING count(DISTINCT split) > 1""".stripMargin,
    "tx_unigram_logprob" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents) t
        |  GROUP BY 1, 2),
        |vocab AS (SELECT tok, sum(tf)::BIGINT AS cnt FROM tf GROUP BY 1),
        |tot AS (SELECT sum(cnt)::BIGINT AS total FROM vocab),
        |nll AS (
        |  SELECT tok, floor((ln(total) - ln(cnt)) * 1000000)::BIGINT AS nll_e6
        |  FROM vocab CROSS JOIN tot)
        |SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
        |  (sum(tf * nll_e6) // sum(tf))::BIGINT AS avg_nll_e6
        |FROM tf JOIN nll USING (tok)
        |GROUP BY doc_id""".stripMargin,
    "tx_dup_window_frac" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |win AS (
        |  SELECT doc_id, md5(array_to_string(t[i:i+9], ' ')) AS h
        |  FROM tk, unnest(generate_series(1, len(t) - 9)) AS g(i)
        |  WHERE len(t) >= 10),
        |c AS (SELECT doc_id, h, count(*) AS c FROM win GROUP BY 1, 2)
        |SELECT doc_id, sum(c)::BIGINT AS n_windows,
        |  sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS n_dup,
        |  (sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 10000 // sum(c))::BIGINT
        |    AS dup_bp
        |FROM c GROUP BY doc_id""".stripMargin,
    "tx_length_percentiles" ->
      """WITH c AS (
        |  SELECT lang, len(string_split(text, ' '))::BIGINT AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT lang, n_tokens,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM c)
        |SELECT lang, max(n)::BIGINT AS n_docs,
        |  max(CASE WHEN rn = ceil(n * 0.25) THEN n_tokens END) AS p25,
        |  max(CASE WHEN rn = ceil(n * 0.5) THEN n_tokens END) AS p50,
        |  max(CASE WHEN rn = ceil(n * 0.75) THEN n_tokens END) AS p75,
        |  max(CASE WHEN rn = ceil(n * 0.9) THEN n_tokens END) AS p90
        |FROM r GROUP BY lang""".stripMargin,
    "sim_centroid_outlier" ->
      """WITH f AS (
        |  SELECT vec_id, label, generate_subscripts(embedding,1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |cent AS (SELECT label, idx, sum(qv) AS sq, count(*) AS nq
        |         FROM f GROUP BY 1, 2),
        |centq AS (SELECT label, idx, (sq - sq % nq) // nq AS cq FROM cent),
        |cn AS (SELECT label, sqrt(sum(cq * cq)::DOUBLE) AS cnorm
        |       FROM centq GROUP BY 1),
        |norms AS (SELECT vec_id, sqrt(sum(qv * qv)::DOUBLE) AS norm
        |          FROM f GROUP BY 1),
        |dots AS (
        |  SELECT f.vec_id, f.label, sum(f.qv * c.cq)::DOUBLE AS dot
        |  FROM f JOIN centq c ON c.label = f.label AND c.idx = f.idx
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.label, d.vec_id,
        |    round(dot / (n.norm * cn.cnorm), 4) AS cosine
        |  FROM dots d JOIN norms n ON n.vec_id = d.vec_id
        |  JOIN cn ON cn.label = d.label)
        |SELECT label, vec_id, cosine, rank FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY label ORDER BY cosine ASC, vec_id ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 3""".stripMargin,
    "dd_semantic_dedup" ->
      """WITH f AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |lab AS (
        |  SELECT vec_id, label, generate_subscripts(embedding,1) AS idx,
        |    floor(unnest(embedding)::DOUBLE * 1000000)::BIGINT AS qv
        |  FROM embeddings),
        |cent AS (SELECT label AS clabel, idx, sum(qv) AS sq, count(*) AS nq
        |         FROM lab GROUP BY 1, 2),
        |centq AS (SELECT clabel, idx, (sq - sq % nq) // nq AS cq FROM cent),
        |cn AS (SELECT clabel, sqrt(sum(cq * cq)::DOUBLE) AS cnorm
        |       FROM centq GROUP BY 1),
        |norms AS (SELECT vec_id, sqrt(sum(qv * qv)::DOUBLE) AS norm
        |          FROM f GROUP BY 1),
        |pdots AS (
        |  SELECT f.vec_id, c.clabel, sum(f.qv * c.cq)::DOUBLE AS dot
        |  FROM f JOIN centq c ON c.idx = f.idx
        |  GROUP BY 1, 2),
        |assign AS (
        |  SELECT vec_id, clabel AS cluster FROM (
        |    SELECT p.vec_id, p.clabel,
        |      row_number() OVER (PARTITION BY p.vec_id
        |        ORDER BY round(p.dot / (n.norm * cn.cnorm), 4) DESC,
        |                 p.clabel ASC) AS rn
        |    FROM pdots p JOIN norms n ON n.vec_id = p.vec_id
        |    JOIN cn ON cn.clabel = p.clabel)
        |  WHERE rn = 1),
        |pairs AS (
        |  SELECT aa.cluster, a.vec_id AS va, b.vec_id AS vb,
        |    sum(a.qv * b.qv)::DOUBLE AS dot
        |  FROM f a
        |  JOIN assign aa ON aa.vec_id = a.vec_id
        |  JOIN f b ON b.idx = a.idx AND a.vec_id < b.vec_id
        |  JOIN assign ab ON ab.vec_id = b.vec_id AND ab.cluster = aa.cluster
        |  GROUP BY 1, 2, 3)
        |SELECT cluster, va, vb,
        |  round(dot / (na.norm * nb.norm), 4) AS cosine
        |FROM pairs
        |JOIN norms na ON na.vec_id = va
        |JOIN norms nb ON nb.vec_id = vb
        |WHERE round(dot / (na.norm * nb.norm), 4) >= 0.3""".stripMargin
  )
}
