package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic main (test scope, not shipped): scale-sanity for
  * the near-dup clustering pipeline under the two conditions a 100 TB
  * crawl actually produces — fleet growth (10× the corpus, every
  * document gaining same-text siblings across the copies) and a
  * DELIBERATE viral hot cluster (one page with `hotCopies` exact
  * copies, the case that lands thousands of docs in a single LSH band
  * key). Runs `dd_cluster` end-to-end twice: with the production
  * bucket cap, and uncapped (`-Dgraft.lsh.bucketCap` override) — the
  * wall-clock gap plus the dropped-bucket count is the evidence the
  * cap guards real work, not just the unit spec's synthetic band
  * table.
  *
  * Usage: Test/runMain graft.DedupScaleCheck [scale] [hotCopies]
  * (writes the scaled corpus under /tmp/graft_scale_docs; results are
  * recorded in DEDUP_SCALE.md next to BENCH_IDLE.json)
  */
object DedupScaleCheck {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10)
    val hotCopies = args.drop(1).headOption.map(_.toInt).getOrElse(4000)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = s"/tmp/graft_scale_docs/x$scale"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.queries.Tables.documents(spark, sfDir)
    val nBase = base.count()
    // fleet growth: `scale` copies with shifted ids and a per-copy
    // marker token — cross-copy siblings stay near-dups (the marker
    // perturbs only the leading shingles), so the clusterer faces
    // ~nBase clusters of ~`scale` members
    val copies = (0 until scale).map { i =>
      base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
        .withColumn("text", concat(lit(s"copymark$i "), col("text")))
    }
    // the viral page: hotCopies EXACT copies of one document — one
    // minhash signature, one band bucket of `hotCopies` docs
    val viral = base.orderBy(col("doc_id")).limit(1)
      .crossJoin(spark.range(hotCopies.toLong).select(col("id")))
      .withColumn("doc_id", lit(900000000L) + col("id"))
      .drop("id")
      .select(copies.head.columns.map(col): _*)
    copies.reduce(_ unionAll _).unionAll(viral)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val nTotal = nBase * scale + hotCopies
    println(s"[dedup-scale] corpus: $nTotal docs " +
      s"($scale× $nBase + $hotCopies-copy hot cluster)")

    def run(tag: String): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val labels = SparkEntry.queries("dd_cluster")(spark, outDir).cache()
      val nDocs = labels.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val maxCluster = labels.groupBy(col("cluster")).count()
        .agg(max(col("count"))).collect()(0).getLong(0)
      labels.unpersist()
      val dropped = graft.operators.BoundedBuckets.lastDropped
        .getOrElse("dd_lsh_bands", -1L)
      println(f"[dedup-scale] $tag%-8s wall = $wall%.1f s, " +
        s"clustered docs = $nDocs, largest cluster = $maxCluster, " +
        s"hot bands dropped = $dropped")
      (wall, nDocs, dropped)
    }

    // JIT/scan warm-up on the base corpus so the capped-vs-uncapped
    // comparison measures the pipeline, not first-run compilation
    SparkEntry.queries("dd_cluster")(spark, sfDir).count()
    val (wCap, _, dCap) = run("capped")
    assert(dCap >= 1, "the hot cluster must trip the band cap")
    sys.props("graft.lsh.bucketCap") = Int.MaxValue.toString
    val (wRaw, _, dRaw) = run("uncapped")
    assert(dRaw == 0)
    sys.props.remove("graft.lsh.bucketCap")
    println(f"[dedup-scale] uncapped/capped wall ratio = ${wRaw / wCap}%.2f " +
      "(the hot band's quadratic candidate join is what the cap removes)")
    spark.stop()
  }
}
