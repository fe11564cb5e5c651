package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic main (test scope, not shipped): the economics
  * the incremental dedup path exists for. A production pipeline
  * dedups each crawl increment against an ever-GROWING corpus; the
  * cost that must not grow with the corpus is the per-increment text
  * work. This check scales the corpus (1×, 5×, 10×), keeps the
  * increment FIXED, and times three things per corpus size:
  *
  *   - index: one-time signature-store build (linear in corpus by
  *     design — paid once, amortized across all future increments);
  *   - incremental: judging the increment against the PERSISTED
  *     state (touches increment text + the compact band/signature
  *     tables only);
  *   - from-scratch: recomputing corpus signatures from text and
  *     judging the same increment (what a non-incremental engine
  *     pays EVERY increment).
  *
  * Evidence = the from-scratch column growing with corpus scale
  * while the incremental column stays near-flat. Results recorded in
  * DEDUP_SCALE.md.
  *
  * Usage: Test/runMain graft.IncrementalScaleCheck [scales,...]
  */
object IncrementalScaleCheck {
  def main(args: Array[String]): Unit = {
    val scales = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 5, 10))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.{DedupPipeline, IncrementalDedup, Tables}
    import graft.storage.AstarteStore

    val base = Tables.documents(spark, sfDir)
    val nBase = base.count()
    // fixed increment: the base docs re-arriving with new ids and a
    // marker token — near-dups of their corpus siblings, so verdicts
    // are non-trivial at every scale
    val incDir = "/tmp/graft_incscale/increment"
    base.withColumn("doc_id", col("doc_id") + lit(900000000L))
      .withColumn("text", concat(lit("incmark "), col("text")))
      .write.mode("overwrite").parquet(s"$incDir/documents.parquet")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    println(f"[inc-scale] base corpus $nBase docs; increment $nBase docs")
    println(f"[inc-scale] ${"scale"}%6s ${"corpus"}%8s ${"index_s"}%8s " +
      f"${"incremental_s"}%14s ${"from_scratch_s"}%15s ${"dups"}%6s")
    for (scale <- scales) {
      val corpusDir = s"/tmp/graft_incscale/x$scale"
      // copy 0 is the real corpus the increment near-dups against;
      // further copies are DISSIMILAR mass (reversed token order —
      // different trigrams, so no extra candidate pairs): the
      // verify-join work then stays constant across scales and the
      // from-scratch/incremental delta isolates exactly the corpus
      // signature recompute the incremental path avoids
      (0 until scale).map { i =>
        val c = base.withColumn("doc_id",
          col("doc_id") + lit(i.toLong * 10000000L))
        if (i == 0) c
        else c.withColumn("text",
          concat(lit(s"copymark$i "),
            concat_ws(" ", reverse(split(col("text"), " ")))))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
      val corpusDocs = Tables.documents(spark, corpusDir)

      // one-time index build (linear in corpus, by design)
      val root = s"/tmp/graft_incscale/store_x$scale"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val (_, tIndex) = timed {
        val arrs = DedupPipeline.shingleArraysOf(corpusDocs)
          .localCheckpoint(true)
        AstarteStore.appendAtomic(arrs, s"$root/dedup_signatures")
        AstarteStore.appendAtomic(
          graft.operators.BoundedBuckets.cap(DedupPipeline.bandsOf(arrs),
            Seq("band_key"), tag = s"incscale_x$scale"),
          s"$root/dedup_bands")
      }

      // per-increment cost, incremental path: persisted state only
      val (nDupInc, tInc) = timed {
        val incArrs = DedupPipeline.shingleArraysOf(
          Tables.documents(spark, incDir)).localCheckpoint(true)
        IncrementalDedup.incrementalVerdicts(incArrs,
            spark.read.parquet(s"$root/dedup_bands"),
            spark.read.parquet(s"$root/dedup_signatures"))
          .filter(col("verdict") === "dup").count()
      }

      // per-increment cost, from-scratch path: corpus signatures
      // recomputed from text every time
      val (nDupScratch, tScratch) = timed {
        val incArrs = DedupPipeline.shingleArraysOf(
          Tables.documents(spark, incDir)).localCheckpoint(true)
        val corpArrs = DedupPipeline.shingleArraysOf(corpusDocs)
        IncrementalDedup.incrementalVerdicts(incArrs,
            DedupPipeline.bandsOf(corpArrs), corpArrs)
          .filter(col("verdict") === "dup").count()
      }
      assert(nDupInc == nDupScratch,
        s"paths disagree: $nDupInc vs $nDupScratch")
      println(f"[inc-scale] $scale%6d ${nBase * scale}%8d $tIndex%8.2f " +
        f"$tInc%14.2f $tScratch%15.2f $nDupInc%6d")
    }
    spark.stop()
  }
}
