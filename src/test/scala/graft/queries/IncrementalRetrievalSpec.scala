package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** What the oracle hash-match cannot see: the incremental serving
  * path must never rescan corpus text (physical-plan pin), the
  * champion re-cut identity top-C(top-C(A) ∪ B) = top-C(A ∪ B) must
  * hold (the claim that keeps the serve index-sized), and an absorbed
  * store alone must equal the from-scratch index — replay-idempotent
  * under the increment-id ledger.
  */
class IncrementalRetrievalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def docScans(df: org.apache.spark.sql.DataFrame): Int =
    "documents\\.parquet".r
      .findAllIn(df.queryExecution.executedPlan.toString()).size

  private def emptyPostings() =
    HybridRetrieval.postingsOf(
      Tables.documents(spark, dir).filter(lit(false)))

  private def ranking(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getInt(3)))
      .toMap

  test("the serving plan holds no documents scan; the increment base scans once") {
    val served = IncrementalRetrieval.queries("sim_lex_incremental")(spark, dir)
    assert(docScans(served) == 0,
      "serving plan rescans documents — the increment checkpoint leaked")
    assert(docScans(IncrementalRetrieval.incrementPostings(spark, dir)) == 1,
      "increment posting builder should scan documents exactly once")
  }

  test("champion re-cut identity: top-C(top-C(A) ∪ B) equals top-C(A ∪ B)") {
    import spark.implicits._
    // one hot token across both slices with colliding tfs, so the cut
    // genuinely mixes corpus champions and increment rows
    val a = (0L until 300L).map(i => (i, "hot", (i % 9) + 1, 50L)) ++
      (0L until 40L).map(i => (i, "cold", i % 3 + 1, 50L))
    val b = (300L until 420L).map(i => (i, "hot", (i % 11) + 1, 60L))
    val c = 16
    val av = a.toDF("doc_id", "tok", "tf", "dl")
    val bv = b.toDF("doc_id", "tok", "tf", "dl")
    def cut(df: org.apache.spark.sql.DataFrame) =
      HybridRetrieval.championsOf(df, c)
        .select("doc_id", "tok").as[(Long, String)].collect().toSet
    val recut = cut(HybridRetrieval.championsOf(av, c).unionByName(bv))
    val full = cut(av.unionByName(bv))
    assert(recut == full,
      s"re-cut diverged: extra=${recut -- full} missing=${full -- recut}")
  }

  test("absorbed store alone equals the from-scratch index; replay is a ledger no-op") {
    val root = IncrementalRetrieval.LexIndexStore.buildRoot(spark, dir)
    val incP = IncrementalRetrieval.incrementPostings(spark, dir)
      .localCheckpoint(true)
    assert(IncrementalRetrieval.LexIndexStore.absorb(spark, root, incP, "inc-1"))

    // store alone (empty increment) must now serve the full ranking
    val fromStore = ranking(
      IncrementalRetrieval.serveIncremental(spark, root, emptyPostings()))
    val fromScratch = ranking(HybridRetrieval.lexTopK(spark, dir)
      .select(col("qid"), col("nid"), col("score_u6"), col("lrank")))
    assert(fromStore == fromScratch,
      "absorbed store diverged from the from-scratch index")
    assert(fromStore.nonEmpty)

    // replayed absorb: skipped, ranking unchanged
    assert(!IncrementalRetrieval.LexIndexStore.absorb(spark, root, incP, "inc-1"))
    // crash-window twin: a double append of the same inc_id — the
    // per-inc_id read dedup still counts it once
    graft.storage.AstarteStore.appendAtomic(
      incP.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .withColumn("inc_id", lit("inc-1")),
      IncrementalRetrieval.LexIndexStore.dfreqPath(root))
    val replayed = ranking(
      IncrementalRetrieval.serveIncremental(spark, root, emptyPostings()))
    assert(replayed == fromScratch,
      "replayed append changed the served ranking")
  }

  test("bucketized serve equals the lazy-view serve; corpus side plans shuffle-free") {
    val root = IncrementalRetrieval.LexIndexStore.buildRoot(spark, dir)
    val (champT, dfreqT) =
      IncrementalRetrieval.LexIndexStore.bucketizeIndex(spark, root)
    val incP = IncrementalRetrieval.incrementPostings(spark, dir)
      .localCheckpoint(true)
    val bucketized = ranking(IncrementalRetrieval
      .serveBucketized(spark, root, incP, champT, dfreqT))
    val lazyView = ranking(
      IncrementalRetrieval.serveIncremental(spark, root, incP))
    assert(bucketized == lazyView && bucketized.nonEmpty,
      "bucketized serve diverged from the lazy-view serve")

    // plan pin, dd_incremental style: disable broadcasts entirely (the
    // regime where the corpus table is too big to broadcast and a
    // shuffle-requiring join runs on tok) — the corpus side must come
    // off the bucketed scan with NO Exchange; only the increment side
    // may shuffle into the bucket partitioning
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.functions.col
      val incToks = incP.select(col("tok"))
      for (t <- Seq(champT, dfreqT)) {
        val joined = incToks.repartition(8, col("tok"))
          .join(spark.table(t), Seq("tok"))
        val p = joined.queryExecution.executedPlan.toString()
        assert(p.contains("Bucketed: true"),
          s"$t: corpus side must come off the bucketed layout:\n$p")
        val exchanges = "Exchange".r.findAllIn(p).size
        assert(exchanges == 1,
          s"$t: only the increment side may shuffle (found $exchanges):\n$p")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("the served incremental ranking equals the from-scratch ranking (pre-absorb)") {
    val root = IncrementalRetrieval.LexIndexStore.buildRoot(spark, dir)
    val incP = IncrementalRetrieval.incrementPostings(spark, dir)
      .localCheckpoint(true)
    val served = ranking(
      IncrementalRetrieval.serveIncremental(spark, root, incP))
    val full = ranking(HybridRetrieval.lexTopK(spark, dir)
      .select(col("qid"), col("nid"), col("score_u6"), col("lrank")))
    assert(served == full, "incremental serve diverged from full rebuild")
  }
}
