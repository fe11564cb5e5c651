package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** The incremental ANN contract: routing and search against the
  * PERSISTED index must (a) scan the embeddings table exactly once
  * (the increment side), with the corpus vectors coming from the
  * persisted inverted lists, (b) broadcast the k-row codebook, (c)
  * match the same logic run against freshly-computed frames (store
  * round-trip fidelity — the cross-engine from-scratch equivalence is
  * the DuckDB oracle's job), and (d) absorb increments into the lists
  * so the next batch finds them without any retraining.
  */
class IncrementalAnnSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.maxMetadataStringLength", "2000")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("sim_incremental scans embeddings once; corpus side reads the persisted index") {
    val df = SparkEntry.queries("sim_incremental")(spark, dir)
    val p = df.queryExecution.executedPlan.toString()
    val scans = "embeddings\\.parquet".r.findAllIn(p).size
    assert(scans == 1,
      s"expected exactly one embeddings scan (the increment side), got $scans:\n$p")
    assert(p.contains("ann_centroids"), "persisted codebook not in plan")
    assert(p.contains("ann_postings"),
      "persisted inverted lists not in plan")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"codebook probe is not a broadcast join:\n$p")
  }

  test("sim_incr_assign routes the full increment against the broadcast codebook only") {
    val df = SparkEntry.queries("sim_incr_assign")(spark, dir)
    val p = df.queryExecution.executedPlan.toString()
    val scans = "embeddings\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected one embeddings scan, got $scans:\n$p")
    assert(p.contains("ann_centroids"), "persisted codebook not in plan")
    assert(!p.contains("ann_postings"),
      "routing must not touch the inverted lists")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"codebook assignment is not a broadcast join:\n$p")
  }

  test("store-backed search and routing match directly-computed frames") {
    val inc = IncrementalAnn.incrementVecs(spark, dir).localCheckpoint(true)
    val cent = IncrementalAnn.corpusCentroids(spark, dir).localCheckpoint(true)
    val postings =
      IncrementalAnn.AnnStore.postingsOf(
        IncrementalAnn.assignIncrement(
          AnalyticsQueries.quantEmb(spark, dir)
            .filter(col("vec_id") % 10 < 8)
            .select(col("vec_id"), col("q"), col("qnorm")), cent))
    val directSearch =
      IncrementalAnn.searchIncrement(inc, cent, postings).collect().toSeq
    val storedSearch =
      SparkEntry.queries("sim_incremental")(spark, dir).collect().toSeq
    assert(storedSearch == directSearch,
      s"store round-trip changed search results")
    val directRoute =
      IncrementalAnn.routeIncrement(inc, cent).collect().toSeq
    val storedRoute =
      SparkEntry.queries("sim_incr_assign")(spark, dir).collect().toSeq
    assert(storedRoute == directRoute,
      s"store round-trip changed routing census")
    // non-trivial on this data: search must return full top-3 lists
    // and the routing must spread over more than one cluster
    assert(storedSearch.nonEmpty && storedRoute.size > 1)
  }

  test("absorbed increments are searchable by the next batch without retraining") {
    val root = IncrementalAnn.AnnStore.buildRoot(spark, dir)
    val cent = spark.read.parquet(IncrementalAnn.AnnStore.centroidsPath(root))
    val inc = IncrementalAnn.incrementVecs(spark, dir).localCheckpoint(true)
    val before = spark.read
      .parquet(IncrementalAnn.AnnStore.postingsPath(root)).count()
    IncrementalAnn.AnnStore.absorb(root,
      IncrementalAnn.assignIncrement(inc, cent))
    val postings =
      spark.read.parquet(IncrementalAnn.AnnStore.postingsPath(root))
    assert(postings.count() == before + inc.count(),
      "absorb did not append the full increment to the inverted lists")
    // "next batch" queries identical to absorbed vectors must find
    // them — increment members now surface as neighbors, including
    // exact self-matches at cosine 1.0 (rank 1 is not asserted
    // per-query: an exact twin with a smaller id legitimately wins
    // the tie-break)
    val results = IncrementalAnn.searchIncrement(inc, cent, postings)
      .localCheckpoint(true)
    assert(results.filter(col("nid") % 10 >= 8).count() > 0,
      "no absorbed increment vector ever surfaced as a neighbor")
    assert(results.filter(col("qid") === col("nid") &&
        col("cosine") === 1.0).count() > 0,
      "no absorbed query vector self-matched at cosine 1.0")
  }
}
