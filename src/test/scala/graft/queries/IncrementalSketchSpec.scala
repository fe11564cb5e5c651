package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** What the oracle hash-match cannot see: the increment path must
  * never rescan old events (physical-plan pin), and absorbing an
  * increment into the store log must make the store alone equal the
  * from-scratch sketch (the monoid-log contract), with HLL absorption
  * idempotent under replay while CMS is deliberately not.
  */
class IncrementalSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def eventScans(df: org.apache.spark.sql.DataFrame): Int =
    "events\\.parquet".r
      .findAllIn(df.queryExecution.executedPlan.toString()).size

  test("incremental queries scan events exactly once (the increment side)") {
    // q_hll_incremental eagerly checkpoints the merged registers, so
    // its served plan must contain NO events scan at all — the single
    // scan lives in the checkpointed register builder
    assert(eventScans(IncrementalSketch.queries("q_hll_incremental")(
      spark, dir)) == 0, "hll serving plan rescans events")
    val incBuilder = SketchQueries.registersOf(
      IncrementalSketch.incrementEvents(spark, dir)
        .select(col("event_type"), col("user_id")), "event_type")
    assert(eventScans(incBuilder) == 1,
      "increment register builder should scan events exactly once")
    // the CMS path is a single-consumer lineage — one scan, inline
    assert(eventScans(IncrementalSketch.queries("q_cms_incremental")(
      spark, dir)) == 1, "cms plan should hold exactly the increment scan")
  }

  test("absorbed store alone equals the from-scratch sketch; HLL replay is idempotent") {
    val root = IncrementalSketch.SketchStore.buildRoot(spark, dir)
    val inc = IncrementalSketch.incrementEvents(spark, dir)
      .localCheckpoint(true)
    IncrementalSketch.SketchStore.absorb(spark, root, inc)

    def regSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val full = SketchQueries.registersOf(
      Tables.events(spark, dir).select(col("event_type"), col("user_id")),
      "event_type")
    assert(regSet(IncrementalSketch.SketchStore.hllRegisters(spark, root))
      == regSet(full), "store-alone registers != from-scratch registers")

    def cmsMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fullCms = SketchQueries.cmsOf(
      Tables.events(spark, dir).select(col("user_id")))
    val storeCms =
      cmsMap(IncrementalSketch.SketchStore.cmsCounters(spark, root))
    assert(storeCms == cmsMap(fullCms),
      "store-alone counters != from-scratch counters")

    // replay the SAME increment: HLL unchanged (max), CMS double-counts
    // the increment's contribution — the documented non-idempotence
    IncrementalSketch.SketchStore.absorb(spark, root, inc)
    assert(regSet(IncrementalSketch.SketchStore.hllRegisters(spark, root))
      == regSet(full), "HLL register log not idempotent under replay")
    val replayed =
      cmsMap(IncrementalSketch.SketchStore.cmsCounters(spark, root))
    assert(replayed != storeCms && replayed.values.sum > storeCms.values.sum,
      "CMS replay should have double-counted (exactly-once is the append)")
  }
}
