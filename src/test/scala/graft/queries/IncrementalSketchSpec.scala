package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** What the oracle hash-match cannot see: the increment path must
  * never rescan old events (physical-plan pin), and absorbing an
  * increment into the store log must make the store alone equal the
  * from-scratch sketch (the monoid-log contract), with absorption
  * replay-idempotent for BOTH sketches — HLL by max, CMS by the
  * increment-id ledger (skip on replay) plus the read-side
  * max-per-(inc_id, r, j) fold that closes the ledger's crash window.
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
    // the quantile path checkpoints its merge rounds, so the served
    // plan must hold NO events scan — the single scan lives in the
    // increment's round-1 checkpoint
    assert(eventScans(IncrementalSketch.queries("q_kll_incremental")(
      spark, dir)) == 0, "kll serving plan rescans events")
    val incKllBase = IncrementalSketch.kllBaseOf(
      IncrementalSketch.incrementEvents(spark, dir))
    assert(eventScans(incKllBase) == 1,
      "kll increment base should scan events exactly once")
  }

  test("the persisted quantile summary plus an increment pass equals the batch union") {
    val root = IncrementalSketch.SketchStore.buildRoot(spark, dir)
    // merged store + increment-only sketch
    val incItems = QuantileSketch.sketchOf(IncrementalSketch.kllBaseOf(
      IncrementalSketch.incrementEvents(spark, dir)))
    val served = QuantileSketch.quantilesOf(
      IncrementalSketch.SketchStore.kllItems(spark, root)
        .unionByName(incItems)).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // batch twin: sketch both slices from scratch, union
    val cItems = QuantileSketch.sketchOf(IncrementalSketch.kllBaseOf(
      Tables.events(spark, dir).filter(col("event_id") % 10 < 8)))
    val batch = QuantileSketch.quantilesOf(cItems.unionByName(incItems))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(served == batch,
      "store round-trip changed the merged quantile estimates")
    assert(served.nonEmpty)
  }

  test("absorbed store alone equals the from-scratch sketch; replay leaves both sketches unchanged") {
    val root = IncrementalSketch.SketchStore.buildRoot(spark, dir)
    val inc = IncrementalSketch.incrementEvents(spark, dir)
      .localCheckpoint(true)
    assert(IncrementalSketch.SketchStore.absorb(spark, root, inc, "inc-1"),
      "first absorb of a new id should land")

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

    // replay the SAME absorb (same inc_id): the ledger skips it and
    // both sketches read back bit-identical
    assert(!IncrementalSketch.SketchStore.absorb(spark, root, inc, "inc-1"),
      "replayed absorb should be a ledger no-op")
    assert(regSet(IncrementalSketch.SketchStore.hllRegisters(spark, root))
      == regSet(full), "HLL register log changed under replay")
    assert(cmsMap(IncrementalSketch.SketchStore.cmsCounters(spark, root))
      == storeCms, "CMS counters changed under replay")

    // crash-window twin: the retry that raced the ledger read and
    // DOUBLE-appended the same inc_id — the read-side fold still
    // counts it once
    graft.storage.AstarteStore.appendAtomic(
      SketchQueries.cmsOf(inc.select(col("user_id")))
        .withColumn("inc_id", lit("inc-1")),
      IncrementalSketch.SketchStore.cmsPath(root))
    assert(cmsMap(IncrementalSketch.SketchStore.cmsCounters(spark, root))
      == storeCms, "double-appended inc_id double-counted on read")

    // a genuinely NEW increment id with the same rows is new data and
    // must count again — idempotence is per id, not per content
    assert(IncrementalSketch.SketchStore.absorb(spark, root, inc, "inc-2"))
    val twoIncs =
      cmsMap(IncrementalSketch.SketchStore.cmsCounters(spark, root))
    assert(twoIncs.values.sum > storeCms.values.sum,
      "a distinct increment id should add mass")
  }
}
