package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-level bucketing — the co-located-join technique the 100 TB
  * design leans on: write both fact tables bucketed (and sorted)
  * by the join key, and the join plans WITHOUT any Exchange — the
  * shuffle happened once at write time and is amortized over every
  * subsequent join. This is the persisted-layout complement to the
  * per-query broadcast/AQE strategies PlanSpec pins.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    // force the sort-merge path: the point is shuffle ELISION, which a
    // broadcast would mask, and AQE's wrapper would hide the plan
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.adaptive.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Drop the table AND its physical location. When sbt test reuses a
    * session another suite built, the temp-warehouse config above is
    * ignored and tables land in the session's real warehouse dir — and
    * a killed earlier run can leave the LOCATION behind with no
    * catalog entry, which fails CTAS with LOCATION_ALREADY_EXISTS
    * (overwrite only drops the table, not a stray directory).
    */
  private def dropCompletely(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = new java.io.File(loc, table)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dir)
    }
  }

  test("bucketed fact tables join with zero exchanges") {
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    dropCompletely("orders_bucketed")
    dropCompletely("lineitem_bucketed")
    o.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    l.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")

    val j = spark.table("lineitem_bucketed")
      .join(spark.table("orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"))
    val plan = j.queryExecution.executedPlan.toString()

    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    // THE assertion: both sides scan pre-bucketed files, so no
    // shuffle exists anywhere below the join (the final aggregation
    // exchange on o_orderstatus is above it and expected)
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange"),
      s"bucketed join still shuffles:\n$joinPart")
    assert(plan.contains("Bucketed: true"), "scan did not use bucketing")

    // same answer as the unbucketed plan (which must shuffle)
    val unbucketed = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"))
    assert(unbucketed.queryExecution.executedPlan.toString()
      .substring(unbucketed.queryExecution.executedPlan.toString()
        .indexOf("SortMergeJoin")).contains("Exchange"),
      "control: the unbucketed join should shuffle")
    assert(j.collect().map(r => (r.getString(0), r.getDouble(1))).toMap ==
      unbucketed.collect().map(r => (r.getString(0), r.getDouble(1))).toMap)
  }
}
