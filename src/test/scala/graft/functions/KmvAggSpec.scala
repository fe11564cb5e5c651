package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Tables

/** The imperative bottom-k buffer must equal the relational bottom-k
  * ELEMENT FOR ELEMENT (not just in summary columns), survive forced
  * partial/final merges, and be duplicate-blind — KMV is a sketch of
  * the distinct set.
  */
class KmvAggSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def hashed = {
    graft.functions.GraftFunctions.register(spark)
    Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(user_id as string)),1,15),16,10)" +
        " as bigint)"))
      .select(col("event_type"), col("h"))
  }

  private def imperative(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("event_type")).agg(expr("kmv_bottomk(h)").as("kmv"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap

  test("imperative buffer equals the relational bottom-k, merged across partitions") {
    // repartition(7) forces multiple partial buffers per group, so
    // the merge path is exercised, not just update
    val got = imperative(hashed.repartition(7))
    val want = hashed.distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("h").asc)))
      .filter(col("rn") <= 32)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("h"))).as("kmv"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(got == want, "imperative bottom-k diverged from relational")
    assert(got.nonEmpty && got.values.forall(l => l == l.sorted && l.nonEmpty))
  }

  test("duplicates never change the sketch (distinct-set semantics)") {
    val once = imperative(hashed)
    val tripled = imperative(hashed.unionAll(hashed).unionAll(hashed))
    assert(once == tripled, "duplicate inserts changed the bottom-k")
  }
}
