package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two properties of percentile-balanced prefix-sum buckets:
  * (1) BALANCE — a survivor set whose ids cluster in a narrow value
  * range (the case that collapsed the old `id·P div (max+1)` scheme
  * into one bucket) still spreads ≈ N/P per bucket; (2) INVARIANCE —
  * the two-phase decomposition reproduces the global prefix sum
  * exactly, wherever the boundaries fall.
  */
class PercentileBucketsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("clustered ids spread across buckets instead of piling into one") {
    import spark.implicits._
    // ids 9000–9999 of a 0–9999 value space: the old value-range
    // scheme maps every row to pid 7 (9000*8/10000 = 7)
    val clustered = (9000L to 9999L).map(i => (i, 1L)).toDF("doc_id", "n")
    val counts = AnalyticsQueries.percentileBuckets(clustered, "doc_id", 8)
      .groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getAs[Long]("c"))
    assert(counts.length == 8, s"expected 8 occupied buckets, got ${counts.length}")
    assert(counts.max <= 250,
      s"buckets must stay balanced on clustered ids: ${counts.mkString(",")}")
  }

  test("two-phase prefix sum over the buckets equals the global window sum") {
    import spark.implicits._
    // scrambled, gappy, clustered ids with varied weights
    val ids = ((1L to 40L) ++ (9000L to 9039L) ++ Seq(500L, 777L, 4242L))
    val df = ids.map(i => (i, i % 7 + 1)).toDF("doc_id", "n_toks")
    val bucketed = AnalyticsQueries.percentileBuckets(df, "doc_id", 8)
    val offW = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = bucketed.groupBy(col("pid"))
      .agg(sum(col("n_toks")).as("psum"))
      .withColumn("offset", coalesce(sum(col("psum")).over(offW), lit(0L)))
      .select(col("pid"), col("offset"))
    val local = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
    val twoPhase = bucketed
      .withColumn("local_end", sum(col("n_toks")).over(local))
      .join(broadcast(off), Seq("pid"))
      .select(col("doc_id"),
        (col("offset") + col("local_end") - col("n_toks")).as("start_tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val globalW = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val global = df
      .select(col("doc_id"),
        coalesce(sum(col("n_toks")).over(globalW), lit(0L)).as("start_tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPhase == global,
      "bucketed decomposition must equal the single-partition prefix sum")
  }
}
