package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase bucketed rank must equal a global row_number exactly
  * — including ties (broken by the trailing order columns), skewed
  * value distributions, and negative values — while never routing the
  * data through one window partition (pinned plan-side in PlanSpec's
  * q_revenue_gini case).
  */
class BucketedRankSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def globalRank(df: org.apache.spark.sql.DataFrame) = {
    df.withColumn("want",
      row_number().over(Window.orderBy(col("v").asc, col("id").asc)))
  }

  test("byRange equals the global row_number, ties and skew included") {
    import spark.implicits._
    // heavy ties (v % 7), a point mass at 42, and negatives
    val rows = (0L until 500L).map { i =>
      val v = if (i % 5 == 0) 42L else (i % 7) * 13 - 20
      (i, v)
    }
    val df = rows.toDF("id", "v")
    val got = BucketedRank.byRange(df, col("v"), Seq(col("id")), "rank")
    val joined = globalRank(df).join(got, Seq("id", "v"))
    assert(joined.filter(col("want") =!= col("rank")).count() == 0,
      "bucketed rank diverged from the global row_number")
    // ranks are a permutation of 1..n
    assert(got.agg(min(col("rank")), max(col("rank")),
      countDistinct(col("rank"))).head().toSeq == Seq(1L, 500L, 500L))
  }

  test("byRange handles a single row and a constant column") {
    import spark.implicits._
    val one = Seq((7L, 99L)).toDF("id", "v")
    assert(BucketedRank.byRange(one, col("v"), Seq(col("id")), "rank")
      .select("rank").head().getLong(0) == 1L)
    val const = (0L until 50L).map((_, 5L)).toDF("id", "v")
    val ranks = BucketedRank.byRange(const, col("v"), Seq(col("id")), "rank")
      .orderBy("id").select("rank").collect().map(_.getLong(0))
    assert(ranks.toSeq == (1L to 50L), "constant column must rank by tie-break")
  }

  test("withRank keeps caller columns and drops its helpers") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 10, s"p$i"))
      .toDF("id", "v", "payload")
    val got = BucketedRank.withRank(df.withColumn("bk", col("v")),
      col("bk"), Seq(col("v"), col("id")), "rank")
    assert(got.columns.count(_.startsWith("__brk")) == 0)
    assert(got.columns.contains("payload"))
    val joined = globalRank(df).join(got, Seq("id", "v"))
    assert(joined.filter(col("want") =!= col("rank")).count() == 0)
  }
}
