package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared text shingling: word n-grams of a token-array column, as an
  * array Column. Docs with fewer than n tokens yield an EMPTY array —
  * the naive `sequence(1, size(tk) - (n-1))` form crashes there,
  * because Spark's `sequence(1, 0)` steps DOWN to `[1, 0]` and
  * `element_at(tk, 0)` / out-of-range indices throw under ANSI mode
  * (Spark 4 default).
  */
object Shingles {
  def wordNgrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(tokens, (i + j).cast("int"))): _*)))
      .otherwise(expr("cast(array() as array<string>)"))
}

/** Parquet table loader for the driver-provided TPC-H-ish testdata
  * (see /root/repo/TESTDATA.md). Filters/projections written against
  * these DataFrames push down to the parquet scan via Catalyst.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
