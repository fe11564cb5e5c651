package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Canonical `events.ts` contract: epoch-NANOS long, whatever the
    * parquet physically stores. The reference normalizes its envelope
    * timestamp in exactly one place (`impl.ex:94,335` — decimicros→ms
    * on decode); this is that place for the batch side. Handled input
    * shapes:
    *   - INT64 TIMESTAMP(NANOS) read under
    *     `spark.sql.legacy.parquet.nanosAsLong=true` → already a long
    *     of nanos, passed through;
    *   - TIMESTAMP (LTZ) → `unix_micros * 1000` (reads the internal
    *     epoch-micros directly, session-timezone independent);
    *   - TIMESTAMP_NTZ (what `timestamp[us]` parquet infers to) → the
    *     naive wall-clock is the epoch reading DuckDB's `epoch_us(ts)`
    *     uses, so convert wall→instant without trusting the session
    *     zone: `cast` interprets the wall time in the session zone,
    *     `from_utc_timestamp(_, current_timezone())` shifts that back
    *     out, leaving exactly the stored micros.
    * Every downstream `ts` consumer (div 1000 → micros, div 1000000 →
    * millis, typed `getAs[Long]("ts")` lambdas) builds on this one
    * contract, so the next testdata regeneration lands HERE, not in 25
    * scattered query sites.
    */
  private def normalizeTs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType          => col("ts")
    case TimestampType     => unix_micros(col("ts")) * lit(1000L)
    case TimestampNTZType  =>
      unix_micros(from_utc_timestamp(col("ts").cast(TimestampType),
        expr("current_timezone()"))) * lit(1000L)
    case other => throw new IllegalStateException(
      s"events.ts has unsupported type $other — extend Tables.normalizeTs")
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.withColumn("ts", normalizeTs(df))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
