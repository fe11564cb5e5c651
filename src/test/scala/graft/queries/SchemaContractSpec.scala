package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The engine's canonical reading of every driver testdata table —
  * names AND normalized types — pinned in ONE spec, so the next
  * testdata regeneration that drifts a physical type fails here with
  * an obvious message instead of erroring 22 scattered queries (the
  * round-7 failure mode: `events.ts` flipped TIMESTAMP(NANOS) →
  * timestamp[us] and every long-arithmetic consumer broke).
  *
  * Also locks the normalization itself: the same instant written as
  * TIMESTAMP_NTZ, as TIMESTAMP(LTZ), and as a raw epoch-nanos long
  * must all surface as the SAME canonical epoch-nanos long through
  * `Tables.events`, and an unrecognizable ts type must throw AT THE
  * TABLE BOUNDARY, not downstream.
  */
class SchemaContractSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def shape(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)

  test("canonical schema of every testdata table") {
    assert(shape(Tables.events(spark, sf)) == Seq(
      "event_id" -> "bigint", "ts" -> "bigint" /* canonical epoch-nanos */,
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"))
    assert(shape(Tables.documents(spark, sf)) == Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"))
    assert(shape(Tables.embeddings(spark, sf)) == Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))
    assert(shape(Tables.region(spark, sf)) == Seq(
      "r_regionkey" -> "int", "r_name" -> "string"))
    assert(shape(Tables.nation(spark, sf)) == Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"))
    assert(shape(Tables.customer(spark, sf)) == Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"))
    assert(shape(Tables.supplier(spark, sf)) == Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"))
    assert(shape(Tables.part(spark, sf)) == Seq(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"))
    assert(shape(Tables.orders(spark, sf)) == Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"))
    assert(shape(Tables.lineitem(spark, sf)) == Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"))
  }

  test("ts normalization is invariant across physical encodings") {
    val expected = 1577836800L * 1000000000L // 2020-01-01T00:00:00Z in nanos
    def roundTrip(sql: String): Long = {
      val dir = java.nio.file.Files.createTempDirectory("graft-tsdrift").toString
      spark.sql(sql).write.mode("overwrite").parquet(s"$dir/events.parquet")
      Tables.events(spark, dir).select("ts").head().getLong(0)
    }
    assert(roundTrip(
      "SELECT TIMESTAMP_NTZ '2020-01-01 00:00:00' AS ts") == expected)
    assert(roundTrip(
      "SELECT TIMESTAMP '2020-01-01 00:00:00' AS ts") == expected)
    assert(roundTrip(
      s"SELECT CAST($expected AS BIGINT) AS ts") == expected)
  }

  test("a drifted ts type fails loudly at the table boundary") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tsdrift").toString
    spark.sql("SELECT '2020-01-01' AS ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("normalizeTs"))
  }
}
