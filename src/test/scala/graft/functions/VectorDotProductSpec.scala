package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorDotProductSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("float arrays: codegen result matches scala reference") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.5f, -0.5f), Seq(2.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.select(expr("vector_dot(a, b)")).collect().map(_.getDouble(0))
    assert(got(0) == (1.0 * 4 + 2.0 * 5 + 3.0 * 6))
    assert(got(1) == (0.5 * 2 - 0.5 * 2))
  }

  test("double arrays and mixed lengths (common prefix)") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0))).toDF("a", "b")
    assert(df.select(expr("vector_dot(a, b)")).head().getDouble(0) == 50.0)
  }

  test("null array returns null; null elements skipped") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(Some(1.0), None, Some(3.0))), Some(Seq(Some(2.0), Some(2.0), Some(2.0)))),
      (None, Some(Seq(Some(1.0))))
    ).toDF("a", "b")
    val rows = df.select(expr("vector_dot(a, b)")).collect()
    assert(rows(0).getDouble(0) == 8.0) // null element contributes 0
    assert(rows(1).isNullAt(0))
  }

  test("interpreted eval matches codegen on real embeddings") {
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    val viaExpr = e.selectExpr("vec_id", "vector_dot(embedding, embedding) AS d")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaAgg = e.selectExpr("vec_id",
      """aggregate(zip_with(embedding, embedding, (x, y) -> cast(x as double) * cast(y as double)),
        |cast(0.0 as double), (acc, v) -> acc + v) AS d""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaExpr == viaAgg)
  }

  test("type check rejects non-array args") {
    val err = intercept[Exception] {
      spark.sql("SELECT vector_dot(1, 2)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("vector_dot") ||
      err.getMessage.toLowerCase.contains("array"))
  }
}
