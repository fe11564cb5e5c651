package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Short-document regression: `sequence(1, 0)` steps DOWN in Spark
  * (`[1, 0]`), so the naive shingle expression crashes under ANSI
  * mode on any doc with fewer tokens than the n-gram width. The
  * shared helper must yield an empty array instead — fixture corpora
  * happen to have only long docs, a real corpus never does.
  */
class ShinglesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("wordNgrams yields empty arrays, not crashes, below the n-gram width") {
    import spark.implicits._
    val df = Seq("", "a", "a b", "a b c", "a b c d")
      .toDF("text")
      .select(col("text"), split(col("text"), " ").as("tk"))

    val tri = df.select(col("text"), Shingles.wordNgrams(col("tk"), 3).as("g")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(tri("") == Nil)      // split("") -> [""], 1 token
    assert(tri("a") == Nil)
    assert(tri("a b") == Nil)
    assert(tri("a b c") == List("a b c"))
    assert(tri("a b c d") == List("a b c", "b c d"))

    val bi = df.select(col("text"), Shingles.wordNgrams(col("tk"), 2).as("g")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(bi("a") == Nil)
    assert(bi("a b") == List("a b"))
  }
}
