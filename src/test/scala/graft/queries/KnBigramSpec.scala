package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Kneser-Ney contract: the engine's scaled-integer probabilities
  * equal the hand-derived rationals on a corpus small enough to do
  * the discounting by hand, through the PRODUCTION path (a real
  * documents.parquet in a temp dir, scored by the registered query).
  */
class KnBigramSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  test("integer KN probabilities match the hand-derived rationals end to end") {
    import spark.implicits._
    // corpus "a b a b a c": bigrams ab×2 ba×2 ac×1.
    //   c1(a)=3 n1v(a)=2; c1(b)=2 n1v(b)=1; n1w(b)=1 n1w(a)=1 n1w(c)=1; n11=3
    //   P(b|a) = (2-3/4)/3 + (3/4)(2/3)(1/3) = 7/12  -> u9 two-div floor
    //   P(a|b) = (2-3/4)/2 + (3/4)(1/2)(1/3) = 3/4
    //   P(c|a) = (1-3/4)/3 + (3/4)(2/3)(1/3) = 1/4
    val dir = java.nio.file.Files.createTempDirectory("kn").toString
    Seq((1L, "a b a b a c", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    def pU9(c12: Long, c1: Long, n1v: Long, n1w: Long, n11: Long): Long =
      math.max(4 * c12 - 3, 0) * 1000000000L / (4 * c1) +
        3 * n1v * n1w * 1000000000L / (4 * c1 * n11)
    val pAb = pU9(2, 3, 2, 1, 3) // 583333332 ~ 7/12
    val pBa = pU9(2, 2, 1, 1, 3) // 750000000 = 3/4
    val pAc = pU9(1, 3, 2, 1, 3) // 249999999 ~ 1/4
    assert(pBa == 750000000L && pAc == 249999999L && pAb == 583333332L)

    def nllU6(p: Long): Long =
      math.floor(math.log(1000000000.0 / p) * 1000000).toLong
    val wantAvg = (2 * nllU6(pAb) + 2 * nllU6(pBa) + nllU6(pAc)) / 5

    val out = AnalyticsQueries.queries("tx_kn_bigram")(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 5, s"n_bigrams ${out.head.getLong(1)}")
    assert(out.head.getLong(2) == wantAvg,
      s"avg_nll_u6 ${out.head.getLong(2)} != hand-derived $wantAvg")
  }

  test("KN NLL is non-negative and near ln|V| on the near-uniform testdata") {
    val out = AnalyticsQueries.queries("tx_kn_bigram")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nll = r.getLong(2)
      assert(nll >= 0, s"negative NLL: $r")
      assert(nll < 5000000, s"NLL beyond any plausible vocab-31 value: $r")
    }
  }
}
