package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** k-core peeling contract: correct on a hand-built graph (chains
  * peel, cores survive with induced degrees), and the fixed 3-round
  * unroll is genuinely the fixpoint on the testdata (the oracle
  * replays the same 3 rounds, so this is what makes the fixed unroll
  * an honest k-core there, not an arbitrary prefix).
  */
class KCoreSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  test("a pendant chain peels away; the triangle core survives with induced degrees") {
    // triangle 1-2-3 with a chain 3-4-5 hanging off it
    val e = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val out = GraphQueries.kcoreSurvivors(e, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"expected the bare triangle, got $out")
  }

  test("two rounds are needed when peeling cascades; a 4-cycle survives intact") {
    // chain 10-11-12 cascades: 10 and 12 fall round 1, 11 falls round
    // 2; the 4-cycle 20-21-22-23 is untouched
    val e = edges((10L, 11L), (11L, 12L),
      (20L, 21L), (21L, 22L), (22L, 23L), (20L, 23L))
    val out = GraphQueries.kcoreSurvivors(e, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0)).toSet
    assert(out == Set(20L, 21L, 22L, 23L), s"expected the 4-cycle, got $out")
  }

  test("3 peel rounds reach the fixpoint on the testdata graph") {
    val e = AnalyticsQueries.simhashNearDupPairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val r3 = GraphQueries.kcoreSurvivors(e, k = 2, rounds = 3)
      .collect().toSeq
    val r4 = GraphQueries.kcoreSurvivors(e, k = 2, rounds = 4)
      .collect().toSeq
    assert(r3 == r4, "3 rounds did not converge on sf0.001 — the " +
      "fixed unroll is no longer the honest k-core here")
    assert(r3.nonEmpty, "empty 2-core would pin nothing")
  }
}
