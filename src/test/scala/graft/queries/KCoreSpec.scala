package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-core peeling contract: correct on hand-built graphs (chains
  * peel, cores survive with induced degrees), the until-convergence
  * loop genuinely outlasts any fixed unroll (a deep chain needing >3
  * rounds), and the oracle's fixed unroll is still a superset of the
  * convergence depth on the testdata — what keeps the unrolled DuckDB
  * replay equal to the converged loop.
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
    val out = GraphQueries.kcoreSurvivors(e, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"expected the bare triangle, got $out")
  }

  test("peeling cascades across rounds; a 4-cycle survives intact") {
    // chain 10-11-12 cascades: 10 and 12 fall round 1, 11 falls round
    // 2; the 4-cycle 20-21-22-23 is untouched
    val e = edges((10L, 11L), (11L, 12L),
      (20L, 21L), (21L, 22L), (22L, 23L), (20L, 23L))
    val out = GraphQueries.kcoreSurvivors(e, k = 2)
      .collect().map(r => r.getLong(0)).toSet
    assert(out == Set(20L, 21L, 22L, 23L), s"expected the 4-cycle, got $out")
  }

  test("a deep chain needing more than 3 peel rounds converges to empty") {
    // path 1-2-…-12 plus a triangle core: endpoints cascade inward one
    // layer per round, so the chain needs 6 rounds to vanish — a fixed
    // 3-round unroll visibly has NOT converged here, the loop has
    val chain = (1L until 12L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val e = edges(chain ++ tri: _*)
    val fixed3 = GraphQueries.kcoreSurvivorsFixed(e, k = 2, rounds = 3)
      .collect().map(_.getLong(0)).toSet
    val converged = GraphQueries.kcoreSurvivors(e, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(fixed3 != Set(100L, 101L, 102L),
      "3 rounds already converged — deepen the chain so this pins the loop")
    assert(converged == Set(100L, 101L, 102L),
      s"converged 2-core should be the bare triangle, got $converged")
    // and the loop equals a sufficiently deep unroll exactly
    val fixed9 = GraphQueries.kcoreSurvivorsFixed(e, k = 2, rounds = 9)
      .collect().map(_.getLong(0)).toSet
    assert(converged == fixed9)
  }

  test("oracle's unroll depth covers the testdata's convergence depth") {
    val e = AnalyticsQueries.simhashNearDupPairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val unrolled = GraphQueries.kcoreSurvivorsFixed(e, k = 2,
      rounds = GraphQueries.OracleUnroll).collect().toSeq
    val converged = GraphQueries.kcoreSurvivors(e, k = 2)
      .collect().toSeq
    assert(unrolled == converged, s"${GraphQueries.OracleUnroll} unrolled " +
      "rounds diverge from the converged loop on sf0.001 — raise OracleUnroll")
    assert(converged.nonEmpty, "empty 2-core would pin nothing")
  }
}
