package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The degree-oriented triangle census: exact counts on graphs with
  * known censuses, and the scale property the orientation exists
  * for — a hub vertex (the id-oriented worst case) anchors no
  * wedges, so per-key wedge fan-out stays bounded on skewed graphs.
  */
class TriangleCensusSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def edges(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("doc_a", "doc_b")
  }

  private def census(pairs: Seq[(Long, Long)]): (Long, Long) = {
    val r = AnalyticsQueries.triangleCensus(edges(pairs)).collect().head
    (r.getAs[Long]("n_triangles"), r.getAs[Long]("n_wedges"))
  }

  test("known censuses: clique, star, chain, triangle-with-tail") {
    // K5: C(5,3) = 10 triangles, 5 * C(4,2) = 30 wedges
    val k5 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(census(k5) == (10L, 30L))
    // star K1,6 around the SMALLEST id: 0 triangles, C(6,2) wedges —
    // the id-oriented formulation's worst case for hub anchoring
    val star = (1L to 6L).map(leaf => (0L, leaf))
    assert(census(star) == (0L, 15L))
    // chain: no triangles, one wedge per interior vertex
    assert(census(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == (0L, 2L))
    // one triangle with a pendant tail: wedges = C(2,2)·2 at the
    // degree-2 corners + C(3,2) at the tailed corner = 1 + 1 + 3
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))) == (1L, 5L))
  }

  test("a hub never anchors wedges: out-degrees stay bounded on a skewed graph") {
    // hub 0 with 400 leaves plus a small clique among four leaves.
    // Id-oriented, hub 0 would anchor C(400,2) ≈ 80k wedges from one
    // join key; degree-oriented its out-degree — and so its wedge
    // fan-out — must be 0, with every leaf pointing AT the hub.
    val hub = (1L to 400L).map(leaf => (0L, leaf))
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val e = edges(hub ++ clique)
    val out = AnalyticsQueries.orientedEdges(e)
      .groupBy(col("u")).agg(count(lit(1)).as("outdeg"))
      .agg(max(col("outdeg")).as("mx"),
        sum(when(col("u") === 0L, col("outdeg"))).as("hub_out"))
      .collect().head
    assert(out.isNullAt(1) || out.getAs[Long]("hub_out") == 0L,
      "the max-degree hub must anchor no wedges")
    assert(out.getAs[Long]("mx") <= 4L,
      s"out-degree must stay clique-sized, got ${out.getAs[Long]("mx")}")
    // and the census itself is still exact: C(4,3) clique triangles
    // plus C(4,2) hub–leaf–leaf triangles (the hub connects every
    // clique member, so each clique edge closes through it)
    val r = AnalyticsQueries.triangleCensus(e).collect().head
    assert(r.getAs[Long]("n_triangles") == 10L)
  }
}
