package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract pins for hybrid retrieval: the two-phase champion cut is
  * EXACTLY the single-window top-K it replaces (the claim that lets
  * the oracle use one window while the engine never forms a
  * corpus-sized window partition), and RRF arithmetic/structure holds
  * on the real output.
  */
class HybridRetrievalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("two-phase champion top-K equals the single-window top-K on a skewed term") {
    import spark.implicits._
    // one hot token with 500 postings (tf collides heavily so the
    // doc_id tie-break is load-bearing), one cold token with 3
    val rows =
      (0L until 500L).map(i => (i, "hot", (i % 7) + 1, 100L)) ++
      Seq((1L, "cold", 5L, 100L), (2L, "cold", 5L, 100L), (9L, "cold", 1L, 100L))
    val postings = rows.toDF("doc_id", "tok", "tf", "dl")
    val c = 10
    val got = HybridRetrieval.championsOf(postings, c)
      .select("doc_id", "tok").as[(Long, String)].collect().toSet
    val w = Window.partitionBy(col("tok"))
      .orderBy(col("tf").desc, col("doc_id").asc)
    val want = postings.withColumn("r", row_number().over(w))
      .filter(col("r") <= c)
      .select("doc_id", "tok").as[(Long, String)].collect().toSet
    assert(got == want, s"two-phase diverged: extra=${got -- want} missing=${want -- got}")
    assert(want.count(_._2 == "hot") == c && want.count(_._2 == "cold") == 3)
  }

  test("RRF scores recompute from the leg ranks; structure is top-5 per query") {
    val out = HybridRetrieval.queries("sim_hybrid_rrf")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (v, l, rrf) = (r.getInt(2), r.getInt(3), r.getLong(4))
      val want = (if (v > 0) 1000000L / (60 + v) else 0L) +
                 (if (l > 0) 1000000L / (60 + l) else 0L)
      assert(rrf == want, s"rrf mismatch on $r: want $want")
      assert(v > 0 || l > 0, s"row in neither leg: $r")
    }
    val perQ = out.groupBy(_.getLong(0)).values
      .map(_.map(_.getInt(5)).sorted.toSeq)
    perQ.foreach(rs => assert(rs == (1 to rs.length),
      s"rank gap: ${rs.mkString(",")}"))
    assert(out.map(_.getInt(5)).max <= 5)
  }

  test("sim_hybrid_eval recomputes from the fused and truth rankings") {
    val w = (1 to 5).map(i =>
      math.floor(1000000.0 / (math.log(i + 1.0) / math.log(2.0))).toLong)
    assert(w == Seq(1000000L, 630929L, 500000L, 430676L, 386852L),
      s"DCG weight constants drifted: $w")
    val idcg = (1 to 5).map(i => (11 - i) * w(i - 1)).sum
    val truth = AnalyticsQueries.bfTopK(spark, dir, maxQid = 20, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    val fused = HybridRetrieval.queries("sim_hybrid_rrf")(spark, dir)
      .collect().groupBy(_.getLong(0))
    val eval = HybridRetrieval.queries("sim_hybrid_eval")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(eval.keySet == fused.keySet)
    for ((qid, rows) <- fused) {
      val rels = rows.map(r =>
        r.getInt(5) -> truth.get(qid -> r.getLong(1)).map(11 - _).getOrElse(0))
      val wantHits = rels.count(_._2 > 0).toLong
      val wantNdcg = rels.map { case (rank, rel) => rel * w(rank - 1) }.sum *
        10000 / idcg
      assert(eval(qid) == (wantHits, wantNdcg),
        s"qid $qid: got ${eval(qid)}, recomputed ($wantHits, $wantNdcg)")
    }
    assert(eval.values.forall(_._2 <= 10000), "nDCG above the ideal")
  }

  test("fusion genuinely mixes legs on the testdata (not one leg renamed)") {
    val out = HybridRetrieval.queries("sim_hybrid_rrf")(spark, dir).collect()
    assert(out.exists(_.getInt(2) > 0), "no vector-leg contribution")
    assert(out.exists(_.getInt(3) > 0), "no lexical-leg contribution")
  }
}
