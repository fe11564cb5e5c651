package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract pins for the mean-centered integer perceptron. The oracle
  * already proves cross-engine bit-parity; what it cannot prove is
  * that the model LEARNS — a degenerate majority-class scorer would
  * hash-match too if both engines computed it. These pins hold the
  * non-degeneracy properties the design exists for.
  */
class QualityClassifierSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private lazy val weights =
    QualityClassifier.train(spark, dir)._1.collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
  private lazy val curve =
    QualityClassifier.train(spark, dir)._2.collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("the training curve descends — centering defeats the batch oscillation") {
    // round 1 is the all-error census (w=0 ⇒ margin 0 ⇒ "error" by
    // the ≤0 convention); learning means the tail sits far below it
    // and below the positive-class share (the majority-class floor a
    // degenerate scorer would show as a 146↔354-style flip-flop).
    val n = curve(1)
    assert(curve(8) < curve(2),
      s"no descent: round2=${curve(2)} round8=${curve(8)}")
    assert(curve(8) * 5 < n,
      s"round-8 errors ${curve(8)} not well under n=$n — degenerate scorer")
  }

  test("the scorer predicts BOTH classes and beats majority class") {
    val census = QualityClassifier.queries("tx_quality_lr_score")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val preds = census.keys.map(_._2).toSet
    assert(preds == Set(-1, 1), s"single-class predictions: $preds")
    val correct = census.filter { case ((y, p), _) => y == p }.values.sum
    val total = census.values.sum
    val majority = Seq(-1, 1)
      .map(y => census.collect { case ((`y`, _), c) => c }.sum).max
    assert(correct > majority,
      s"accuracy $correct/$total no better than majority $majority")
  }

  test("weights and margins stay corpus-size-independent in magnitude") {
    // the 1/N damping bounds |w| by Rounds·max|x′| ≈ Rounds·S·maxTokens
    // regardless of N — the 100 TB overflow-safety claim. Pin a loose
    // ceiling that a missing `div n` would blow through immediately
    // (undamped updates scale with N·S ≈ 5·10⁸ here).
    assert(weights.values.map(math.abs).max < 100L * 1000000L,
      s"weight magnitude escaped the damping bound: $weights")
    assert(weights.values.exists(_ != 0L), "all-zero weights learn nothing")
  }

  test("centered features sum to the div-n remainder per bucket") {
    // Σ_d x′_db = S·tot_b − N·μ_b with μ_b = (S·tot_b) div N, so the
    // per-bucket sum over all docs lands in [0, N) — the integer-exact
    // statement of "mean-centered". The bias row is uncentered (= S).
    val n = graft.queries.Tables.documents(spark, dir).count()
    val feats = QualityClassifier.centeredFeaturesForTest(spark, dir)
    val bad = feats.filter(col("idx") =!= lit(32))
      .groupBy(col("idx")).agg(sum(col("x")).as("sx"))
      .filter(col("sx") < 0 || col("sx") >= lit(n))
      .collect()
    assert(bad.isEmpty, s"centering identity violated: ${bad.mkString(",")}")
  }
}
