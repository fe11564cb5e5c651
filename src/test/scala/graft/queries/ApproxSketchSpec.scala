package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch escape hatch for 100 TB: where the exact queries
  * (q_percentiles' nearest-rank sort, q_cumulative_users' first-seen
  * marking) need a keyed shuffle of every row, Spark's mergeable
  * sketches (approx_percentile = KLL-style quantiles, HLL++ distinct)
  * compute the same answers from constant-size per-partition state.
  * These tests pin the accuracy contract that makes the swap safe —
  * if a Spark upgrade or config change degraded the sketches, the
  * cheap path would silently stop being a valid substitute.
  */
class ApproxSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("approx_percentile brackets the exact nearest-rank percentiles") {
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    // exact p50/p90 per type via sort (the q_percentiles shape)
    val exact = ev.groupBy(col("event_type"))
      .agg(expr("percentile(cents, 0.5)").as("p50x"),
        expr("percentile(cents, 0.9)").as("p90x"),
        count(lit(1)).as("n"))
    val approx = ev.groupBy(col("event_type"))
      .agg(expr("approx_percentile(cents, 0.5, 1000)").as("p50a"),
        expr("approx_percentile(cents, 0.9, 1000)").as("p90a"))
    val joined = exact.join(approx, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (p50x, p90x) = (r.getAs[Double]("p50x"), r.getAs[Double]("p90x"))
      val (p50a, p90a) = (r.getAs[Long]("p50a"), r.getAs[Long]("p90a"))
      // accuracy 1000 ⇒ rank error ≤ n/1000; value tolerance: 5% of
      // the exact value comfortably covers it on this distribution
      assert(math.abs(p50a - p50x) <= math.max(1.0, p50x * 0.05),
        s"${r.getString(0)}: p50 approx $p50a vs exact $p50x")
      assert(math.abs(p90a - p90x) <= math.max(1.0, p90x * 0.05),
        s"${r.getString(0)}: p90 approx $p90a vs exact $p90x")
    }
  }

  test("HLL++ distinct users within rsd of exact, mergeable across groups") {
    val ev = Tables.events(spark, dir)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.06,
      s"HLL distinct $approx vs exact $exact drifted past 3×rsd")
    // mergeability: the per-type sketches union to ~the same estimate
    // (the property that lets 1000 executors sketch independently)
    val perType = ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("u"))
    assert(perType.count() > 1)
    val anyType = ev.filter(col("event_type") === "click")
      .select(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
    val clickRow = perType.filter(col("event_type") === "click")
      .head().getAs[Long]("u")
    assert(clickRow == anyType,
      "group-by sketch must equal the standalone sketch on the same slice")
  }

  test("AMS tug-of-war F2 lands inside a loose factor of the exact moment") {
    import spark.implicits._
    // skewed keys: key j appears ~(60 - j) times — F2 dominated by the
    // heavy head, the regime the estimator exists for
    val rows = (0 until 60).flatMap(j => Seq.fill(60 - j)(j.toLong))
    val src = rows.toDF("user_id")
    val exact = rows.groupBy(identity).map { case (_, v) =>
      v.size.toLong * v.size }.sum
    val est = SketchQueries.amsEstimate(SketchQueries.amsOf(src),
        src.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .agg(sum(col("n") * col("n")).as("f2_exact")))
      .head()
    assert(est.getLong(0) == exact, "exact audit column diverged")
    val e = est.getLong(1).toDouble
    // median-of-group-means tug-of-war: a wide but real envelope; the
    // estimator is deterministic, so this pins THIS hash family on
    // THIS distribution — a hash regression would walk out of it
    assert(e > exact / 3.0 && e < exact * 3.0,
      s"F2 estimate $e implausible vs exact $exact")
  }

  test("the engine's own quantile sketch stays inside a 2.5% rank envelope") {
    import spark.implicits._
    // synthetic data large enough that the merge tree genuinely
    // compacts (n >> K ⇒ B ≈ 40 buffers, ~6 live rounds) — on the
    // testdata SFs the oracle already pins exactness; THIS pins the
    // accuracy contract that makes the sketch a valid substitute for
    // the exact q_percentiles path at 100 TB
    val n = 10000L
    val base = spark.range(n).select(
      lit("g").as("g"),
      (col("id") * 2654435761L % 100000L).as("v"),
      col("id").as("uid"))
    val est = QuantileSketch.quantilesOf(QuantileSketch.sketchOf(base))
      .collect().head
    val wTot = est.getAs[Long]("w_tot")
    assert(math.abs(wTot - n) <= n / 100, s"weight drifted: $wTot vs $n")
    assert(est.getAs[Long]("sk_items") <= 3L * QuantileSketch.K,
      "summary should be ~K items")
    val sorted = (0L until n).map(i => i * 2654435761L % 100000L).sorted
    for (p <- Seq(50, 90, 99)) {
      val v = est.getAs[Long](s"p${p}_est")
      val rank = sorted.count(_ <= v).toDouble / n * 100
      assert(math.abs(rank - p) <= 2.5,
        s"p$p estimate $v has true rank $rank%")
    }
  }
}
