package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The hot-bucket cap is the guard between LSH-style banded self-joins
  * and the classic production failure: one band key holding millions of
  * near-identical documents turns the "bounded" candidate join into a
  * quadratic explosion on a single join key. These tests prove the cap
  * (a) leaves healthy data byte-identical (same plan object — every
  * query-level hash/plan pin stays valid), (b) bounds the candidate
  * count when a synthetic 10k-copy hot band appears, and (c) reports
  * the drop (no silent caps).
  */
class BoundedBucketsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("no-op on healthy data: same plan object, nothing dropped") {
    import spark.implicits._
    val bands = (1L to 100L).map(i => (i, s"band${i % 50}"))
      .toDF("doc_id", "band_key") // max bucket size 2
    val out = BoundedBuckets.cap(bands, Seq("band_key"), cap = 1000,
      tag = "spec_healthy")
    assert(out eq bands, "cap must return the input untouched when no bucket binds")
    assert(BoundedBuckets.lastDropped("spec_healthy") == 0L)
  }

  test("a synthetic 10k-copy hot band yields bounded candidates, and the drop is reported") {
    import spark.implicits._
    // 10k docs all sharing ONE band key (the viral-boilerplate case)
    // plus 20 healthy docs in 10 small bands. Uncapped, the self-join
    // on the hot key alone emits 10k·(10k−1)/2 ≈ 5·10⁷ pairs.
    val hot = (1L to 10000L).map(i => (i, "HOT"))
    val healthy = (20001L to 20020L).map(i => (i, s"b${i % 10}"))
    val bands = (hot ++ healthy).toDF("doc_id", "band_key")

    val capped = BoundedBuckets.cap(bands, Seq("band_key"), cap = 1000,
      tag = "spec_hot")
    assert(BoundedBuckets.lastDropped("spec_hot") == 1L,
      "exactly the one hot band must be reported dropped")

    val cands = capped.as("a").join(capped.as("b"),
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val n = cands.count()
    // only the healthy bands pair: 10 bands × C(2,2) = 10 pairs —
    // nowhere near the ~5·10⁷ the hot band would have produced
    assert(n == 10L, s"expected 10 bounded candidates, got $n")

    // and the drop is a broadcast anti-join (map-side on the big side,
    // no extra shuffle), keyed on the bucket key
    val plan = cands.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"hot-bucket drop must be a broadcast anti-join:\n$plan")
  }

  test("composite bucket keys (pos, chunk) cap independently per key tuple") {
    import spark.implicits._
    val rows =
      (1L to 50L).map(i => (i, 1, "SAME")) ++   // hot (1, SAME) bucket
      (1L to 5L).map(i => (i, 2, "SAME")) ++    // same chunk, other pos: fine
      (51L to 60L).map(i => (i, 1, s"u$i"))     // unique chunks: fine
    val chunks = rows.toDF("doc_id", "pos", "c")
    val capped = BoundedBuckets.cap(chunks, Seq("pos", "c"), cap = 10,
      tag = "spec_composite")
    assert(BoundedBuckets.lastDropped("spec_composite") == 1L)
    val kept = capped.groupBy("pos", "c").count().collect()
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    assert(!kept.contains((1, "SAME")), "hot (1,SAME) bucket must be dropped")
    assert(kept((2, "SAME")) == 5L, "(2,SAME) is under cap and must survive")
    assert(kept.size == 11)
  }
}
