package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("latest right value at or before each left time, per key") {
    import spark.implicits._
    val left = Seq(
      ("k1", 5L, "a"), ("k1", 15L, "b"), ("k1", 25L, "c"),
      ("k2", 10L, "d"), ("k3", 10L, "e") // k3 has no right rows
    ).toDF("k", "t", "payload")
    val right = Seq(
      ("k1", 10L, 1.0), ("k1", 20L, 2.0), ("k2", 10L, 9.0)
    ).toDF("k", "rt", "v")

    val out = AsOfJoin.join(left, right,
      keyCols = Seq("k"), leftTime = "t", rightTime = "rt",
      rightVals = Seq("v"))
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("t"),
        Option(r.getAs[Any]("asof_v"))))
      .toSet

    assert(out == Set(
      ("k1", 5L, None),        // before any right row
      ("k1", 15L, Some(1.0)),  // latest <= 15 is rt=10
      ("k1", 25L, Some(2.0)),  // latest <= 25 is rt=20
      ("k2", 10L, Some(9.0)),  // tie: rt == t counts (<=)
      ("k3", 10L, None)))      // key with no right side
  }

  test("a matched right row with NULL value carries NULL, not an older value") {
    import spark.implicits._
    val left = Seq(("k", 25L)).toDF("k", "t")
    val right = Seq(("k", 10L, Some(1.0)), ("k", 20L, None)).toDF("k", "rt", "v")
    val out = AsOfJoin.join(left, right, Seq("k"), "t", "rt", Seq("v")).head()
    // true as-of: the t=20 row matches; its NULL is the answer
    assert(out.isNullAt(out.fieldIndex("asof_v")))
  }

  test("right rows tying on (key, time) resolve deterministically") {
    import spark.implicits._
    val left = Seq(("k", 15L)).toDF("k", "t")
    val right = Seq(("k", 10L, 1.0), ("k", 10L, 2.0)).toDF("k", "rt", "v")
    val results = (1 to 5).map { _ =>
      AsOfJoin.join(left, right, Seq("k"), "t", "rt", Seq("v"))
        .head().getAs[Double]("asof_v")
    }
    assert(results.distinct.size == 1)
    assert(results.head == 2.0) // max value struct wins the tie
  }

  test("multiple carried columns and column preservation") {
    import spark.implicits._
    val left = Seq(("k", 10L, 42)).toDF("k", "t", "x")
    val right = Seq(("k", 5L, 1.5, "cfg")).toDF("k", "rt", "v", "s")
    val out = AsOfJoin.join(left, right, Seq("k"), "t", "rt", Seq("v", "s"))
    val row = out.head()
    assert(out.columns.toSeq == Seq("k", "t", "x", "asof_v", "asof_s"))
    assert(row.getAs[Int]("x") == 42)
    assert(row.getAs[Double]("asof_v") == 1.5)
    assert(row.getAs[String]("asof_s") == "cfg")
  }

  test("forward: earliest right value at or after each left time, per key") {
    import spark.implicits._
    val left = Seq(
      ("k1", 5L), ("k1", 10L), ("k1", 25L), ("k2", 10L), ("k3", 10L)
    ).toDF("k", "t")
    val right = Seq(
      ("k1", 10L, 1.0), ("k1", 20L, 2.0), ("k2", 5L, 9.0)
    ).toDF("k", "rt", "v")
    val out = AsOfJoin.joinForward(left, right,
        Seq("k"), "t", "rt", Seq("v"))
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("t"),
        Option(r.getAs[Any]("asof_v"))))
      .toSet
    assert(out == Set(
      ("k1", 5L, Some(1.0)),   // earliest >= 5 is rt=10
      ("k1", 10L, Some(1.0)),  // tie: rt == t counts (>=)
      ("k1", 25L, None),       // nothing after 25
      ("k2", 10L, None),       // k2's only right row is before
      ("k3", 10L, None)))      // key with no right side
  }

  test("nearest: closest right row either side; backward wins ties") {
    import spark.implicits._
    val left = Seq(
      ("k", 12L), // back 10 (d=2) vs fwd 20 (d=8) -> backward
      ("k", 18L), // back 10 (d=8) vs fwd 20 (d=2) -> forward
      ("k", 15L), // tie d=5 both sides -> backward
      ("k", 10L), // exact match -> backward d=0
      ("k", 99L)  // back 20 (d=79), no fwd -> backward
    ).toDF("k", "t")
    val right = Seq(("k", 10L, 1.0), ("k", 20L, 2.0)).toDF("k", "rt", "v")
    val out = AsOfJoin.joinNearest(left, right,
        Seq("k"), "t", "rt", Seq("v"))
      .collect()
      .map(r => r.getAs[Long]("t") ->
        ((Option(r.getAs[Any]("asof_v")), r.getAs[String]("asof_dir"))))
      .toMap
    assert(out(12L) == ((Some(1.0), "backward")))
    assert(out(18L) == ((Some(2.0), "forward")))
    assert(out(15L) == ((Some(1.0), "backward")))
    assert(out(10L) == ((Some(1.0), "backward")))
    assert(out(99L) == ((Some(2.0), "backward")))
  }

  test("nearest handles TIMESTAMP time columns in real milliseconds") {
    import spark.implicits._
    // ts columns: a plain cast-to-long would yield SECONDS, silently
    // reinterpreting toleranceMs — and unionByName coerces mixed time
    // types, so the conversion must dispatch on the UNIONED type
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val left = Seq(("k", ts(10000L)), ("k", ts(70000L)))
      .toDF("k", "t")
    val right = Seq(("k", ts(9500L), 1.0), ("k", ts(12000L), 2.0))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.joinNearest(left, right,
      keyCols = Seq("k"), leftTime = "t", rightTime = "rt",
      rightVals = Seq("v"), toleranceMs = Some(3000L))
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("t").getTime,
        Option(r.getAs[Any]("asof_v")),
        Option(r.getAs[Any]("asof_time")))).toSet
    assert(out == Set(
      // 10000 → backward 9500 at distance 500ms beats forward 12000;
      // asof_time comes back as epoch-MILLIS
      (10000L, Some(1.0), Some(9500L)),
      // 70000 → nearest is 12000, 58s away: outside the 3s tolerance
      // (in SECONDS-misinterpretation it would have matched)
      (70000L, None, None)))
  }

  test("nearest with tolerance nulls out matches beyond the bound") {
    import spark.implicits._
    val left = Seq(("k", 12L), ("k", 50L)).toDF("k", "t")
    val right = Seq(("k", 10L, 1.0)).toDF("k", "rt", "v")
    val out = AsOfJoin.joinNearest(left, right,
        Seq("k"), "t", "rt", Seq("v"), toleranceMs = Some(5L))
      .collect()
      .map(r => r.getAs[Long]("t") ->
        ((Option(r.getAs[Any]("asof_v")), Option(r.getAs[String]("asof_dir")))))
      .toMap
    assert(out(12L) == ((Some(1.0), Some("backward")))) // d=2 <= 5
    assert(out(50L) == ((None, None)))                  // d=40 > 5
  }
}
