package graft.triggers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.triggers.MatchOperator._

/** The DataFrame-side predicate compilers (Triggers.valuePredicate /
  * pathPredicate) must agree with the row-level ValueMatch /
  * PathMatcher semantics — these are the Column twins used when
  * triggers are evaluated as a broadcast join instead of in the state
  * function.
  */
class TriggerColumnSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("valuePredicate matches ValueMatch on numeric operators incl. nulls") {
    import spark.implicits._
    val df = Seq(Some(5.0), Some(9.0), Some(15.0), None).toDF("v")
    def rows(op: MatchOperator, known: Any): Seq[Option[Double]] =
      df.filter(Triggers.valuePredicate(col("v"), op, known))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(rows(GreaterThan, 9.0) == Seq(Some(15.0)))
    assert(rows(LessOrEqualTo, 9.0) == Seq(Some(5.0), Some(9.0)))
    assert(rows(EqualTo, 9.0) == Seq(Some(9.0)))
    assert(rows(NotEqualTo, 9.0).toSet == Set(Some(5.0), Some(15.0), None))
    assert(rows(Any, null).size == 4)
    // null never matches ordering ops — same as ValueMatch
    assert(!rows(GreaterThan, 0.0).contains(None))
  }

  test("valuePredicate CONTAINS / NOT_CONTAINS on strings and arrays") {
    import spark.implicits._
    val df = Seq("hello world", "goodbye").toDF("s")
    assert(df.filter(Triggers.valuePredicate(col("s"), Contains, "lo wo"))
      .count() == 1)
    assert(df.filter(Triggers.valuePredicate(col("s"), NotContains, "lo wo"))
      .count() == 1)
    val arr = Seq(Seq(1, 2, 3), Seq(4, 5)).toDF("a")
    assert(arr.filter(Triggers.valuePredicate(col("a"), Contains, 2, isArray = true))
      .count() == 1)
    assert(arr.filter(Triggers.valuePredicate(col("a"), NotContains, 2, isArray = true))
      .count() == 1)
  }

  test("pathPredicate agrees with PathMatcher.triggerPathMatches") {
    import spark.implicits._
    import graft.core.PathMatcher
    val paths = Seq("/weekSchedule/3/start", "/weekSchedule/3/stop",
      "/weekSchedule/3/4/start", "/time/from").toDF("path")
    val pattern = "/weekSchedule//start"
    val viaColumn = paths.filter(Triggers.pathPredicate(col("path"), pattern))
      .collect().map(_.getString(0)).toSet
    val viaScala = Seq("/weekSchedule/3/start", "/weekSchedule/3/stop",
      "/weekSchedule/3/4/start", "/time/from")
      .filter(PathMatcher.triggerPathMatches(pattern, _)).toSet
    assert(viaColumn == viaScala)
    assert(viaColumn == Set("/weekSchedule/3/start"))
  }
}
