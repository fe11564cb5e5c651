package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.SketchQueries

/** The custom CMS TypedImperativeAggregate must agree counter-for-
  * counter with the relational builder (same hashes, same sums),
  * survive partial/final merges across many partitions, preserve the
  * total-mass invariant (each of the d rows sums to the input count),
  * and match the relational query path per group on real data.
  */
class CmsAggSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  private val dir = "/root/testdata/sf0.001"

  private val jsExpr =
    "transform(sequence(0, 3), r ->" +
    " cast(conv(substring(md5(concat(cast(r as string), ':'," +
    " cast(user_id as string))),1,8),16,10) as bigint) % 128)"

  test("aggregate counters equal the relational builder's, across forced merges") {
    import spark.implicits._
    // heavy repetition so counters exceed 1 and collisions occur
    val ids = (0L until 3000L).map(i => i % 250L).toDF("user_id")
    val viaAgg = ids.repartition(8) // partial buffers on 8 partitions
      .withColumn("js", expr(jsExpr))
      .agg(expr("cms_counters(js)").as("cnts"))
      .collect().head.getSeq[Long](0)
    assert(viaAgg.length == 512)
    // each CMS row preserves total mass
    (0 until 4).foreach { r =>
      assert(viaAgg.slice(r * 128, (r + 1) * 128).sum == 3000L,
        s"row $r lost mass")
    }
    val viaRel = SketchQueries.cmsOf(ids)
      .collect().map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    val dense = for (r <- 0 until 4; j <- 0 until 128)
      yield viaRel.getOrElse((r, j.toLong), 0L)
    assert(viaAgg == dense,
      "aggregate counters diverged from the relational build")
  }

  test("null user_ids are skipped; empty input yields the zero table") {
    import spark.implicits._
    val cnts = Seq[Option[Long]](None, None).toDF("user_id")
      .withColumn("js", when(col("user_id").isNotNull, expr(jsExpr)))
      .agg(expr("cms_counters(js)")).collect().head.getSeq[Long](0)
    assert(cnts == Seq.fill(512)(0L), "nulls should not touch counters")
  }

  test("q_cms_agg rows equal the relational per-type counter tables") {
    val agg = SketchQueries.queries("q_cms_agg")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val types = graft.queries.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select("event_type").distinct().collect().map(_.getString(0))
    assert(types.nonEmpty)
    val rel = types.flatMap { t =>
      SketchQueries.cmsOf(
          graft.queries.Tables.events(spark, dir)
            .filter(col("event_type") === t).select("user_id"))
        .collect()
        .map(r => (t, r.getInt(0), r.getLong(1)) -> r.getLong(2))
    }.toMap
    assert(agg == rel, "q_cms_agg diverged from per-type relational builds")
  }
}
