package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.SketchQueries

/** The custom TypedImperativeAggregate must agree register-for-
  * register with the relational HLL builder (same hash, same rho,
  * same max), survive partial/final merges across many partitions,
  * and produce the same estimates as the relational query path.
  */
class HllAggSpec extends AnyFunSuite {

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

  test("aggregate registers equal the relational builder's, across forced merges") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("user_id")
    val viaAgg = ids.repartition(8) // partial buffers on 8 partitions
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(user_id as string)),1,15),16,10)" +
        " as bigint)"))
      .agg(expr("hll_registers(h)").as("regs"))
      .collect().head.getSeq[Int](0)
    assert(viaAgg.length == 64)
    val viaRel = SketchQueries.registersOf(
        ids.select(lit("g").as("g"), col("user_id")), "g")
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    val dense = (0 until 64).map(b => viaRel.getOrElse(b, 0))
    assert(viaAgg == dense,
      s"aggregate registers diverged from relational: $viaAgg vs $dense")
  }

  test("null hashes are skipped; empty input yields the zero sketch") {
    import spark.implicits._
    val regs = Seq[Option[Long]](None, None).toDF("h")
      .agg(expr("hll_registers(h)")).collect().head.getSeq[Int](0)
    assert(regs == Seq.fill(64)(0), s"nulls should not touch registers: $regs")
  }

  test("q_hll_agg estimates equal q_hll_users' relational per-type estimates") {
    val agg = SketchQueries.queries("q_hll_agg")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rel = SketchQueries.queries("q_hll_users")(spark, dir)
      .collect().filter(_.getString(0) != "_all")
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(agg == rel, s"paths disagree: agg=$agg rel=$rel")
    assert(agg.nonEmpty)
  }
}
