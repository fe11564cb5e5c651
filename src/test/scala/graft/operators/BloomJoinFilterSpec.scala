package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The runtime bloom join filter's contract: NO false negatives ever
  * (every dim key passes — the property that keeps the exact join's
  * result untouched), a sane false-positive envelope at the sizing
  * rule (~m/10 keys), the filter genuinely shrinks the fact side, and
  * it runs BELOW the join inside the fact scan's codegen pipeline.
  */
class BloomJoinFilterSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val M = 4096
  private val K = 2

  test("no false negatives; bounded false positives; nulls rejected") {
    import spark.implicits._
    val keys = (0L until 300L).map(_ * 7 + 1)
    val dim = keys.toDF("k")
    val bits = BloomJoinFilter.build(dim, col("k"), M, K)
    // every member passes
    assert(dim.filter(BloomJoinFilter.mightContain("k", bits, M, K))
      .count() == keys.size, "bloom dropped a member — false negative")
    // absent keys pass rarely: 300 keys × 2 bits in 4096 → fp ≈ 2%
    val absent = (0L until 2000L).map(_ * 7 + 3).toDF("k") // disjoint mod 7
    val fp = absent.filter(BloomJoinFilter.mightContain("k", bits, M, K))
      .count()
    assert(fp < 200, s"false-positive rate implausibly high: $fp/2000")
    // a NULL key never passes
    assert(Seq[Option[Long]](None).toDF("k")
      .filter(BloomJoinFilter.mightContain("k", bits, M, K)).count() == 0)
  }

  test("q_bloom_join: the prefilter shrinks the fact side and sits below the join") {
    val q = graft.SparkEntry.queries("q_bloom_join")(spark, dir)
    // the filtered result equals the plain join (also oracle-gated)
    val sel = graft.queries.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val plain = graft.queries.Tables.lineitem(spark, dir)
      .join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
    assert(q.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)

    // the filter genuinely shrinks the fact side (~7% selectivity on
    // orders should keep well under half of lineitem)
    val bits = BloomJoinFilter.build(sel, col("o_orderkey"), 65536, 2)
    val lineitem = graft.queries.Tables.lineitem(spark, dir)
    val kept = lineitem
      .filter(BloomJoinFilter.mightContain("l_orderkey", bits, 65536, 2))
      .count()
    assert(kept < lineitem.count() / 2,
      s"bloom prefilter kept $kept rows — not selective")

    // plan shape: the xxhash64 membership test runs in a Filter on
    // the fact branch BELOW the join — never as a join or subquery
    val p = q.queryExecution.executedPlan.toString()
    val joinIdx = p.indexOf("Join")
    val filterIdx = p.indexOf("xxhash64")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"bloom test must be a filter below the join:\n${p.take(2000)}")
    assert(p.contains("element_at"),
      "membership test must probe the packed literal, not a join")
  }
}
