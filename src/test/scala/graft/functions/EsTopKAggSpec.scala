package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The imperative weighted sample must equal the relational
  * explode form element for element, under ANY partitioning — the
  * buffer merge is where a one-pass sample silently diverges if the
  * top-k insert or the canonical order is wrong.
  */
class EsTopKAggSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  /** The relational identity: priority = max of w 60-bit copy
    * hashes, top K by (priority desc, key asc). */
  private def relational(rows: Seq[(Long, Long)], k: Int) = {
    import spark.implicits._
    rows.toDF("key", "w")
      .select(col("key"), col("w"),
        explode(sequence(lit(0L), col("w") - 1)).as("i"))
      .select(col("key"), col("w"), expr(
        "cast(conv(substring(md5(concat(cast(key as string), ':'," +
        " cast(i as string))),1,15),16,10) as bigint)").as("h"))
      .groupBy(col("key"))
      .agg(max(col("w")).as("w"), max(col("h")).as("priority"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("priority").desc, col("key").asc)))
      .filter(col("rank") <= k)
      .select(col("key"), col("w"), col("priority"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
  }

  private def imperative(rows: Seq[(Long, Long)], parts: Int) = {
    import spark.implicits._
    rows.toDF("key", "w").repartition(parts)
      .agg(expr("es_topk(key, w)").as("sk"))
      .select(expr("inline(sk)"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("priority").desc, col("k").asc)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
  }

  test("es_topk equals the relational explode form under forced partitionings") {
    val rows = (0 until 200).map(i => (i.toLong, (i % 37 + 1).toLong))
    val want = relational(rows, EsTopKAgg.K)
    assert(want.size == EsTopKAgg.K)
    for (parts <- Seq(1, 3, 8)) {
      assert(imperative(rows, parts) == want,
        s"diverged from the relational form at $parts partitions")
    }
    // reversed input order — the buffer must not care
    assert(imperative(rows.reverse, 5) == want)
  }

  test("buffer stays bounded and serialization round-trips") {
    val buf = EsTopKAgg.empty
    (0 until 1000).foreach(i => EsTopKAgg.add(buf, i.toLong, 3L, 16))
    assert(buf.size == 16)
    // merge keeps the k best of both sides
    val other = EsTopKAgg.empty
    (1000 until 2000).foreach(i => EsTopKAgg.add(other, i.toLong, 3L, 16))
    val agg = EsTopKAgg(null, null, k = 16)
    val merged = agg.merge(buf, other)
    assert(merged.size == 16)
    val back = agg.deserialize(agg.serialize(merged))
    assert(back.toList == merged.toList)
  }

  test("null and non-positive weights degrade to weight 1, never crash") {
    import spark.implicits._
    val got = Seq((1L, Some(0L)), (2L, None), (3L, Some(-5L)), (4L, Some(2L)))
      .toDF("key", "w")
      .agg(expr("es_topk(key, w)").as("sk"))
      .select(expr("inline(sk)"))
      .collect()
    // the null-weight row is skipped; the others fold with w >= 1
    assert(got.map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
  }
}
