package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale pin for the adaptive two-phase top-K sharding: on a
  * synthetic hot-token posting list, no phase-one window partition
  * holds more than a balanced share of the hot group — the property a
  * fixed shard constant loses the moment data outgrows it — and the
  * shard count scales with the session's parallelism rather than
  * being a literal.
  */
class TwoPhaseTopKSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("shard count derives from session parallelism, floored at 32") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "tok")
    val s = TwoPhaseTopK.shards(df)
    val p = spark.sparkContext.defaultParallelism
    assert(s == math.max(32, p), s"shards=$s parallelism=$p")
    assert(s >= 32)
  }

  test("hot-token posting list spreads evenly over the shards") {
    import spark.implicits._
    val n = 100000
    // one stop-word-shaped token: every posting in a single group, and
    // doc_ids all even (a clustered pattern a modulo shard would fold
    // onto half the shards)
    val postings = spark.range(n).select(
      (col("id") * 2).as("doc_id"), lit("the").as("tok"),
      (col("id") % 7 + 1).as("tf"))
    val nShards = TwoPhaseTopK.shards(postings)
    val perShard = postings
      .withColumn("shard", TwoPhaseTopK.shardCol(col("doc_id"), nShards))
      .groupBy(col("tok"), col("shard"))
      .agg(count(lit(1)).as("c"))
      .select("c").as[Long].collect()
    assert(perShard.length == nShards,
      s"hash sharding left shards empty: ${perShard.length} of $nShards")
    val mean = n.toDouble / nShards
    assert(perShard.max <= 2 * mean,
      s"hot shard at ${perShard.max} rows vs mean $mean — not balanced")
    assert(perShard.sum == n)
  }

  test("phase-one cut never drops a global winner whatever the shard count") {
    import spark.implicits._
    val k = 25
    val vals = spark.range(5000)
      .select(col("id"), pmod(col("id") * 2654435761L, lit(997)).as("v"))
    val truth = vals.orderBy(col("v").asc, col("id").asc).limit(k)
      .select("id").as[Long].collect().toSet
    for (nShards <- Seq(1, 7, 32, 256)) {
      val got = {
        val w1 = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("v").asc, col("id").asc)
        vals.withColumn("shard", TwoPhaseTopK.shardCol(col("id"), nShards))
          .withColumn("r1", row_number().over(w1)).filter(col("r1") <= k)
          .orderBy(col("v").asc, col("id").asc).limit(k)
          .select("id").as[Long].collect().toSet
      }
      assert(got == truth, s"two-phase diverged at nShards=$nShards")
    }
  }
}
