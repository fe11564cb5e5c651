package graft.analytics

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The output stage of the training-data pipeline: write a cleaned
  * corpus as deterministically SHUFFLED, deterministically SHARDED
  * parquet — the layout a data loader consumes (`shard=K/part-*`).
  *
  * Pretraining wants documents in pseudo-random order, but a sampled
  * `repartitionByRange` or `orderBy(rand())` gives a DIFFERENT order
  * every run — unreproducible experiments, undiffable exports. Here
  * the shuffle is a pure function of (doc key, seed): shard =
  * pmod(xxhash64(key, seed), nShards), within-shard order =
  * (xxhash64 key, then doc key as the collision tiebreak). Same
  * input + same seed ⇒ byte-identical shard contents, any cluster
  * size, any task scheduling. Changing the seed is a fresh epoch
  * permutation.
  *
  * Scale shape: one hash-partition exchange on the shard id (each
  * shard lands whole in one task), a within-partition sort bounded by
  * shard size, and `partitionBy` directory layout so a loader can
  * open exactly the shards it owns. No global sort, no sampling pass,
  * no driver-side anything.
  */
object TrainingExport {

  /** Add the deterministic (shard, ordinal) columns without writing —
    * the testable core. `keyCol` must be unique per row (doc_id).
    */
  def shuffleSharded(df: DataFrame, keyCol: String,
      nShards: Int, seed: Long): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn("_shuffle_key", xxhash64(col(keyCol), lit(seed)))
      .withColumn("shard", pmod(col("_shuffle_key"), lit(nShards.toLong)))
  }

  /** Write `df` as `outDir/shard=K/…parquet`, each shard internally
    * ordered by the seeded shuffle key. Returns the shard count.
    */
  def writeShards(df: DataFrame, keyCol: String, outDir: String,
      nShards: Int, seed: Long,
      maxRecordsPerFile: Int = 1 << 20): Int = {
    shuffleSharded(df, keyCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("_shuffle_key"), col(keyCol))
      .drop("_shuffle_key")
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("shard")
      .parquet(outDir)
    nShards
  }
}
