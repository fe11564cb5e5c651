package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shard-count policy for exact two-phase distributed top-K / bottom-K
  * passes (rank within shards, then rank the ≤ shards·K survivors).
  *
  * The two-phase identity is shard-count-invariant — any global top-K
  * row has at most K−1 rows ahead of it globally, hence at most K−1 in
  * whatever shard it lands in, so phase one can never cut a global
  * winner. What the shard count DOES control is the worst-case window
  * partition: a hot group (a stop-word term's posting list, one giant
  * source's shingle set) of N rows puts N/shards rows in its biggest
  * phase-one partition. A fixed constant therefore stops scaling the
  * moment data outgrows it — N = billions over 32 shards is still a
  * single-task sort.
  *
  * Policy: the session's parallelism (the same signal AQE sizes its
  * targets from), floored at 32 so small local runs keep the partition
  * count the plans were tuned at. On a 1000-executor cluster
  * `defaultParallelism` is the core count, so the hottest group's
  * phase-one partitions shrink linearly as executors are added. The
  * countervailing cost is phase TWO: its single per-group partition
  * holds ≤ shards·K survivor rows, so the shard count must not grow
  * faster than the worker pool — shards = cores keeps phase one
  * fully parallel while phase two stays ≤ cores·K rows per group
  * (K ≤ 100 here: a few MB per group even at 8k cores). A workload
  * with both billion-row hot groups and a need for larger K would
  * interpose a third phase; nothing in this engine is near that.
  */
object TwoPhaseTopK {

  /** Shard count derived from the session that owns `df`. */
  def shards(df: DataFrame): Int =
    math.max(32, df.sparkSession.sparkContext.defaultParallelism)

  /** The phase-one shard column for an integral or hashable key.
    * Hash-based, so clustered key patterns (all-even ids, sequential
    * ranges) still spread evenly across shards. */
  def shardCol(key: Column, nShards: Int): Column =
    pmod(xxhash64(key), lit(nShards))
}
