package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One coherent group of driver-checkable queries.
  *
  * Each entry in [[queries]] is a named DataFrame builder over the
  * testdata dir; each entry in [[oracle]] is equivalent DuckDB SQL
  * over the same parquet tables (registered by file stem). Column
  * names MUST match between the two — the driver sorts columns by
  * name before hashing.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]

  /** Release the storage blocks behind a localCheckpoint-backed frame
    * (iterative queries checkpoint per round and must free superseded
    * rounds instead of pinning executor memory for the session). One
    * definition for every pack — block release matches on the
    * LogicalRDD plan node, which a Spark upgrade could change.
    */
  protected def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** Run `body` with AQE's post-shuffle coalescing floored at
    * `cores/4` partitions, restoring the session's setting after.
    *
    * Pure advisory coalescing (the session default) sizes post-shuffle
    * partitions by EXCHANGE BYTES and is blind to downstream per-row
    * work: a 1–8 MB exchange whose reduce side does CPU-heavy window
    * sorts or explodes collapses to one task. A GLOBAL floor was
    * A/B-measured in r18 and rejected (geomean 1.085 — ~100 light-
    * downstream queries pay pure task overhead); this helper scopes
    * the floor to iterative builds whose rounds EXECUTE inside the
    * query closure (eager per-round checkpoints), where the heavy-
    * downstream shape is known by construction. At production scale
    * the floor is a no-op — data-sized exchanges already exceed
    * cores/4 advisory-sized partitions.
    */
  protected def withCoalesceFloor[A](s: SparkSession)(body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.minPartitionNum"
    val n = math.max(2, s.sparkContext.defaultParallelism / 4)
    // getOption on an unset OPTIONAL conf can yield Some(null) —
    // filter it so restore unsets instead of set(null) throwing
    val prev =
      try s.conf.getOption(key).filter(_ != null)
      catch { case _: Throwable => None }
    s.conf.set(key, n.toString)
    try body finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
}

/** Tiny bounded cache for per-(session, dir) derived artifacts
  * (trained models, fused rankings). Entries strongly retain their
  * SparkSession, so an unbounded map would keep dead sessions — and
  * their checkpointed frames' metadata — alive for the JVM lifetime in
  * a long-lived multi-session driver. Two defenses: entries whose
  * SparkContext has stopped are dropped on every access (their
  * checkpointed frames are unusable anyway), and crossing the size
  * bound clears the map outright (artifacts are rebuildable; a cache
  * miss costs one recompute, a leak costs the driver heap).
  */
private[graft] final class BoundedSessionCache[V](bound: Int = 8) {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), V]()

  def getOrBuild(s: SparkSession, d: String)(build: (SparkSession, String) => V): V = {
    val it = m.keySet.iterator
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    if (m.size >= bound) m.clear()
    m.computeIfAbsent((s, d), { case (ss, dd) => build(ss, dd) })
  }
}
