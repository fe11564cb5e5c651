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
