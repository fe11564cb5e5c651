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
