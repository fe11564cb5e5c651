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
}
