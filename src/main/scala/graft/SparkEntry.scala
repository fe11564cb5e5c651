package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped in [[graft.queries.QueryPack]]s; each pack maps
  * a slice of SURVEY.md §2's operator inventory onto the driver's
  * testdata tables, with a DuckDB oracle per query where the operator
  * is SQL-expressible.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    AstarteOpsQueries,
    AnalyticsQueries,
    ReadQueries,
    WindowedQueries,
    DedupPipeline,
    IncrementalDedup,
    IncrementalAnn,
    QualityClassifier,
    HybridRetrieval,
    IncrementalRetrieval,
    SketchQueries,
    IncrementalSketch,
    QuantileSketch,
    ScanPruning,
    GraphQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
