package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST_BYTES", "65536"))
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_PAR_DISCOVERY_THRESHOLD", "4096"))
      .config("spark.sql.adaptive.enabled", "true")
      // advisory-size AQE coalescing, not core-count pinning — see
      // the Bench builder's note (SPARK_GRAFT_AQE_PARALLELISM_FIRST)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      // let AQE re-coalesce CACHED plan output: the dedup pipeline
      // caches its 260k-row shingle/band tables, and without this the
      // cache pins scan-sized shuffle partitioning on every consumer
      // (the clusterers' dominant overhead at sf0.1 — 2.1s -> 0.5s on
      // the Jaccard-verify stage alone)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.get("q6_filter_sum").foreach(fn => fn(spark, sfDir).count())
    names.foreach { n =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $n%s ${times.min}%.2f s (runs: ${times.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
