package graft
import org.apache.spark.sql.SparkSession

/** Time one SparkEntry query repeatedly — the per-query drill-down
  * companion to IngestBenchOnly for separating host noise from code
  * regressions.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"""{"query":"$name","run":$i,"sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    }
    spark.stop()
  }
}
