package graft
import org.apache.spark.sql.SparkSession

/** Standalone driver for the ingest-throughput number (the same
  * measurement Bench embeds) — lets throughput be profiled without
  * paying the full 100-query suite.
  */
object IngestBenchOnly {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
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
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    (1 to reps).foreach { i =>
      val eps = Bench.ingestEpsPublic(spark, sfDir)
      println(s"""{"run":$i,"ingest_events_per_sec":${math.round(eps)}}""")
    }
    spark.stop()
  }
}
