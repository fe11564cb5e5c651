package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic main (test scope, not shipped): scale-sanity
  * for the ingest headline. Materializes an N× copy of the sf0.1
  * events table (N× distinct devices, ids shifted — the way a real
  * fleet grows), then times the same scan / envelope / state-machine
  * stages as [[IngestBreakdown]] at 1× and N×. If the sf0.1 rate is
  * job-overhead-bound (as the breakdown shows), events/sec at N×
  * should be ≥ the 1× rate — the per-event marginal cost is what a
  * 1000-executor cluster multiplies, not the fixed overhead.
  *
  * Usage: Test/runMain graft.IngestScaleCheck [scale]
  * (writes the scaled table under /tmp/graft_scale_events)
  */
object IngestScaleCheck {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = s"/tmp/graft_scale_events/x$scale"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.queries.Tables.events(spark, sfDir)
    // N copies, each with its own device population and unique event
    // ids (fleet growth: more devices, same per-device traffic shape)
    val copies = (0 until scale).map { i =>
      base.withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000000L))
    }
    copies.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$outDir/events.parquet")

    def measure(tag: String, dir: String): Double = {
      val eps = (1 to 3).map(_ => Bench.ingestEpsPublic(spark, dir)).max
      println(f"[scale-check] $tag%-8s events/sec = ${math.round(eps)}")
      eps
    }
    val e1 = measure("1x", sfDir)
    val eN = measure(s"${scale}x", outDir)
    println(f"[scale-check] rate ratio ${scale}x/1x = ${eN / e1}%.3f " +
      "(>=0.9 expected if the 1x rate is fixed-overhead-bound)")
    spark.stop()
  }
}
