package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query job/stage/task census — the drill-down that separates
  * driver-scheduling-bound queries (many tiny jobs) from data-bound
  * ones (few jobs, big task time). Prints one line per query:
  * jobs, stages, tasks, summed executor task time, wall time.
  *
  * Usage: runMain graft.JobProfile <sfDir> [query ...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskTimeMs.addAndGet(t.taskInfo.duration)
    })
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm-up: codegen + store-root builds
      Thread.sleep(150) // listener bus is async; drain before reset
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      println(f"JOBPROF $n%-28s jobs=${jobs.get}%3d stages=${stages.get}%3d " +
        f"tasks=${tasks.get}%5d taskTime=${taskTimeMs.get / 1000.0}%7.2fs wall=$wall%6.3fs")
    }
    spark.stop()
  }
}
