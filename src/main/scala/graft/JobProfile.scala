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
    val spark = GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    if (sfDir == "--probe") {
      val dir = args(1)
      println("openCostInBytes=" +
        spark.conf.get("spark.sql.files.openCostInBytes"))
      val df = spark.read.parquet(dir)
      println("one-root partitions=" + df.rdd.getNumPartitions)
      val leaves = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("zbucket="))
        .map(_.toString).sorted
      println("leaf dirs=" + leaves.length)
      val multi = spark.read.parquet(leaves: _*)
      println("multi-root partitions=" + multi.rdd.getNumPartitions)
      val multiSchema = spark.read.schema(df.schema).parquet(leaves: _*)
      println("multi-root+schema partitions=" + multiSchema.rdd.getNumPartitions)
      spark.stop(); return
    }
    if (sfDir == "--scan") {
      val name = args(1)
      val d = args.lift(2).getOrElse("/root/testdata/sf0.1")
      val fn = SparkEntry.queries(name)
      fn(spark, d).count() // warm-up builds store roots
      val df = fn(spark, d)
      df.queryExecution.sparkPlan.foreach {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          println(s"SCAN files=${sc.relation.location.inputFiles.length} " +
            s"partitions=${sc.execute().getNumPartitions} " +
            s"root=${sc.relation.location.rootPaths.headOption}")
        case _ => ()
      }
      spark.stop(); return
    }
    val verbose = sys.env.get("SPARK_GRAFT_PROF_STAGES").contains("1")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val stageTimeMs =
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        if (verbose) {
          val ms = Option(stageTimeMs.remove(s.stageInfo.stageId))
            .map(_.longValue).getOrElse(0L)
          println(f"STAGE ${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%4d " +
            f"time=${ms / 1000.0}%7.2fs " +
            s.stageInfo.name.takeWhile(_ != '\n').take(110))
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) {
          taskTimeMs.addAndGet(t.taskInfo.duration)
          stageTimeMs.merge(t.stageId, t.taskInfo.duration,
            (a, b) => a + b)
        }
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
