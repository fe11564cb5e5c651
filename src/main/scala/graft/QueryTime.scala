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
    val spark = GraftSession.build()
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
