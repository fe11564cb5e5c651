package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.get("q6_filter_sum").foreach(fn => fn(spark, sfDir).count())
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $n%s ${times.min}%.2f s (runs: ${times.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
