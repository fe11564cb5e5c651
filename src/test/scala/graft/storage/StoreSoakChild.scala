package graft.storage

import org.apache.spark.sql.SparkSession

/** Child-process half of the two-JVM store soak
  * ([[TwoJvmStoreSoakSpec]]): a REAL second JVM appending batches to
  * a shared table through the store's append protocol and running
  * maintenance compaction under the cross-process [[ProcessLock]],
  * concurrently with the parent doing the same. args:
  * table path, writer id, batch count, rows per batch, compact-every.
  */
object StoreSoakChild {
  def main(args: Array[String]): Unit = {
    val Array(table, writer, nBatchesS, rowsPerS, compactEveryS) = args
    val (nBatches, rowsPer, compactEvery) =
      (nBatchesS.toInt, rowsPerS.toInt, compactEveryS.toInt)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-soak-$writer")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val store = new AstarteStore(table)
    try {
      for (b <- 1 to nBatches) {
        val df = (0 until rowsPer)
          .map(i => (writer, b, i.toLong, s"payload-$writer-$b-$i"))
          .toDF("writer", "batch", "i", "payload")
        AstarteStore.appendAtomic(df, table, partitionCols = Seq("writer"))
        if (b % compactEvery == 0)
          store.compactAppendTable(spark, table, maxFiles = 2)
      }
    } finally spark.stop()
    // reaching here means every batch landed; the parent asserts on
    // the table contents, the exit code only signals crashes
    sys.exit(0)
  }
}
