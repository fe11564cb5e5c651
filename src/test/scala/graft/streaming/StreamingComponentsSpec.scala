package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{IncrementalDedup, Tables}
import graft.SparkEntry

/** Streaming component maintenance: after streaming the increment in
  * two micro-batches, the folded label log must equal the BATCH
  * fixpoint over all documents (cross-batch edges included — batch 2
  * links against batch 1's absorbed signatures), and a replayed
  * micro-batch id must leave the folded labels unchanged.
  */
class StreamingComponentsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def folded(root: String): Map[Long, Long] =
    IncrementalDedup.SignatureStore.ccLabels(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two streamed batches land on the batch fixpoint; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = IncrementalDedup.SignatureStore.buildRootFrom(
      spark, Tables.documents(spark, dir).filter(col("doc_id") % 10 < 8))

    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDS().toDF("doc_id", "text", "lang")
    val q = docs.writeStream
      .foreachBatch(StreamingComponents.sink(root))
      .option("checkpointLocation",
        Files.createTempDirectory("graft-scc").toString)
      .start()
    def rows(m: Long) = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === m)
      .select(col("doc_id"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    try {
      input.addData(rows(8).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(rows(9).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = folded(root)
    val batch = SparkEntry.queries("dd_cc_converged")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch,
      "streamed labels diverged from the batch fixpoint over all docs")
    assert(got.nonEmpty)

    // redelivery: the SAME batch id arrives again — the ledger
    // short-circuits, the folded labels stay identical
    StreamingComponents.sink(root)(
      rows(8).toIndexedSeq.toDF("doc_id", "text", "lang"), 0L)
    assert(folded(root) == got, "replayed batch id changed the labels")

    // crash-window twin: re-running the batch WORK under a fresh id
    // double-appends label rows — the min-fold collapses them
    IncrementalDedup.SignatureStore.absorbCc(root,
      spark.read.parquet(
        IncrementalDedup.SignatureStore.ccPath(root)))
    assert(folded(root) == got,
      "double-appended label rows changed the folded view")
  }
}
