package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch/streaming parity for corpus-delta dedup: an increment
  * arriving as a STREAM must receive the same dup-of-corpus verdicts
  * the batch dd_incremental path computes for it — same persisted
  * signature state, same band keys, same Jaccard — with the verdict
  * emitted by a watermarked windowed aggregation (bounded state).
  */
class StreamingIncrementalDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("streaming verdicts == batch dup-of-corpus verdicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.{DedupPipeline, IncrementalDedup, Tables}

    val corpus = Tables.documents(spark, dir).filter(col("doc_id") % 10 < 8)
    val corpArrs = DedupPipeline.shingleArraysOf(corpus).localCheckpoint(true)
    val corpBands = DedupPipeline.bandsOf(corpArrs).localCheckpoint(true)

    // batch expectation: dup iff ANY corpus match (within-increment
    // dups are the batch/absorb path's job, not the live gate's)
    val incArrs = IncrementalDedup.incrementArrs(spark, dir)
      .localCheckpoint(true)
    val expected = IncrementalDedup
      .incrementalVerdicts(incArrs, corpBands, corpArrs)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (if (r.getAs[Long]("n_dup_corpus") > 0) "dup" else "keeper"))
      .toMap

    val t0 = 1000000000L
    val incDocs = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"), col("lang"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        new Timestamp(t0)))
      .toSeq ++
      // a sub-3-token doc: no shingles, so it can never be a
      // near-dup — the gate must still emit its (keeper) verdict
      Seq((888888L, "hi there", "en", new Timestamp(t0)))
    val expectedAll = expected + (888888L -> "keeper")

    val input = MemoryStream[(Long, String, String, Timestamp)]
    // the static side is built ONCE and pinned — the stream-static
    // join replays the static plan per micro-batch
    val state = StreamingIncrementalDedup.corpusState(corpBands, corpArrs)
      .localCheckpoint(true)
    val q = StreamingIncrementalDedup.verdicts(
        input.toDF().toDF("doc_id", "text", "lang", "ingest_ts"), state)
      .writeStream.format("memory").queryName("inc_dedup")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-incdedup-ck").toString)
      .start()
    try {
      input.addData(incDocs: _*)
      q.processAllAvailable()
      // advance the watermark past the increment's window so its
      // verdicts flush (the flusher doc's own window stays pending)
      input.addData((999999L, "flush doc beyond horizon", "en",
        new Timestamp(t0 + 60000)))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, verdict FROM inc_dedup")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expectedAll,
        s"stream/batch divergence:\nstream=$got\nbatch =$expectedAll")
      assert(expected.valuesIterator.contains("dup"),
        "corpus must make the parity non-trivial (at least one dup)")
    } finally q.stop()
  }
}
