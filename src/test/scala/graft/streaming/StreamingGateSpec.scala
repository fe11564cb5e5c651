package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Batch/streaming parity for the corpus admission gate: the same
  * documents must receive the same verdicts whether gated in batch
  * (tx_corpus_gate) or on a stream (StreamingGate) — the property
  * that lets one pipeline backfill history in batch and gate live
  * arrivals streaming without the two halves disagreeing about what
  * got in. The only semantic seam is the duplicate election
  * (corpus-min vs first-seen), which coincides when a corpus replays
  * in order — pinned here — and diverges only in the direction
  * streaming must (a dup arriving AFTER its keeper is still a dup).
  */
class StreamingGateSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkDocs: Seq[(Long, String, Long)] = {
    val pass = "the quick brown fox jumps over the lazy dog and then " +
      "walks along the river bank to find some interesting food there"
    val short = "too short to pass"
    val repetitive = ("yes no " * 20).trim
    val lowq = "zzzz qqqq wwww eeee rrrr tttt yyyy uuuu iiii oooo pppp " +
      "aaaa ssss dddd ffff gggg hhhh jjjj kkkk llll"
    // docs 6 and 7 are token-bag duplicates of doc 5 (shuffled words)
    val dupOf5 = "dog lazy the over jumps fox brown quick the and then " +
      "walks along the river bank to find some interesting food there"
    Seq(
      (1L, short, short.length.toLong),
      (2L, repetitive, repetitive.length.toLong),
      (3L, lowq, lowq.length.toLong),
      (5L, pass, pass.length.toLong),
      (6L, dupOf5, dupOf5.length.toLong),
      (7L, dupOf5, dupOf5.length.toLong))
  }

  test("single-batch replay: streaming verdicts == batch tx_corpus_gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = mkDocs
    // batch side: the real query over a parquet corpus
    val dir = Files.createTempDirectory("graft-gate").toString
    docs.map { case (id, t, n) => (id, t, "en", "test", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val batch = graft.SparkEntry.queries("tx_corpus_gate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    // streaming side: same rows, one micro-batch
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamingGate.verdicts(
        input.toDF().toDF("doc_id", "text", "n_chars"))
      .writeStream.format("memory").queryName("gate_par")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-gate-ck").toString)
      .start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streaming = spark.sql("SELECT doc_id, verdict, score_bp FROM gate_par")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streaming == batch,
        s"parity broken:\nstream=$streaming\nbatch =$batch")
      // sanity: the corpus exercises every verdict class
      assert(batch.map(_._2) ==
        Set("too_short", "repetitive", "low_quality", "pass", "bag_dup"))
    } finally q.stop()
  }

  test("cross-batch election: a dup arriving later is still a dup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamingGate.verdicts(
        input.toDF().toDF("doc_id", "text", "n_chars"))
      .writeStream.format("memory").queryName("gate_x")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-gate-ck2").toString)
      .start()
    try {
      val pass = mkDocs.find(_._1 == 5L).get
      val dup = mkDocs.find(_._1 == 6L).get
      input.addData(pass)
      q.processAllAvailable()
      input.addData(dup) // later micro-batch, same token bag
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, verdict FROM gate_x").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // the property under test is the ELECTION: the earlier arrival
      // keeps its non-dup verdict, the later same-bag arrival is a dup
      assert(got(5L) != "bag_dup" && got(6L) == "bag_dup",
        s"keyed election must persist across micro-batches: $got")
    } finally q.stop()
  }
}
