package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Batch/streaming parity for the corpus admission gate: the same
  * documents must receive the same verdicts whether gated in batch
  * (tx_corpus_gate) or on a stream (StreamingGate) — the property
  * that lets one pipeline backfill history in batch and gate live
  * arrivals streaming without the two halves disagreeing about what
  * got in. The only semantic seams are the duplicate election
  * (corpus-min vs first-seen), which coincides when a corpus replays
  * in order — pinned here — and the election HORIZON: state is
  * watermark-bounded, so a bag silent for longer than the TTL evicts
  * and its next arrival is re-elected (also pinned, in event time, so
  * the test is deterministic with no wall-clock sleeps).
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

  private val t0 = 1000000000L // base event time, ms

  private def at(doc: (Long, String, Long), tsMs: Long)
      : (Long, String, Long, Timestamp) =
    (doc._1, doc._2, doc._3, new Timestamp(tsMs))

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

    // streaming side: same rows, one micro-batch, one event time
    val input = MemoryStream[(Long, String, Long, Timestamp)]
    val q = StreamingGate.verdicts(
        input.toDF().toDF("doc_id", "text", "n_chars", "ingest_ts"))
      .writeStream.format("memory").queryName("gate_par")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-gate-ck").toString)
      .start()
    try {
      input.addData(docs.map(at(_, t0)): _*)
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
    val input = MemoryStream[(Long, String, Long, Timestamp)]
    val q = StreamingGate.verdicts(
        input.toDF().toDF("doc_id", "text", "n_chars", "ingest_ts"))
      .writeStream.format("memory").queryName("gate_x")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-gate-ck2").toString)
      .start()
    try {
      val pass = mkDocs.find(_._1 == 5L).get
      val dup = mkDocs.find(_._1 == 6L).get
      input.addData(at(pass, t0))
      q.processAllAvailable()
      input.addData(at(dup, t0 + 1000)) // later micro-batch, same token bag
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, verdict FROM gate_x").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // the property under test is the ELECTION: the earlier arrival
      // keeps its non-dup verdict, the later same-bag arrival is a dup
      assert(got(5L) != "bag_dup" && got(6L) == "bag_dup",
        s"keyed election must persist across micro-batches: $got")
    } finally q.stop()
  }

  test("election state evicts after the TTL horizon; within-horizon replays unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ttl = 60000L
    val input = MemoryStream[(Long, String, Long, Timestamp)]
    val q = StreamingGate.verdicts(
        input.toDF().toDF("doc_id", "text", "n_chars", "ingest_ts"),
        electionTtlMs = ttl)
      .writeStream.format("memory").queryName("gate_ttl")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-gate-ck3").toString)
      .start()
    try {
      val pass = mkDocs.find(_._1 == 5L).get
      val dup = mkDocs.find(_._1 == 6L).get
      val unrelated = mkDocs.find(_._1 == 1L).get
      input.addData(at(pass, t0))
      q.processAllAvailable()
      // WITHIN the horizon a replay of the same bag is still a dup
      // (this arrival also re-arms the bag's horizon from t0+1s)
      input.addData(at(dup, t0 + 1000))
      q.processAllAvailable()
      // an unrelated doc far past the horizon advances the watermark
      // beyond the bag's newest arrival → its state times out (the
      // engine runs the timeout sweep once the watermark moves)
      input.addData(at(unrelated, t0 + 1000 + ttl + 10000))
      q.processAllAvailable()
      // past the horizon: the bag's state is gone, so the same
      // content re-arrives as a fresh keeper, not a dup
      input.addData(at((9L, dup._2, dup._3), t0 + 1000 + ttl + 20000))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, verdict FROM gate_ttl").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got(6L) == "bag_dup",
        s"within-horizon replay must still be a dup: $got")
      assert(got(9L) != "bag_dup",
        s"state must evict after the TTL horizon: $got")
    } finally q.stop()
  }
}
