package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.ScanPruning

/** The streaming tail of the append change feed: every appended row
  * is delivered exactly once across micro-batches, a REPLAYED batch
  * id re-reads its recorded range byte-identically (the crash-between-
  * emit-and-checkpoint window), and rewrite commits (erase,
  * compaction) never emit.
  */
class StreamingChangeFeedSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mk(base: Long, n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (base + i, (base + i) * 1000000000L, (i % 40).toLong, "view",
        (i % 97 + 1) / 100.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("streamed tail delivers appends exactly once; replayed batch re-reads its range") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = ScanPruning.FileIndexStore.buildRootFrom(spark, mk(0L, 1200))
    val stateDir = Files.createTempDirectory("graft-scf").toString
    val emitted =
      scala.collection.mutable.Map.empty[Long, Set[Long]] // batchId -> ids
    val sink = StreamingChangeFeed.tail(root, stateDir) { (rows, id) =>
      val ids = rows.select(col("event_id")).collect()
        .map(_.getLong(0)).toSet
      emitted.synchronized {
        emitted(id) = emitted.getOrElse(id, Set.empty) ++ ids
      }
    }

    val input = MemoryStream[Int]
    val q = input.toDS().toDF().writeStream.foreachBatch(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-scf-ckpt").toString)
      .start()
    try {
      input.addData(1) // tick: corpus
      q.processAllAvailable()
      assert(ScanPruning.FileIndexStore.absorb(spark, root, mk(10000L, 500),
        "inc-a"))
      input.addData(2) // tick: inc-a
      q.processAllAvailable()
      // maintenance + an absorb between ticks: only inc-b may emit
      assert(ScanPruning.FileIndexStore.absorb(spark, root, mk(20000L, 500),
        "inc-b"))
      assert(ScanPruning.FileIndexStore.erase(spark, root, 7L, "erase-1"))
      input.addData(3)
      q.processAllAvailable()
      input.addData(4) // tick with nothing new
      q.processAllAvailable()
    } finally q.stop()

    val all = emitted.values.flatten.toSeq
    assert(all.size == all.toSet.size, "a row was emitted twice")
    assert(all.toSet ==
      (0L until 1200L).toSet ++ (10000L until 10500L) ++
        (20000L until 20500L),
      "the tail's union is not exactly the appended rows")
    assert(emitted.getOrElse(3L, Set.empty).isEmpty ||
      emitted(3L) == (20000L until 20500L).toSet)

    // crash window: re-invoke an already-claimed batch id directly
    // (what a foreachBatch replay does) — the recorded range re-reads
    // byte-identically even though MORE commits landed since
    assert(ScanPruning.FileIndexStore.absorb(spark, root, mk(30000L, 300),
      "inc-c"))
    val before = emitted.toMap
    val tick = spark.range(1).toDF()
    (0L to 3L).foreach { id => sink(tick, id) }
    (0L to 3L).foreach { id =>
      assert(emitted(id) == before.getOrElse(id, Set.empty),
        s"replayed batch $id emitted different rows")
    }
    // and the next FRESH batch picks up exactly inc-c
    sink(tick, 99L)
    assert(emitted(99L) == (30000L until 30300L).toSet,
      "the post-replay fresh batch missed the new append")
  }
}
