package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.events.EventSink
import graft.sources.{BrokerClient, MessageBroker}
import graft.storage.AstarteStore
import graft.triggers._

/** S1 over a REAL broker client: a TCP [[MessageBroker]] with sharded
  * FIFO queues, published to over the socket by a [[BrokerClient]],
  * consumed by the `graft-broker` DataSource V2 streaming source
  * (whose partition readers are themselves network clients), decoded
  * by the SAME pure-Column path as the Kafka glue, driving the full
  * pipeline — including a shard added MID-STREAM (consumer rebalance)
  * and a checkpoint restart resuming the per-shard offset cursors.
  */
class BrokerSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def headers(
      msgType: String, realm: String, dev: String, iface: String,
      path: String, ip: String): Seq[(String, Array[Byte])] = Seq(
    Option(msgType).map(v => "x_astarte_msg_type" -> v.getBytes),
    Option(realm).map(v => "x_astarte_realm" -> v.getBytes),
    Option(dev).map(v => "x_astarte_device_id" -> v.getBytes),
    Option(iface).map(v => "x_astarte_interface" -> v.getBytes),
    Option(path).map(v => "x_astarte_path" -> v.getBytes),
    Option(ip).map(v => "x_astarte_remote_ip" -> v.getBytes)).flatten

  test("TCP broker end-to-end: sharded fetch, mid-stream shard add, checkpoint restart") {
    val base = Files.createTempDirectory("graft-broker").toString
    val broker = new MessageBroker()
    val pub = new BrokerClient("127.0.0.1", broker.port)
    try {
      assert(pub.addShard() == 2) // the client grows the queue set over the wire

      val iface = InterfaceDescriptor("com.test.SimpleStreamTest", 1, 0,
        InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
      val registry = Registry(
        Map(iface.name -> iface),
        Map(iface.name -> Seq(Mapping(iface.name, 1, "/%{i}/value", AInteger))),
        Seq(Trigger("t1", TriggerEventType.IncomingData,
          TriggerScope.OnInterface(iface.name, 1), None,
          MatchOperator.GreaterThan, 10, List("test_events"))))
      val store = new AstarteStore(s"$base/store")
      val sink = new EventSink(s"$base/events")

      def pubMsg(shard: Int, msgType: String, dev: String,
          payload: Array[Byte], ifc: String = null, path: String = null,
          ip: String = null): Unit =
        pub.publish(shard, dev.getBytes, payload,
          headers(msgType, "r", dev, ifc, path, ip))

      def startQuery() = Pipeline.start(
        WireSource.brokerSource(spark, "127.0.0.1", broker.port),
        DeviceStateMachine.StaticRegistryProvider(registry),
        store, sink, s"$base/ckpt")

      val q1 = startQuery()
      try {
        // batch 1: devA on shard 0, devB on shard 1, one invalid
        // record (data without interface header → discarded)
        pubMsg(0, "connection", "devA", Array.emptyByteArray, ip = "10.0.0.9")
        pubMsg(0, "data", "devA", Bson.encode(Seq("v" -> 42)),
          ifc = iface.name, path = "/3/value")
        pubMsg(1, "data", "devB", Bson.encode(Seq("v" -> 5)),
          ifc = iface.name, path = "/0/value")
        pubMsg(1, "data", "devC", Bson.encode(Seq("v" -> 1)), path = "/0/value")
        q1.processAllAvailable()

        // MID-STREAM REBALANCE: a third shard appears while the query
        // runs; the next micro-batch must discover and drain it
        assert(pub.addShard() == 3)
        pubMsg(2, "data", "devB", Bson.encode(Seq("v" -> 30)),
          ifc = iface.name, path = "/2/value")
        q1.processAllAvailable()
      } finally q1.stop()

      // CHECKPOINT RESTART: records published while no query runs are
      // picked up exactly once from the persisted shard cursors
      pubMsg(0, "data", "devA", Bson.encode(Seq("v" -> 20)),
        ifc = iface.name, path = "/1/value")
      pubMsg(0, "disconnection", "devA", Array.emptyByteArray)
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()

      // every valid value landed EXACTLY once (raw physical read — the
      // dedup read would mask an accidental replay)
      val raw = spark.read.parquet(store.datastreamPath)
      assert(raw.count() == 4)
      assert(raw.collect().map(r => (r.getAs[String]("device_id"),
          r.getAs[Int]("integer_value"))).toSet ==
        Set(("devA", 42), ("devA", 20), ("devB", 5), ("devB", 30)))

      // the discarded record never landed; the connect/disconnect
      // lifecycle flowed through
      val updates = store.deviceUpdates(spark).collect()
        .map(_.getAs[String]("update_json"))
      assert(updates.exists(j =>
        j.contains(""""connected":true""") && j.contains("10.0.0.9")))
      assert(updates.exists(_.contains(""""connected":false""")))

      // trigger (GT 10): fired for 42, 30, 20 — not 5
      val fired = sink.read(spark).filter("event_type = 'incoming_data'")
        .select("device_id").collect().map(_.getString(0))
      assert(fired.sorted.toSeq == Seq("devA", "devA", "devB"))
    } finally {
      pub.close()
      broker.close()
    }
  }

  test("admission control: maxRecordsPerTrigger splits the backlog across micro-batches") {
    val broker = new MessageBroker()
    val pub = new BrokerClient("127.0.0.1", broker.port)
    try {
      (1 to 10).foreach(i =>
        pub.publish(0, null, Array(i.toByte), Seq("n" -> Array(i.toByte))))
      val q = spark.readStream
        .format("graft-broker")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("maxRecordsPerTrigger", "4")
        .load()
        .writeStream.format("memory").queryName("broker_ac").start()
      try {
        q.processAllAvailable()
        // nothing dropped by the cap...
        assert(spark.sql("SELECT count(*) FROM broker_ac").head().getLong(0) == 10)
        assert(spark.sql("SELECT count(DISTINCT offset) FROM broker_ac")
          .head().getLong(0) == 10)
        // ...and the backlog really was drained in capped micro-batches
        val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
        assert(batchSizes.length >= 3 && batchSizes.max <= 4,
          s"expected >=3 batches of <=4 rows, got ${batchSizes.mkString(",")}")
      } finally q.stop()
    } finally { pub.close(); broker.close() }
  }

  test("admission control is backlog-proportional, not even-split") {
    // 9 records on shard 0, 1 on shard 1, cap 5: an even split would
    // strand allocation on the near-idle shard (2+1 consumed); the
    // proportional split drains ~cap records per batch regardless of
    // which shard holds the backlog
    val broker = new MessageBroker()
    val pub = new BrokerClient("127.0.0.1", broker.port)
    try {
      pub.addShard()
      (1 to 9).foreach(i => pub.publish(0, null, Array(i.toByte), Nil))
      pub.publish(1, null, Array(0.toByte), Nil)
      val q = spark.readStream
        .format("graft-broker")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("maxRecordsPerTrigger", "5")
        .load()
        .writeStream.format("memory").queryName("broker_prop").start()
      try {
        q.processAllAvailable()
        assert(spark.sql("SELECT count(*) FROM broker_prop").head().getLong(0) == 10)
        val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
        // 10 rows under a proportional cap of 5 (+ the ≥1 floor) must
        // drain in 2 batches; an even split would need 3+
        assert(batchSizes.length == 2,
          s"expected 2 proportional batches, got ${batchSizes.mkString(",")}")
      } finally q.stop()
    } finally { pub.close(); broker.close() }
  }

  test("batch read: one-shot backfill snapshot of all shards") {
    val broker = new MessageBroker()
    val pub = new BrokerClient("127.0.0.1", broker.port)
    try {
      pub.addShard()
      (1 to 3).foreach(i => pub.publish(0, null, Array(i.toByte), Nil))
      (1 to 2).foreach(i => pub.publish(1, null, Array(i.toByte), Nil))
      val snap = spark.read
        .format("graft-broker")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .load()
      assert(snap.count() == 5)
      assert(snap.groupBy("partition").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap == Map(0 -> 3L, 1 -> 2L))

      // after an ack truncates shard 0 below offset 2, a fresh batch
      // read must plan from the truncation floor, not offset 0 —
      // planning from 0 would trip the vanished-range guard
      pub.ack(0, 2L)
      val afterAck = spark.read
        .format("graft-broker")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .load()
      assert(afterAck.count() == 3)
      assert(afterAck.groupBy("partition").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap == Map(0 -> 1L, 1 -> 2L))
    } finally { pub.close(); broker.close() }
  }

  test("ack-after-write truncation bounds broker memory; checkpoint restart resumes at the floor") {
    val base = Files.createTempDirectory("graft-broker-ack").toString
    val broker = new MessageBroker()
    val pub = new BrokerClient("127.0.0.1", broker.port)
    try {
      (1 to 8).foreach(i => pub.publish(0, null, Array(i.toByte), Nil))
      // file sink: checkpoint-recoverable, so the restart below is the
      // real resume path (the memory sink can't recover a checkpoint)
      def startQuery() = spark.readStream
        .format("graft-broker")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .load()
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt").start()
      val q = startQuery()
      try {
        q.processAllAvailable()
        // the engine acks a batch's source offsets when it constructs
        // the NEXT batch — publish once more to force that
        pub.publish(0, null, Array(9.toByte), Nil)
        q.processAllAvailable()
      } finally q.stop()
      // the committed first batch was acked and truncated server-side:
      // broker memory holds only the unacked tail, not stream history
      assert(broker.baseOffsets.head >= 8L)
      assert(broker.endOffsets == Seq(9L))
      // fetching below the floor returns empty, not silently-later data
      assert(pub.fetch(0, 0L, 4).isEmpty)

      // restart FROM THE CHECKPOINT resumes at/above the floor and
      // consumes exactly the new records — truncation is invisible to
      // the well-behaved consumer (no error, no duplicates, no holes)
      (10 to 13).foreach(i => pub.publish(0, null, Array(i.toByte), Nil))
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()
      val out = spark.read.parquet(s"$base/out")
      assert(out.count() == 13)
      assert(out.select("offset").distinct().count() == 13)
    } finally { pub.close(); broker.close() }
  }

  test("replay below the truncation floor fails loudly, never returns silence") {
    val base = Files.createTempDirectory("graft-broker-floor").toString
    val broker = new MessageBroker()
    val pub = new BrokerClient("127.0.0.1", broker.port)
    try {
      (1 to 5).foreach(i => pub.publish(0, null, Array(i.toByte), Nil))
      // a prior consumer acked everything; its checkpoint is then lost
      assert(pub.ack(0, 5L) == 5L)
      pub.publish(0, null, Array(6.toByte), Nil)
      // a FRESH checkpoint starts from offset 0 — below the floor; the
      // planned range [0, 6) is partly gone and the reader must error,
      // not deliver a stream with a silent 5-record hole
      val q = spark.readStream
        .format("graft-broker")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .load()
        .writeStream.format("memory").queryName("broker_floor")
        .option("checkpointLocation", s"$base/ckpt-fresh").start()
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      q.stop()
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(_.getMessage != null) &&
        causes(ex).exists(c => c.getMessage != null &&
          c.getMessage.contains("vanished")),
        s"expected the vanished-range error, got: $ex")
    } finally { pub.close(); broker.close() }
  }

  test("event-time windows + watermark work over the DSv2 broker source") {
    // the integration risk of a custom MicroBatchStream: watermark
    // tracking and event-time aggregation must ride the source's
    // timestamp column like they do on the built-in sources
    val broker = new MessageBroker()
    val pub = new BrokerClient("127.0.0.1", broker.port)
    try {
      (1 to 3).foreach(_ => pub.publish(0, "k".getBytes, "v".getBytes, Nil))
      val counts = spark.readStream
        .format("graft-broker")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .load()
        .withWatermark("timestamp", "1 second")
        .groupBy(org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("timestamp"), "10 seconds"))
        .count()
      val q = counts.writeStream
        .format("memory").queryName("broker_win").outputMode("update").start()
      try {
        q.processAllAvailable()
        val total = spark.sql("SELECT sum(count) FROM broker_win")
          .head().getLong(0)
        assert(total == 3, s"windowed count over broker source: $total")
        // a second publish batch lands in the running aggregation
        (1 to 2).foreach(_ => pub.publish(0, "k".getBytes, "v".getBytes, Nil))
        q.processAllAvailable()
        val total2 = spark.sql(
          """SELECT sum(count) FROM (
            |  SELECT max(count) AS count FROM broker_win GROUP BY window
            |)""".stripMargin).head().getLong(0)
        assert(total2 == 5, s"updated windowed count: $total2")
      } finally q.stop()
    } finally {
      pub.close()
      broker.close()
    }
  }
}
