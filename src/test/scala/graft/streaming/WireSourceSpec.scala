package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.events.EventSink
import graft.storage.AstarteStore
import graft.triggers._

/** S1 end-to-end over the broker wire schema: records with the exact
  * Kafka source shape (headers array, binary value, partition/offset)
  * decode to envelopes via header routing and drive the full
  * pipeline; invalid records are discarded like the reference's
  * handle_invalid_msg.
  */
class WireSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rec(
      msgType: String, realm: String, dev: String, payload: Array[Byte],
      offset: Long, iface: String = null, path: String = null,
      ip: String = null, controlPath: String = null,
      partition: Int = 0): WireRecord = {
    val hs = Seq(
      Option(msgType).map(v => WireHeader("x_astarte_msg_type", v.getBytes)),
      Option(realm).map(v => WireHeader("x_astarte_realm", v.getBytes)),
      Option(dev).map(v => WireHeader("x_astarte_device_id", v.getBytes)),
      Option(iface).map(v => WireHeader("x_astarte_interface", v.getBytes)),
      Option(path).map(v => WireHeader("x_astarte_path", v.getBytes)),
      Option(ip).map(v => WireHeader("x_astarte_remote_ip", v.getBytes)),
      Option(controlPath).map(v => WireHeader("x_astarte_control_path", v.getBytes))
    ).flatten.toArray
    WireRecord(Option(dev).map(_.getBytes).orNull, payload,
      "astarte-data", partition, offset,
      new java.sql.Timestamp(1700000000000L + offset), 0, hs)
  }

  test("kafka-shaped records decode, route by headers, and drive the pipeline") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-wire").toString

    val iface = InterfaceDescriptor("com.test.SimpleStreamTest", 1, 0,
      InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
    val registry = Registry(
      Map(iface.name -> iface),
      Map(iface.name -> Seq(Mapping(iface.name, 1, "/%{i}/value", AInteger))),
      Seq(Trigger("t1", TriggerEventType.IncomingData,
        TriggerScope.OnInterface(iface.name, 1), None,
        MatchOperator.GreaterThan, 10, List("test_events"))))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WireRecord]
    val store = new AstarteStore(s"$base/store")
    val sink = new EventSink(s"$base/events")
    val q = Pipeline.start(
      WireSource.decodeEnvelopes(input.toDF()),
      DeviceStateMachine.StaticRegistryProvider(registry),
      store, sink, s"$base/ckpt")
    try {
      input.addData(
        rec("connection", "r", "devA", Array.emptyByteArray, 1, ip = "10.0.0.9"),
        rec("data", "r", "devA", Bson.encode(Seq("v" -> 42)), 2,
          iface = iface.name, path = "/3/value", partition = 1),
        rec("data", "r", "devB", Bson.encode(Seq("v" -> 5)), 3,
          iface = iface.name, path = "/0/value", partition = 2),
        // invalid: data without interface header → discarded silently
        rec("data", "r", "devC", Bson.encode(Seq("v" -> 1)), 4, path = "/0/value"),
        // invalid: no device id → discarded
        rec("data", "r", null, Bson.encode(Seq("v" -> 1)), 5,
          iface = iface.name, path = "/1/value"),
        rec("disconnection", "r", "devA", Array.emptyByteArray, 6))
      q.processAllAvailable()
    } finally q.stop()

    // both valid datastream values landed, the discarded ones did not
    val rows = store.datastreams(spark).collect()
    assert(rows.map(r => (r.getAs[String]("device_id"), r.getAs[String]("path"))).toSet ==
      Set("devA" -> "/3/value", "devB" -> "/0/value"))
    assert(!rows.exists(_.getAs[String]("device_id") == "devC"))

    // header routing: connection landed (ip recorded), trigger fired
    // only for 42 (GT 10)
    val updates = store.deviceUpdates(spark).collect().map(_.getAs[String]("update_json"))
    assert(updates.exists(j => j.contains(""""connected":true""") && j.contains("10.0.0.9")))
    assert(updates.exists(_.contains(""""connected":false""")))
    val fired = sink.read(spark).filter("event_type = 'incoming_data'")
      .select("device_id").collect().map(_.getString(0))
    assert(fired.toSeq == Seq("devA"))
  }

  test("file wire spool: real readStream end-to-end, surviving a shard rebalance") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-wirespool").toString

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
    def run(spool: String, ckpt: String): Unit = {
      // default maxFilesPerTrigger: a spool batch lands in one
      // micro-batch. The file source orders FILES by modification
      // time, which for concurrently-written parts is arbitrary — a
      // broker partition never reorders like that, so don't split one
      // spool batch across micro-batches in a test that asserts FIFO.
      val q = Pipeline.startBootstrapped(spark, "r",
        WireSource.fileWireSource(spark, s"$base/$spool/*"),
        DeviceStateMachine.StaticRegistryProvider(registry),
        store, sink, s"$base/$ckpt")
      try q.processAllAvailable() finally q.stop()
    }

    // spool 1 through the real file readStream (one file per
    // micro-batch): devA on source partition 0, devB on partition 1
    new java.io.File(s"$base/spool1").mkdirs()
    Seq(
      rec("connection", "r", "devA", Array.emptyByteArray, 1, ip = "10.0.0.1"),
      rec("data", "r", "devA", Bson.encode(Seq("v" -> 12)), 2,
        iface = iface.name, path = "/1/value", partition = 0),
      rec("data", "r", "devB", Bson.encode(Seq("v" -> 3)), 3,
        iface = iface.name, path = "/2/value", partition = 1)
    ).toDS().write.parquet(s"$base/spool1/batch-0")
    run("spool1", "ckpt1")

    // checkpoint lost + SHARD REBALANCE: the devices swap source
    // partitions (a consumer-group rebalance moving queue shards) and
    // the query restarts bootstrapped from the durable store with a
    // fresh checkpoint — counters must resume, order must hold, and an
    // invalid record (no interface header) must be discarded
    new java.io.File(s"$base/spool2").mkdirs()
    Seq(
      rec("data", "r", "devA", Bson.encode(Seq("v" -> 20)), 10,
        iface = iface.name, path = "/1/value", partition = 1),
      rec("data", "r", "devB", Bson.encode(Seq("v" -> 30)), 11,
        iface = iface.name, path = "/2/value", partition = 0),
      rec("data", "r", "devC", Bson.encode(Seq("v" -> 99)), 12, path = "/9/value"),
      rec("disconnection", "r", "devA", Array.emptyByteArray, 13)
    ).toDS().write.parquet(s"$base/spool2/batch-0")
    run("spool2", "ckpt2")

    // every valid value landed exactly once across the rebalance
    val rows = store.datastreams(spark).collect()
    assert(rows.map(r => (r.getAs[String]("device_id"),
        r.getAs[Int]("integer_value"))).toSet ==
      Set(("devA", 12), ("devA", 20), ("devB", 3), ("devB", 30)))

    // devA's disconnect flush proves state resumed across the restart:
    // 2 counted (data) messages, both on the interface — lifecycle
    // msgs don't bump totals — not a from-zero recount of spool 2
    val flush = store.deviceUpdates(spark)
      .filter(org.apache.spark.sql.functions.col("update_json")
        .contains(""""connected":false"""))
      .collect().map(_.getAs[String]("update_json"))
    assert(flush.length == 1)
    assert(flush.head.contains(""""total_received_msgs":2"""))
    assert(flush.head.contains(s""""${iface.name}:1":[2,"""))

    // trigger (GT 10) fired for 12, 20, 30 — never for 3 or devC
    val fired = sink.read(spark).filter("event_type = 'incoming_data'")
      .select("device_id").collect().map(_.getString(0)).sorted.toSeq
    assert(fired == Seq("devA", "devA", "devB"))
  }

  test("a data record carrying only a control path is discarded, not misrouted") {
    import spark.implicits._
    val bad = rec("data", "r", "dX", Bson.encode(Seq("v" -> 1)), 8,
      iface = "i.face", controlPath = "/emptyCache") // no x_astarte_path
    assert(WireSource.decodeEnvelopes(Seq(bad).toDF()).collect().isEmpty)
    // and a control record reads its control path, not the data path
    val ctl = rec("control", "r", "dY", Array.emptyByteArray, 9,
      controlPath = "/emptyCache")
    val out = WireSource.decodeEnvelopes(Seq(ctl).toDF()).collect()
    assert(out.length == 1 && out.head.path == "/emptyCache")
  }

  test("duplicate header keys do not kill the decode (first wins)") {
    import spark.implicits._
    val dup = rec("data", "r", "d1", Bson.encode(Seq("v" -> 7)), 9,
      iface = "i.face", path = "/p")
    val poisoned = dup.copy(headers =
      dup.headers :+ WireHeader("x_astarte_device_id", "SHADOW".getBytes))
    val out = WireSource.decodeEnvelopes(Seq(poisoned).toDF()).collect()
    assert(out.length == 1 && out.head.deviceId == "d1")
  }

  test("decode is pure column expressions (no UDF in the ingest scan)") {
    import spark.implicits._
    val df = Seq(rec("data", "r", "d", Array[Byte](1), 1,
      iface = "i", path = "/p")).toDF()
    val plan = WireSource.decodeEnvelopes(df).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("udf"))
  }
}
