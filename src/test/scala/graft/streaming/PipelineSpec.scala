package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.events.EventSink
import graft.storage.AstarteStore
import graft.triggers._

/** Full pipeline: file source → state machine → store + event sink,
  * driven through a real streaming query with checkpointing.
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("file source to store and events, with checkpoint") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-pipe").toString
    val srcDir = s"$base/src"
    new java.io.File(srcDir).mkdirs()

    val iface = InterfaceDescriptor("com.test.LCDMonitor", 1, 3,
      InterfaceType.Properties, Ownership.Device, Aggregation.Individual)
    val registry = Registry(
      Map(iface.name -> iface),
      Map(iface.name -> Seq(
        Mapping(iface.name, 1, "/weekSchedule/%{day}/start", ALongInteger))),
      Seq(Trigger("t1", TriggerEventType.IncomingData,
        TriggerScope.OnInterface(iface.name, 1), Some("/weekSchedule//start"),
        MatchOperator.GreaterThan, 9L, List("test_events"))))

    // drop one shard file with 3 messages (2 devices)
    Seq(
      Envelope("r", "devA", "data", iface.name, "/weekSchedule/2/start",
        Bson.encode(Seq("v" -> 12L)), 1000010000L, "ip", 1),
      Envelope("r", "devA", "data", iface.name, "/weekSchedule/2/start",
        Bson.encode(Seq("v" -> 5L)), 1000020000L, "ip", 2),
      Envelope("r", "devB", "data", iface.name, "/weekSchedule/3/start",
        Bson.encode(Seq("v" -> 42L)), 1000030000L, "ip", 3)
    ).toDS().write.parquet(s"$srcDir/shard-0")

    val store = new AstarteStore(s"$base/store")
    val sink = new EventSink(s"$base/events")
    val q = Pipeline.start(
      Pipeline.fileSource(spark, s"$srcDir/*"),
      DeviceStateMachine.StaticRegistryProvider(registry),
      store, sink, s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()

    // properties: LWW per device
    val props = store.propertyValues(spark, ALongInteger).collect()
      .map(r => r.getAs[String]("device_id") -> r.getAs[Long]("value")).toMap
    assert(props == Map("devA" -> 5L, "devB" -> 42L))

    // events: trigger fired for 12 and 42 (GT 9), not 5
    val fired = sink.read(spark)
      .filter("event_type = 'incoming_data'")
      .select("device_id", "wire", "headers", "routing_key")
      .collect()
    assert(fired.map(_.getAs[String]("device_id")).sorted.toSeq == Seq("devA", "devB"))

    // S7 wire parity: each sink row carries decodable SimpleEvent
    // protobuf bytes + the five x_astarte_* headers
    fired.foreach { r =>
      val (_, _, ev) = graft.events.SimpleEventCodec.decode(
        r.getAs[Array[Byte]]("wire"), r.getAs[String]("routing_key"))
      val in = ev.asInstanceOf[graft.events.IncomingData]
      assert(in.deviceId == r.getAs[String]("device_id"))
      assert(in.interface == iface.name)
      val hs = r.getAs[Map[String, String]]("headers")
      assert(hs("x_astarte_event_type") == "incoming_data_event")
      assert(hs("x_astarte_device_id") == in.deviceId)
    }
  }

  test("S5 effectively-once: same-checkpoint restart does not re-apply effects") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-resume").toString
    val srcDir = s"$base/src"; new java.io.File(srcDir).mkdirs()
    val iface = InterfaceDescriptor("e.iface", 1, 0,
      InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
    val registry = Registry(
      Map(iface.name -> iface),
      Map(iface.name -> Seq(Mapping(iface.name, 1, "/v", AInteger))), Nil)
    val store = new AstarteStore(s"$base/store")
    val sink = new EventSink(s"$base/events")
    def startQuery() = Pipeline.start(
      Pipeline.fileSource(spark, s"$srcDir/*"),
      DeviceStateMachine.StaticRegistryProvider(registry),
      store, sink, s"$base/ckpt")

    Seq(Envelope("r", "dev", "data", iface.name, "/v",
      Bson.encode(Seq("v" -> 1)), 3000010000L, "ip", 1)).toDS()
      .write.parquet(s"$srcDir/shard-0")
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(store.datastreams(spark).count() == 1)

    // restart from the SAME checkpoint with a new shard: only the new
    // shard's offsets are processed — the first value is not re-applied
    Seq(Envelope("r", "dev", "data", iface.name, "/v",
      Bson.encode(Seq("v" -> 2)), 3000020000L, "ip", 2)).toDS()
      .write.parquet(s"$srcDir/shard-1")
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val rows = store.datastreams(spark).collect()
    assert(rows.length == 2) // one row per distinct value, no replays
  }

  test("S2 fan-in: two shard sources union into one ordered device stream") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-fanin").toString
    val iface = InterfaceDescriptor("f.iface", 1, 0,
      InterfaceType.Properties, Ownership.Device, Aggregation.Individual)
    val registry = Registry(
      Map(iface.name -> iface),
      Map(iface.name -> Seq(Mapping(iface.name, 1, "/p", ALongInteger))), Nil)

    // the same device's messages split across two shards, with the
    // LATEST write living on shard B — fan-in + per-device re-sort
    // must still apply them in reception order
    new java.io.File(s"$base/sA").mkdirs(); new java.io.File(s"$base/sB").mkdirs()
    Seq(Envelope("r", "dev", "data", iface.name, "/p",
      Bson.encode(Seq("v" -> 1L)), 2000010000L, "ip", 1)).toDS()
      .write.parquet(s"$base/sA/f0")
    Seq(Envelope("r", "dev", "data", iface.name, "/p",
      Bson.encode(Seq("v" -> 2L)), 2000020000L, "ip", 2)).toDS()
      .write.parquet(s"$base/sB/f0")

    val store = new AstarteStore(s"$base/store")
    val q = Pipeline.start(
      Pipeline.fanIn(Seq(
        Pipeline.fileSource(spark, s"$base/sA/*"),
        Pipeline.fileSource(spark, s"$base/sB/*"))),
      DeviceStateMachine.StaticRegistryProvider(registry),
      store, new EventSink(s"$base/events"), s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()

    val props = store.propertyValues(spark, ALongInteger).collect()
    assert(props.length == 1)
    assert(props.head.getAs[Long]("value") == 2L) // shard B's later write wins
  }
}
