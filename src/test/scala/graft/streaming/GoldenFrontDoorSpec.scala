package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.events.EventSink
import graft.sources.{BrokerClient, MessageBroker}
import graft.storage.AstarteStore
import graft.triggers._

/** The reference's "simple flow" (data_updater_test.exs:51-943) driven
  * END-TO-END through the streaming front door in ONE run: volatile
  * trigger install/delete over the RPC control stream, then the full
  * 13-counted-message lifecycle — connect, introspection, property
  * writes, datastream write, introspection update, five object
  * messages (incl. the legacy bare-document and `{}` forms), the
  * /producer/properties prune, unset, disconnect — published to the
  * TCP broker, consumed by the `graft-broker` DSv2 source, folded by
  * the keyed state machine, landed in the store and the event sink.
  *
  * Asserts the reference's EXACT golden counters — 45013 msgs /
  * 4500692 bytes from the 45000/4500000 seed, per-interface exchanged
  * maps TestObject=5/243, LCDMonitor=4/187, SimpleStreamTest=1/45
  * (data_updater_test.exs:930-943) — and the no-extra-events
  * invariant (exactly the 4 events the reference consumes:
  * device_connected, incoming_data, value_change_applied,
  * path_removed).
  */
class GoldenFrontDoorSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val realm = "autotestrealm"
  private val dev = "f0VMRgIBAQAAAAAAAAAAAA"

  private val lcd = InterfaceDescriptor("com.test.LCDMonitor", 1, 3,
    InterfaceType.Properties, Ownership.Device, Aggregation.Individual)
  private val stream = InterfaceDescriptor("com.test.SimpleStreamTest", 1, 0,
    InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
  private val obj = InterfaceDescriptor("com.example.TestObject", 1, 5,
    InterfaceType.Datastream, Ownership.Device, Aggregation.Object)

  // the reference's DB-fixture triggers: device_connected,
  // greater-than incoming on /weekSchedule/10/start, path_removed
  // scoped to /time/from (only ONE remove event fires in the flow)
  private val registry = Registry(
    Map(lcd.name -> lcd, stream.name -> stream, obj.name -> obj),
    Map(
      lcd.name -> Seq(
        Mapping(lcd.name, 1, "/time/from", ALongInteger, allowUnset = true),
        Mapping(lcd.name, 1, "/time/to", ALongInteger, allowUnset = true),
        Mapping(lcd.name, 1, "/weekSchedule/%{day}/start", ALongInteger, allowUnset = true)),
      stream.name -> Seq(
        Mapping(stream.name, 1, "/%{itemIndex}/value", AInteger)),
      obj.name -> Seq(
        Mapping(obj.name, 1, "/string", AString),
        Mapping(obj.name, 1, "/value", ADouble))),
    Seq(
      Trigger("db-conn", TriggerEventType.DeviceConnected,
        TriggerScope.AnyDevice, None, MatchOperator.Any, null,
        List("test_events")),
      Trigger("db-gt", TriggerEventType.IncomingData,
        TriggerScope.OnInterface(lcd.name, 1), Some("/weekSchedule/10/start"),
        MatchOperator.GreaterThan, 9L, List("test_events")),
      Trigger("db-rm", TriggerEventType.PathRemoved,
        TriggerScope.OnInterface(lcd.name, 1), Some("/time/from"),
        MatchOperator.Any, null, List("test_events"))))

  private def headers(msgType: String, iface: String = null,
      path: String = null, controlPath: String = null,
      ip: String = null): Seq[(String, Array[Byte])] = Seq(
    Some("x_astarte_msg_type" -> msgType.getBytes),
    Some("x_astarte_realm" -> realm.getBytes),
    Some("x_astarte_device_id" -> dev.getBytes),
    Option(iface).map(v => "x_astarte_interface" -> v.getBytes),
    Option(path).map(v => "x_astarte_path" -> v.getBytes),
    Option(controlPath).map(v => "x_astarte_control_path" -> v.getBytes),
    Option(ip).map(v => "x_astarte_remote_ip" -> v.getBytes)).flatten

  test("simple flow golden counters through broker + DSv2 + RPC control stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-golden-fd").toString
    val broker = new MessageBroker()
    val pub = new BrokerClient("127.0.0.1", broker.port)
    val store = new AstarteStore(s"$base/store")
    val sink = new EventSink(s"$base/events")

    // --- seed (the reference's insert_device fixture): 45000 msgs /
    // 4500000 bytes, LCD+Stream introspection, and the stored
    // property /weekSchedule/10/start = 42 the value-change trigger
    // compares against after the ST8 session bootstrap
    val seedTs = 1507000000000L
    store.applyEffects(Seq(
      EffectRow("property_upsert", realm, dev, lcd.name, 1,
        "/weekSchedule/%{day}/start", "/weekSchedule/10/start",
        ALongInteger.code, Bson.encode(Seq("v" -> 42L)), null,
        seedTs, seedTs, 0, null, null, null),
      EffectRow.blank("device_update", realm, dev).copy(
        receptionMs = seedTs, submillis = 0,
        detail = s"""{"introspection":{"${lcd.name}":[1,0],"${stream.name}":[1,0]},""" +
          s""""total_received_msgs":45000,"total_received_bytes":4500000}""")
    ).toDS(), registry)

    val plane = new RpcControlPlane(
      DeviceStateMachine.StaticRegistryProvider(registry))
    val replies = scala.collection.mutable.ArrayBuffer.empty[(String, Either[String, Unit])]
    val calls = MemoryStream[ControlCall]
    val ctrlQ = RpcControlStream.attach(calls.toDS(), plane,
      onReply = (id, bytes) =>
        replies.synchronized { replies += id -> RpcWire.decodeReply(bytes) })

    val dataQ = Pipeline.startBootstrapped(spark, realm,
      WireSource.brokerSource(spark, "127.0.0.1", broker.port),
      plane, store, sink, s"$base/ckpt")

    def publish(msgType: String, payload: Array[Byte], iface: String = null,
        path: String = null, controlPath: String = null, ip: String = null): Unit =
      pub.publish(0, dev.getBytes, payload,
        headers(msgType, iface, path, controlPath, ip))

    try {
      // volatile device trigger installed then deleted BEFORE the
      // connect — the later connect must not fire it
      val volConn = Trigger("vol-conn", TriggerEventType.DeviceConnected,
        TriggerScope.OnDevice(dev), None, MatchOperator.Any, null,
        List("vol_events"))
      calls.addData(
        ControlCall("c1", RpcWire.encodeInstall(realm, dev, "p", volConn), 1),
        ControlCall("c2", RpcWire.encodeDelete(realm, dev, "vol-conn"), 2))
      ctrlQ.processAllAvailable()
      assert(replies.synchronized(replies.toList) ==
        List("c1" -> Right(()), "c2" -> Right(())))

      // batch 1: connect, announce, two property writes (no events)
      publish("connection", Array.emptyByteArray, ip = "10.0.0.1")
      publish("introspection",
        s"${lcd.name}:1:0;${stream.name}:1:0".getBytes)
      publish("data", Bson.encode(Seq("v" -> 9000)), lcd.name, "/time/from") // int32, as the reference encodes
      publish("data", Bson.encode(Seq("v" -> 9)), lcd.name, "/weekSchedule/9/start")
      dataQ.processAllAvailable()

      // volatile value_change_applied installed mid-stream (the
      // reference installs it between the 9/start and 10/start
      // writes); a bad install error-replies and changes nothing
      val volChg = Trigger("vol-chg", TriggerEventType.ValueChangeApplied,
        TriggerScope.OnInterface(lcd.name, 1), Some("/weekSchedule/10/start"),
        MatchOperator.Any, null, List("test_events"))
      calls.addData(
        ControlCall("c3", RpcWire.encodeInstall(realm, dev, "p", volChg), 3),
        ControlCall("c4", RpcWire.encodeInstall(realm, dev, "p",
          volChg.copy(triggerId = "vol-bad",
            scope = TriggerScope.OnInterface("com.missing.Interface", 1))), 4))
      ctrlQ.processAllAvailable()
      assert(replies.synchronized(replies.drop(2).toList) ==
        List("c3" -> Right(()), "c4" -> Left("interface_not_found")))

      // batch 2: the GT trigger and the freshly installed volatile
      // value_change_applied both fire on {v: 10} (old stored 42)
      publish("data", Bson.encode(Seq("v" -> 10)), lcd.name, "/weekSchedule/10/start")
      // datastream value + introspection update + the five object
      // messages (legacy bare docs, nested {v:{}}, partial, empty)
      publish("data", Bson.encode(Seq("v" -> 5)), stream.name, "/0/value")
      publish("introspection",
        s"${lcd.name}:1:0;${obj.name}:1:5;${stream.name}:1:0".getBytes)
      publish("data", Bson.encode(Seq(
        "string" -> "Astarteです", "value" -> 1.9)), obj.name, "/")
      publish("data", Bson.encode(Seq("string" -> "Hello World');")), obj.name, "/")
      publish("data", Bson.encode(Seq(
        "v" -> scala.collection.immutable.ListMap("value" -> 0))), obj.name, "/")
      publish("data", Bson.encode(Seq("string" -> "zzz")), obj.name, "/")
      publish("data", Bson.encode(Seq.empty), obj.name, "/")
      // prune: announced set keeps /time/to + /weekSchedule/10/start —
      // /time/from (path_removed event) and /weekSchedule/9/start drop
      val plain = s"${lcd.name}/time/to;${lcd.name}/weekSchedule/10/start"
      val pruned = Array[Byte](0, 0, 0, 98) ++
        PayloadCodec.deflateProperties(plain).drop(4)
      publish("control", pruned, controlPath = "/producer/properties")
      dataQ.processAllAvailable()

      // the reference deletes the volatile trigger before the unset
      calls.addData(ControlCall("c5", RpcWire.encodeDelete(realm, dev, "vol-chg"), 5))
      ctrlQ.processAllAvailable()

      // batch 3: unset + disconnect
      publish("data", Array.emptyByteArray, lcd.name, "/weekSchedule/10/start")
      publish("disconnection", Array.emptyByteArray)
      dataQ.processAllAvailable()
    } finally {
      dataQ.stop(); ctrlQ.stop()
      pub.close(); broker.close()
    }

    // --- the golden device row (data_updater_test.exs:930-943)
    val row = store.devicesSnapshot(spark).collect().find(_.device_id == dev).get
    assert(!row.connected)
    assert(row.total_received_msgs == 45013L)
    assert(row.total_received_bytes == 4500692L)
    assert(row.exchanged_msgs_by_interface == Map(
      s"${obj.name}:1" -> 5L, s"${lcd.name}:1" -> 4L, s"${stream.name}:1" -> 1L))
    assert(row.exchanged_bytes_by_interface == Map(
      s"${obj.name}:1" -> 243L, s"${lcd.name}:1" -> 187L, s"${stream.name}:1" -> 45L))

    // --- store end state: pruned + unset properties gone, kept value
    // intact, datastream row landed, all five object rows (incl. the
    // all-NULL `{}` row) in the typed table
    val longs = store.propertyValues(spark, ALongInteger).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("value")).toMap
    assert(!longs.contains("/time/from"))         // pruned
    assert(!longs.contains("/weekSchedule/9/start")) // pruned
    assert(!longs.contains("/weekSchedule/10/start")) // unset
    val ds = store.datastreams(spark).collect()
    assert(ds.length == 1 && ds.head.getAs[Int]("integer_value") == 5)
    // broker publish timestamps can collide on the millisecond, so
    // compare the typed rows as a multiset (FIFO order is separately
    // guaranteed by the (reception, offset) sort in the fold)
    val objRows = store.objectTable(spark, obj, registry.mappingsOf(obj.name))
      .collect()
      .map(r => (Option(r.getAs[String]("v_string")).orNull,
        if (r.isNullAt(r.fieldIndex("v_value"))) null
        else java.lang.Double.valueOf(r.getAs[Double]("v_value"))))
      .toSeq.sortBy(t => String.valueOf(t._1) + String.valueOf(t._2))
    assert(objRows == Seq[(String, java.lang.Double)](
      ("Astarteです", 1.9d), ("Hello World');", null), (null, 0.0d),
      ("zzz", null), (null, null))
      .sortBy(t => String.valueOf(t._1) + String.valueOf(t._2)))

    // --- no-extra-events invariant: exactly the four events the
    // reference consumes, nothing from the deleted volatile triggers
    val events = sink.read(spark)
      .select("event_type", "routing_key").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(events == Seq(
      "device_connected" -> "test_events",
      "incoming_data" -> "test_events",
      "path_removed" -> "test_events",
      "value_change_applied" -> "test_events").map(t => (t._1, t._2)))

    // the value_change_applied event carried old {v:42} → new {v:10}
    // (the reference's ValueChangeAppliedEvent assertion)
    val chg = sink.read(spark)
      .filter(org.apache.spark.sql.functions.col("event_type") === "value_change_applied")
      .collect().head
    // new value re-encodes the int32 wire form; the old value comes
    // from the ST8 bootstrap's typed-column re-encode (int64)
    assert(java.util.Arrays.equals(
      chg.getAs[Array[Byte]]("bson_value"), Bson.encode(Seq("v" -> 10))))
    assert(java.util.Arrays.equals(
      chg.getAs[Array[Byte]]("bson_prev_value"), Bson.encode(Seq("v" -> 42L))))
  }
}
