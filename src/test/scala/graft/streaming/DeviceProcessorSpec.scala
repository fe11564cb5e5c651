package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.triggers._

/** Golden "simple flow" semantics test: connect → introspection →
  * property writes → datastream write → trigger firing → unset →
  * prune → disconnect, with exact effect/event asserts — the pure
  * re-expression of the reference's end-to-end scenario
  * (data_updater_test.exs "simple flow", fixtures in FIXTURES.md).
  */
class DeviceProcessorSpec extends AnyFunSuite {

  private val realm = "autotestrealm"
  private val deviceId = "f0VMRgIBAQAAAAAAAAAAAA"

  private val lcdMonitor = InterfaceDescriptor("com.test.LCDMonitor", 1, 3,
    InterfaceType.Properties, Ownership.Device, Aggregation.Individual)
  private val simpleStream = InterfaceDescriptor("com.test.SimpleStreamTest", 1, 0,
    InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
  private val testObject = InterfaceDescriptor("com.example.TestObject", 1, 5,
    InterfaceType.Datastream, Ownership.Device, Aggregation.Object)
  private val serverOwned = InterfaceDescriptor("com.test.ServerOwned", 1, 0,
    InterfaceType.Properties, Ownership.Server, Aggregation.Individual)

  private val registry = Registry(
    interfaces = Map(
      lcdMonitor.name -> lcdMonitor, simpleStream.name -> simpleStream,
      testObject.name -> testObject, serverOwned.name -> serverOwned),
    mappings = Map(
      lcdMonitor.name -> Seq(
        Mapping(lcdMonitor.name, 1, "/time/from", ALongInteger, allowUnset = true),
        Mapping(lcdMonitor.name, 1, "/time/to", ALongInteger, allowUnset = true),
        Mapping(lcdMonitor.name, 1, "/weekSchedule/%{day}/start", ALongInteger, allowUnset = true),
        Mapping(lcdMonitor.name, 1, "/weekSchedule/%{day}/stop", ALongInteger, allowUnset = true),
        Mapping(lcdMonitor.name, 1, "/lcdCommand", AString, allowUnset = true)),
      simpleStream.name -> Seq(
        Mapping(simpleStream.name, 1, "/%{itemIndex}/value", AInteger),
        Mapping(simpleStream.name, 1, "/foo/%{param}/stringValue", AString)),
      testObject.name -> Seq(
        Mapping(testObject.name, 1, "/string", AString),
        Mapping(testObject.name, 1, "/value", ADouble)),
      serverOwned.name -> Seq(
        Mapping(serverOwned.name, 1, "/x", AString))),
    triggers = Seq(
      // seed trigger 1: GREATER_THAN 9 on /weekSchedule/%{day}/start
      Trigger("tr1", TriggerEventType.IncomingData,
        TriggerScope.OnInterface(lcdMonitor.name, 1),
        Some("/weekSchedule/%{weekDay}/start"),
        MatchOperator.GreaterThan, 9L, List("test_events")),
      Trigger("tr2", TriggerEventType.InterfaceAdded, TriggerScope.AnyInterface,
        None, MatchOperator.Any, null, List("test_events")),
      Trigger("tr3", TriggerEventType.DeviceConnected,
        TriggerScope.OnDevice(deviceId), None, MatchOperator.Any, null,
        List("test_events")),
      Trigger("tr4", TriggerEventType.PathRemoved,
        TriggerScope.OnInterface(lcdMonitor.name, 1), Some("/time/from"),
        MatchOperator.Any, null, List("test_events")),
      Trigger("tr5", TriggerEventType.ValueChange,
        TriggerScope.OnInterface(lcdMonitor.name, 1), Some("/time/to"),
        MatchOperator.Any, null, List("test_events"))))

  private var offset = 0L
  private def env(msgType: String, iface: String = null, path: String = null,
      payload: Array[Byte] = Array.emptyByteArray,
      tsDecimicros: Long = 15216455705950000L): Envelope = {
    offset += 1
    Envelope(realm, deviceId, msgType, iface, path, payload, tsDecimicros + offset,
      "10.0.0.1", offset)
  }

  private def run(state: DeviceSessionState, e: Envelope) =
    DeviceProcessor.processMessage(state, e, registry)

  test("connection: device_update + device_connected event, no stats bump") {
    val (s, fx) = run(DeviceSessionState.empty, env("connection"))
    assert(s.connected)
    // lifecycle messages don't count (reference impl.ex:89-133)
    assert(s.totalReceivedMsgs == 0)
    assert(fx.map(_.kind) == Seq("device_update", "event"))
    assert(fx(1).eventType == "device_connected")
    assert(fx(1).target == "test_events")
  }

  test("introspection: interface_added events + kv register for major 0") {
    val (s, fx) = run(DeviceSessionState.empty.copy(connected = true),
      env("introspection", payload =
        "com.test.LCDMonitor:1:0;com.test.SimpleStreamTest:1:0".getBytes))
    assert(s.introspection == Map("com.test.LCDMonitor" -> 1, "com.test.SimpleStreamTest" -> 1))
    val added = fx.filter(_.eventType == "interface_added")
    assert(added.map(_.iface).toSet ==
      Set("com.test.LCDMonitor", "com.test.SimpleStreamTest"))
    // neither interface has major 0 → no kv registrations
    assert(!fx.exists(_.kind == "kv_store"))
    assert(fx.last.kind == "device_update")
  }

  test("introspection idempotence: re-announcing fires no diff events") {
    val s0 = DeviceSessionState.empty.copy(
      introspection = Map("com.test.LCDMonitor" -> 1),
      introspectionMinor = Map("com.test.LCDMonitor" -> 0))
    val (_, fx) = run(s0, env("introspection",
      payload = "com.test.LCDMonitor:1:0".getBytes))
    assert(!fx.exists(_.eventType == "interface_added"))
    assert(!fx.exists(_.eventType == "interface_removed"))
  }

  test("property set: upsert effect + incoming_data trigger fires on match") {
    val s0 = DeviceSessionState.empty.copy(
      introspection = Map(lcdMonitor.name -> 1))
    // /weekSchedule/10/start = 42 > 9 → trigger tr1 fires
    val payload = Bson.encode(Seq("v" -> 42L))
    val (s1, fx) = run(s0, env("data", lcdMonitor.name, "/weekSchedule/10/start", payload))
    val kinds = fx.map(_.kind)
    assert(kinds.contains("property_upsert"))
    val incoming = fx.filter(_.eventType == "incoming_data")
    assert(incoming.size == 1 && incoming.head.target == "test_events")
    assert(s1.properties.contains("com.test.LCDMonitor/weekSchedule/10/start"))
    // value 5 < 9 → no trigger
    val (_, fx2) = run(s1, env("data", lcdMonitor.name, "/weekSchedule/10/start",
      Bson.encode(Seq("v" -> 5L))))
    assert(!fx2.exists(_.eventType == "incoming_data"))
  }

  test("value_change fires before write only when value changes") {
    val s0 = DeviceSessionState.empty
    val p8 = Bson.encode(Seq("v" -> 8L))
    val (s1, fx1) = run(s0, env("data", lcdMonitor.name, "/time/to", p8))
    // first write: path created, no previous → value_change fires (created)
    assert(fx1.exists(_.eventType == "value_change"))
    // same value again: no change events
    val (s2, fx2) = run(s1, env("data", lcdMonitor.name, "/time/to", p8))
    assert(!fx2.exists(_.eventType == "value_change"))
    assert(!fx2.exists(_.eventType == "value_change_applied"))
    // different value: fires with prev
    val (_, fx3) = run(s2, env("data", lcdMonitor.name, "/time/to",
      Bson.encode(Seq("v" -> 20L))))
    val vc = fx3.filter(_.eventType == "value_change")
    assert(vc.size == 1)
    assert(Bson.decode(vc.head.prevBson).get("v") == 8L)
    assert(Bson.decode(vc.head.valueBson).get("v") == 20L)
  }

  test("datastream append + object aggregation routing") {
    val s0 = DeviceSessionState.empty
    val (_, fx) = run(s0, env("data", simpleStream.name, "/0/value",
      Bson.encode(Seq("v" -> 5))))
    assert(fx.exists(_.kind == "datastream_append"))
    val (_, fx2) = run(s0, env("data", testObject.name, "/",
      Bson.encode(Seq("v" -> scala.collection.immutable.ListMap(
        "string" -> "aaa", "value" -> 1.1)))))
    assert(fx2.exists(_.kind == "object_append"))
  }

  test("object aggregation rejects unknown keys and struct values") {
    val s0 = DeviceSessionState.empty
    val (_, fx) = run(s0, env("data", testObject.name, "/",
      Bson.encode(Seq("v" -> scala.collection.immutable.ListMap("nope" -> 1.0)))))
    assert(fx.exists(e => e.kind == "error" && e.detail == "unexpected_value_type"))
    val (_, fx2) = run(s0, env("data", testObject.name, "/",
      Bson.encode(Seq("v" -> scala.collection.immutable.ListMap(
        "string" -> scala.collection.immutable.ListMap("x" -> 1))))))
    assert(fx2.exists(_.kind == "error"))
  }

  test("minor bump: interface_minor_updated fires and the new leaf is registry-gated") {
    import scala.collection.immutable.ListMap
    val objV6 = testObject.copy(minor = 6)
    val mapsV6 = registry.mappings(testObject.name) :+
      Mapping(testObject.name, 1, "/extra", ALongInteger)
    val regV6 = Registry(
      registry.interfaces + (testObject.name -> objV6),
      registry.mappings + (testObject.name -> mapsV6),
      registry.triggers :+ Trigger("tmin", TriggerEventType.InterfaceMinorUpdated,
        TriggerScope.AnyInterface, None, MatchOperator.Any, null,
        List("test_events")))
    val s0 = DeviceSessionState.empty.copy(
      introspection = Map(testObject.name -> 1),
      introspectionMinor = Map(testObject.name -> 5))
    // a payload carrying the new leaf is rejected while the registry
    // still serves v1.5 — the schema gate is registry-driven
    val payload = Bson.encode(Seq("v" -> ListMap(
      "extra" -> 7L, "string" -> "bbb", "value" -> 2.2)))
    val (_, rej) = DeviceProcessor.processMessage(s0,
      env("data", testObject.name, "/", payload), registry)
    assert(rej.exists(e => e.kind == "error" && e.detail == "unexpected_value_type"))
    // announcing v1.6 under the upgraded registry fires the minor
    // bump event with old->new in the detail (reference
    // data_updater_test.exs interface upgrade scenario)
    val (s1, fx) = DeviceProcessor.processMessage(s0,
      env("introspection", payload = s"${testObject.name}:1:6".getBytes), regV6)
    val bump = fx.filter(_.eventType == "interface_minor_updated")
    assert(bump.map(_.detail) == Seq("5->6"))
    assert(bump.head.iface == testObject.name && bump.head.major == 1)
    assert(!fx.exists(_.eventType == "interface_added"))
    assert(s1.introspectionMinor(testObject.name) == 6)
    // the same payload now routes as an object append
    val (_, ok) = DeviceProcessor.processMessage(s1,
      env("data", testObject.name, "/", payload), regV6)
    assert(ok.exists(_.kind == "object_append"))
    assert(!ok.exists(_.kind == "error"))
  }

  test("server-owned interface rejects device writes (clean session)") {
    val (s, fx) = run(DeviceSessionState.empty,
      env("data", serverOwned.name, "/x", Bson.encode(Seq("v" -> "hi"))))
    assert(fx.map(_.kind) == Seq("error", "device_update", "command"))
    assert(fx.head.detail == "cannot_write_on_server_owned_interface")
    assert(fx(2).detail == "disconnect")
    assert(s.pendingEmptyCache)
    assert(s.totalReceivedMsgs == 1) // stats bumped on error too
  }

  test("type mismatch → clean session") {
    val (_, fx) = run(DeviceSessionState.empty,
      env("data", lcdMonitor.name, "/time/to", Bson.encode(Seq("v" -> "not a long"))))
    assert(fx.head.kind == "error")
    assert(fx.head.detail == "unexpected_value_type")
  }

  test("unset deletes the property and fires path_removed") {
    val s0 = DeviceSessionState.empty
    val (s1, _) = run(s0, env("data", lcdMonitor.name, "/time/from",
      Bson.encode(Seq("v" -> 8L))))
    assert(s1.properties.contains("com.test.LCDMonitor/time/from"))
    val (s2, fx) = run(s1, env("data", lcdMonitor.name, "/time/from",
      Array.emptyByteArray))
    assert(fx.exists(_.kind == "property_unset"))
    assert(fx.exists(_.eventType == "path_removed"))
    assert(!s2.properties.contains("com.test.LCDMonitor/time/from"))
  }

  test("producer/properties prune: anti-join deletes unannounced paths") {
    val s0 = DeviceSessionState.empty.copy(
      introspection = Map(lcdMonitor.name -> 1),
      properties = Map(
        "com.test.LCDMonitor/time/to" -> Bson.encode(Seq("v" -> 20L)),
        "com.test.LCDMonitor/time/from" -> Bson.encode(Seq("v" -> 8L)),
        "com.test.LCDMonitor/weekSchedule/10/start" -> Bson.encode(Seq("v" -> 42L))))
    // device announces it only owns /time/to and /weekSchedule/10/start
    val wire = PayloadCodec.deflateProperties(
      "com.test.LCDMonitor/time/to;com.test.LCDMonitor/weekSchedule/10/start")
    val (s1, fx) = run(s0, env("control", path = "/producer/properties", payload = wire))
    val deletes = fx.filter(_.kind == "property_unset")
    assert(deletes.map(_.path) == Seq("/time/from"))
    // the tombstone carries the resolved storage key + LWW ordering
    // fields, so it lands on (and outranks) the stored upsert
    assert(deletes.head.endpoint == "/time/from")
    assert(deletes.head.valueTypeCode == AstarteValueType.ALongInteger.code)
    assert(deletes.head.submillis >= 0)
    assert(Bson.decode(deletes.head.prevBson).get("v") == 8L)
    // seed trigger tr4 on /time/from fires path_removed
    assert(fx.exists(e => e.eventType == "path_removed" && e.path == "/time/from"))
    assert(!s1.properties.contains("com.test.LCDMonitor/time/from"))
    assert(s1.properties.contains("com.test.LCDMonitor/time/to"))
  }

  test("disconnect flushes exact message/byte counters") {
    var s = DeviceSessionState.empty
    var totalBytes = 0L
    // connection
    val eConn = env("connection")
    s = run(s, eConn)._1
    // two data messages
    val p1 = Bson.encode(Seq("v" -> 42L))
    val e1 = env("data", lcdMonitor.name, "/weekSchedule/10/start", p1)
    totalBytes += p1.length + lcdMonitor.name.length + "/weekSchedule/10/start".length
    s = run(s, e1)._1
    val p2 = Bson.encode(Seq("v" -> 5))
    val e2 = env("data", simpleStream.name, "/0/value", p2)
    totalBytes += p2.length + simpleStream.name.length + "/0/value".length
    s = run(s, e2)._1
    val (s2, fx) = run(s, env("disconnection"))
    assert(!s2.connected)
    assert(s2.totalReceivedMsgs == 2) // lifecycle messages don't count
    val upd = fx.find(_.kind == "device_update").get
    assert(upd.detail.contains(s""""total_received_msgs":2"""))
    // exchanged counters keyed per (interface, major) like the
    // reference's tuple key (impl.ex:640-674)
    assert(upd.detail.contains(s""""com.test.LCDMonitor:1":[1,"""))
    assert(upd.detail.contains(s""""com.test.SimpleStreamTest:1":[1,"""))
  }

  test("exchanged stats: errored data message bumps totals only") {
    var s = DeviceSessionState.empty
    s = run(s, env("data", lcdMonitor.name, "/weekSchedule/10/start",
      Bson.encode(Seq("v" -> 42L))))._1
    // undecodable payload: counted in totals, NOT in interface stats
    // (reference update_stats with major=nil skips the interface bump)
    s = run(s, env("data", lcdMonitor.name, "/time/to", Array[Byte](9, 9)))._1
    assert(s.totalReceivedMsgs == 2)
    assert(s.interfaceMsgs == Map("com.test.LCDMonitor:1" -> 1L))
  }

  test("emptyCache resends server-owned properties from bootstrapped state") {
    // server-owned values enter state via the initial-state bootstrap
    // (the store seeds them; devices cannot write them — F8)
    val s0 = DeviceSessionState.empty.copy(
      introspection = Map(serverOwned.name -> 1, lcdMonitor.name -> 1),
      properties = Map(
        s"${serverOwned.name}/x" -> Bson.encode(Seq("v" -> "srv-val")),
        s"${lcdMonitor.name}/time/to" -> Bson.encode(Seq("v" -> 20L))))
    val (s1, fx) = run(s0, env("control", path = "/emptyCache"))
    val publishes = fx.filter(e => e.kind == "command" && e.detail == "publish")
    assert(publishes.map(_.path) == Seq("/x"))
    assert(Bson.decode(publishes.head.valueBson).get("v") == "srv-val")
    // digest lists ONLY server-owned paths (the device-consumed set)
    val digest = fx.find(_.detail == "consumer_properties").get
    val listed = PayloadCodec.parseDeviceProperties(
      digest.valueBson, Set(serverOwned.name, lcdMonitor.name)).get
    assert(listed == Set(serverOwned.name -> "/x"))
    assert(!s1.pendingEmptyCache)
  }

  test("invalid path → clean session, no write") {
    val (_, fx) = run(DeviceSessionState.empty,
      env("data", lcdMonitor.name, "/time//to", Bson.encode(Seq("v" -> 8L))))
    assert(fx.head.kind == "error")
    assert(fx.head.detail == "invalid_path")
  }

  test("path index emitted for every datastream value, expiry only with retention") {
    val s0 = DeviceSessionState.empty
    // simpleStream has no retention → path_index row with null expiry
    val (_, fx) = run(s0, env("data", simpleStream.name, "/0/value",
      Bson.encode(Seq("v" -> 5))))
    val idx = fx.filter(_.kind == "path_index")
    assert(idx.size == 1)
    assert(idx.head.path == "/0/value" && idx.head.detail == null)
    // the value row itself carries no expiry either
    assert(fx.find(_.kind == "datastream_append").get.detail == null)
    // a retention-configured mapping gets expiry on both rows
    val retIface = InterfaceDescriptor("com.test.Retained", 1, 0,
      InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
    val reg2 = Registry(
      Map(retIface.name -> retIface),
      Map(retIface.name -> Seq(
        Mapping(retIface.name, 1, "/v", AInteger, expirySeconds = 100))), Nil)
    val e = env("data", retIface.name, "/v", Bson.encode(Seq("v" -> 1)))
    val (_, fx2) = DeviceProcessor.processMessage(s0, e, reg2)
    val receptionMs = e.receptionDecimicros / 10000
    val idx2 = fx2.find(_.kind == "path_index").get
    assert(idx2.detail == s"expiry_ms:${receptionMs + 250000}") // 2.5× retention
    val row2 = fx2.find(_.kind == "datastream_append").get
    assert(row2.detail == s"expiry_ms:${receptionMs + 100000}") // 1× retention
  }

  test("introspection major bump: kv unregister+register and del+ins events") {
    // major-0 interfaces drive the kv registry (queries.ex:599-664)
    val v0 = InterfaceDescriptor("com.test.Zero", 0, 1,
      InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
    val reg = Registry(Map(v0.name -> v0),
      Map(v0.name -> Seq(Mapping(v0.name, 0, "/v", AInteger))), Seq(
        Trigger("ta", TriggerEventType.InterfaceAdded, TriggerScope.AnyInterface,
          None, MatchOperator.Any, null, List("t")),
        Trigger("tr", TriggerEventType.InterfaceRemoved, TriggerScope.AnyInterface,
          None, MatchOperator.Any, null, List("t"))))
    val (s1, fx1) = DeviceProcessor.processMessage(DeviceSessionState.empty,
      env("introspection", payload = "com.test.Zero:0:1".getBytes), reg)
    // register inserts into BOTH kv groups
    val kv1 = fx1.filter(_.kind == "kv_store")
    assert(kv1.map(_.detail).sorted == Seq(
      "register:devices-by-interface-com.test.Zero-v0",
      "register:devices-with-data-on-interface-com.test.Zero-v0"))
    // major bump 0→1: removed(old major, kv unregister) + added fire
    val (_, fx2) = DeviceProcessor.processMessage(s1,
      env("introspection", payload = "com.test.Zero:1:0".getBytes), reg)
    assert(fx2.exists(e => e.eventType == "interface_removed" && e.major == 0))
    assert(fx2.exists(e => e.eventType == "interface_added" && e.major == 1))
    val kv2 = fx2.filter(_.kind == "kv_store")
    // unregister deletes only devices-by-interface (major 0 leaving)
    assert(kv2.map(_.detail) == Seq("unregister:devices-by-interface-com.test.Zero-v0"))
  }

  test("ST4 paths cache: repeated no-retention path skips the index upsert") {
    val b = (v: Int) => Bson.encode(Seq("v" -> v))
    val (s1, fx1) = run(DeviceSessionState.empty,
      env("data", simpleStream.name, "/0/value", b(1)))
    assert(fx1.count(_.kind == "path_index") == 1)
    // same path again: cache hit, no redundant upsert
    val (s2, fx2) = run(s1, env("data", simpleStream.name, "/0/value", b(2)))
    assert(fx2.count(_.kind == "path_index") == 0)
    // different path: upserted and cached
    val (s3, fx3) = run(s2, env("data", simpleStream.name, "/1/value", b(3)))
    assert(fx3.count(_.kind == "path_index") == 1)
    // FIFO bound at 32: flooding distinct paths evicts the oldest
    var s = s3
    for (i <- 2 to 40)
      s = run(s, env("data", simpleStream.name, s"/$i/value", b(i)))._1
    assert(s.seenPaths.length == DeviceSessionState.PathsCacheSize)
    val (_, fxAgain) = run(s, env("data", simpleStream.name, "/0/value", b(9)))
    assert(fxAgain.count(_.kind == "path_index") == 1) // evicted → re-upserted
  }

  test("ST4: retention paths always re-upsert to refresh their expiry") {
    val ret = InterfaceDescriptor("com.test.Ret", 1, 0,
      InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
    val reg = Registry(Map(ret.name -> ret),
      Map(ret.name -> Seq(Mapping(ret.name, 1, "/v", AInteger, expirySeconds = 60))), Nil)
    val e1 = env("data", ret.name, "/v", Bson.encode(Seq("v" -> 1)))
    val (s1, fx1) = DeviceProcessor.processMessage(DeviceSessionState.empty, e1, reg)
    val e2 = env("data", ret.name, "/v", Bson.encode(Seq("v" -> 2)))
    val (_, fx2) = DeviceProcessor.processMessage(s1, e2, reg)
    assert(fx1.count(_.kind == "path_index") == 1)
    assert(fx2.count(_.kind == "path_index") == 1)
    assert(s1.seenPaths.isEmpty) // retention paths are never cached
  }

  test("prune: unresolvable stored path surfaces an error, not a dead tombstone") {
    val ghost = "com.test.LCDMonitor/no/such/mapping"
    val s0 = DeviceSessionState.empty.copy(
      introspection = Map(lcdMonitor.name -> 1),
      properties = Map(ghost -> Bson.encode(Seq("v" -> 1L))))
    val wire = PayloadCodec.deflateProperties("")
    val (_, fx) = run(s0, env("control", path = "/producer/properties", payload = wire))
    assert(!fx.exists(_.kind == "property_unset"))
    assert(fx.exists(e => e.kind == "error" &&
      e.detail == "prune_mapping_not_found:com.test.LCDMonitor/no/such/mapping"))
  }

  test("congruent triggers merge targets") {
    val merged = Triggers.mergeCongruent(Seq(
      Trigger("a", TriggerEventType.IncomingData,
        TriggerScope.OnInterface("i", 1), Some("/p"),
        MatchOperator.GreaterThan, 9L, List("t1")),
      Trigger("b", TriggerEventType.IncomingData,
        TriggerScope.OnInterface("i", 1), Some("/p"),
        MatchOperator.GreaterThan, 9L, List("t2")),
      Trigger("c", TriggerEventType.IncomingData,
        TriggerScope.OnInterface("i", 1), Some("/p"),
        MatchOperator.LessThan, 9L, List("t3"))))
    assert(merged.size == 2)
    assert(merged.find(_.triggerId == "a").get.targets == List("t1", "t2"))
  }
}
