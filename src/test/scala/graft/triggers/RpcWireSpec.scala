package graft.triggers

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.streaming.{DeviceProcessor, DeviceSessionState, DeviceStateMachine, Envelope, Registry}

/** S9 wire surface: protobuf Call → install/delete volatile trigger,
  * synchronous Reply with the reference's error taxonomy
  * (`rpc/handler.ex:35-100`, `impl.ex:946-1058`; errors mirrored from
  * `data_updater_test.exs:353-409`), per-(realm, device) install
  * scoping like the reference's session state, and the
  * congruence-aware delete exercised through actual trigger firing
  * (`data_updater_test.exs:526-541`, `impl.ex:1060-1189`).
  */
class RpcWireSpec extends AnyFunSuite {

  private val realm = "autotestrealm"
  private val deviceId = "f0VMRgIBAQAAAAAAAAAAAA"
  private val key = (realm, deviceId)

  private val individual = InterfaceDescriptor("com.test.SimpleStreamTest", 1, 0,
    InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
  private val objectIface = InterfaceDescriptor("com.example.TestObject", 1, 5,
    InterfaceType.Datastream, Ownership.Device, Aggregation.Object)
  private val registry = Registry(
    Map(individual.name -> individual, objectIface.name -> objectIface),
    Map(
      individual.name -> Seq(
        Mapping(individual.name, 1, "/%{itemIndex}/value", AInteger)),
      objectIface.name -> Seq(
        Mapping(objectIface.name, 1, "/string", AString))),
    Nil)

  private def dataTrigger(id: String, target: String,
      path: Option[String] = Some("/3/value"),
      iface: String = individual.name) =
    Trigger(id, TriggerEventType.IncomingData,
      TriggerScope.OnInterface(iface, 1), path,
      MatchOperator.GreaterThan, 9L, List(target))

  private def install(t: Trigger,
      installed: RpcWire.Installed = Map.empty): (RpcWire.Installed, Array[Byte]) =
    RpcWire.handleRpc(
      RpcWire.encodeInstall(realm, deviceId, "parent-1", t), installed, registry)

  test("install round-trip: Call decode preserves the trigger, replies ok") {
    val t = dataTrigger("vt-1", "amqp://volatile")
    val (installed, reply) = install(t)
    assert(RpcWire.decodeReply(reply) == Right(()))
    assert(installed == Map(key -> Seq(t.copy(volatile = true))))
  }

  test("known-value types survive the wire, including proto3 zero defaults") {
    // 0, "", and false are exactly the values proto3 zero-default
    // skipping would silently turn into null ("no known value")
    for (kv <- Seq[Any](42L, 0L, -7L, 2.5d, 0.0d, "s", "", true, false)) {
      val t = dataTrigger("vt-kv", "x").copy(
        valueOp = MatchOperator.EqualTo, knownValue = kv)
      val (installed, _) = install(t)
      assert(installed(key).head.knownValue == kv, s"known value $kv")
    }
    val t = dataTrigger("vt-any", "x").copy(
      valueOp = MatchOperator.Any, knownValue = null)
    val (installed, _) = install(t)
    assert(installed(key).head.valueOp == MatchOperator.Any)
    assert(installed(key).head.knownValue == null)
  }

  test("device and introspection triggers round-trip their scopes") {
    val conn = Trigger("vt-c", TriggerEventType.DeviceConnected,
      TriggerScope.OnDevice(deviceId), None, MatchOperator.Any, null, List("t"))
    val (i1, r1) = install(conn)
    assert(RpcWire.decodeReply(r1) == Right(()))
    assert(i1(key).head.scope == TriggerScope.OnDevice(deviceId))
    assert(i1(key).head.eventType == TriggerEventType.DeviceConnected)

    val added = Trigger("vt-i", TriggerEventType.InterfaceAdded,
      TriggerScope.AnyInterface, None, MatchOperator.Any, null, List("t"))
    val (i2, _) = install(added)
    assert(i2(key).head.scope == TriggerScope.AnyInterface)
    assert(i2(key).head.eventType == TriggerEventType.InterfaceAdded)
  }

  test("install errors: the reference's three synchronous rejections") {
    def installErr(t: Trigger): String =
      RpcWire.decodeReply(install(t)._2)
        .swap.getOrElse(fail("expected error reply"))

    assert(installErr(dataTrigger("e1", "x", Some("/3/nope")))
      == "invalid_match_path")
    assert(installErr(dataTrigger("e2", "x", Some("/string"), objectIface.name))
      == "unsupported_interface_aggregation")
    assert(installErr(dataTrigger("e3", "x", None, "no.such.Iface"))
      == "interface_not_found")
    // rejected installs roll back: nothing added
    val (after, _) = install(dataTrigger("e4", "x", Some("/3/nope")))
    assert(after.getOrElse(key, Nil).isEmpty)
  }

  test("malformed payloads are error replies, never exceptions") {
    val malformed = Seq(
      Array[Byte](0x0a, 0x7f, 0x01),        // field-1 length overruns buffer
      Array[Byte](0x08, 0x80.toByte),       // varint truncated mid-continuation
      { // well-formed Call whose inner SimpleTrigger blob is garbage
        val w = new graft.events.ProtoWire.Writer
        w.message(1, Array[Byte](0x2a, 0x02, 0x18, 0x63)) // trigger field 5 bad
        w.result()
      })
    for (p <- malformed) {
      val (installed, reply) = RpcWire.handleRpc(p, Map.empty, registry)
      assert(installed.isEmpty, s"payload ${p.toSeq} mutated state")
      assert(RpcWire.decodeReply(reply) == Left("undecodable_call"),
        s"payload ${p.toSeq}")
    }
    // empty Call (no oneof) — the reference's :empty_call
    val (_, r2) = RpcWire.handleRpc(Array.emptyByteArray, Map.empty, registry)
    assert(RpcWire.decodeReply(r2) == Left("empty_call"))
  }

  test("delete removes exactly the id'd trigger and always acks") {
    val (installed, _) = install(dataTrigger("vt-del", "x"))
    val (afterDel, r) = RpcWire.handleRpc(
      RpcWire.encodeDelete(realm, deviceId, "vt-del"), installed, registry)
    assert(RpcWire.decodeReply(r) == Right(()))
    assert(afterDel(key).isEmpty)
    // deleting an unknown id is idempotent ok, like the reference
    val (still, r2) = RpcWire.handleRpc(
      RpcWire.encodeDelete(realm, deviceId, "no-such"), installed, registry)
    assert(RpcWire.decodeReply(r2) == Right(()))
    assert(still == installed)
  }

  test("installs are scoped per device: device B never sees A's trigger") {
    val plane = new RpcControlPlane(
      DeviceStateMachine.StaticRegistryProvider(registry))
    assert(RpcWire.decodeReply(plane.handleRpc(
      RpcWire.encodeInstall(realm, deviceId, "p",
        dataTrigger("vt-a", "target-a")))) == Right(()))

    def fire(dev: String): Seq[String] = {
      val s0 = DeviceSessionState.empty.copy(
        introspection = Map(individual.name -> 1))
      val e = Envelope(realm, dev, "data", individual.name, "/3/value",
        Bson.encode(Seq("v" -> 42)), 15216455705950000L, "10.0.0.1", 1L)
      val (_, fx) = DeviceProcessor.processMessage(s0, e,
        plane.current(realm, dev))
      fx.filter(_.eventType == "incoming_data").flatMap(_.target.split(","))
    }
    assert(fire(deviceId) == Seq("target-a"))
    assert(fire("otherDeviceAAAAAAAAAAA").isEmpty) // reference: session-scoped
    // the global view carries no volatile overlay at all
    assert(plane.current().triggers.isEmpty)
  }

  test("congruence-aware delete: the surviving congruent trigger still fires") {
    // two congruent installs (same predicate, different ids/targets)
    // through the control plane; delete one; the other must still
    // fire on a matching data event — data_updater_test.exs:526-541.
    val plane = new RpcControlPlane(
      DeviceStateMachine.StaticRegistryProvider(registry))
    for ((id, tgt) <- Seq("vt-a" -> "target-a", "vt-b" -> "target-b")) {
      val r = plane.handleRpc(
        RpcWire.encodeInstall(realm, deviceId, "p", dataTrigger(id, tgt)))
      assert(RpcWire.decodeReply(r) == Right(()))
    }

    val s0 = DeviceSessionState.empty.copy(
      introspection = Map(individual.name -> 1))
    def fire(): Seq[String] = {
      val e = Envelope(realm, deviceId, "data", individual.name, "/3/value",
        Bson.encode(Seq("v" -> 42)), 15216455705950000L, "10.0.0.1", 1L)
      val (_, fx) = DeviceProcessor.processMessage(s0, e,
        plane.current(realm, deviceId))
      fx.filter(_.eventType == "incoming_data").flatMap(_.target.split(","))
    }
    // merged view fires both targets on one congruent trigger
    assert(fire().sorted == Seq("target-a", "target-b"))

    assert(RpcWire.decodeReply(
      plane.handleRpc(RpcWire.encodeDelete(realm, deviceId, "vt-a"))) == Right(()))
    // vt-a's target is gone; vt-b's survives and still fires
    assert(fire() == Seq("target-b"))
    assert(plane.installedTriggers(realm, deviceId).map(_.triggerId) == Seq("vt-b"))
  }
}
