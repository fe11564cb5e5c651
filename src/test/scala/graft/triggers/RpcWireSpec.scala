package graft.triggers

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.streaming.{DeviceProcessor, DeviceSessionState, DeviceStateMachine, Envelope, Registry}

/** S9 wire surface: protobuf Call → install/delete volatile trigger,
  * synchronous Reply with the reference's error taxonomy
  * (`rpc/handler.ex:35-100`, `impl.ex:946-1058`; errors mirrored from
  * `data_updater_test.exs:353-409`), and the congruence-aware delete
  * exercised through actual trigger firing
  * (`data_updater_test.exs:526-541`, `impl.ex:1060-1189`).
  */
class RpcWireSpec extends AnyFunSuite {

  private val realm = "autotestrealm"
  private val deviceId = "f0VMRgIBAQAAAAAAAAAAAA"

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

  test("install round-trip: Call decode preserves the trigger, replies ok") {
    val t = dataTrigger("vt-1", "amqp://volatile")
    val payload = RpcWire.encodeInstall(realm, deviceId, "parent-1", t)
    val (installed, reply) = RpcWire.handleRpc(payload, Nil, registry)
    assert(RpcWire.decodeReply(reply) == Right(()))
    assert(installed == Seq(t.copy(volatile = true)))
  }

  test("known-value types survive the wire") {
    for (kv <- Seq(42L, 2.5d, "s", true, false)) {
      val t = dataTrigger("vt-kv", "x").copy(
        valueOp = MatchOperator.EqualTo, knownValue = kv)
      val (installed, _) =
        RpcWire.handleRpc(RpcWire.encodeInstall(realm, deviceId, "p", t), Nil, registry)
      assert(installed.head.knownValue == kv, s"known value $kv")
    }
    // Any + null known value (the no-predicate trigger)
    val t = dataTrigger("vt-any", "x").copy(
      valueOp = MatchOperator.Any, knownValue = null)
    val (installed, _) =
      RpcWire.handleRpc(RpcWire.encodeInstall(realm, deviceId, "p", t), Nil, registry)
    assert(installed.head.valueOp == MatchOperator.Any)
    assert(installed.head.knownValue == null)
  }

  test("device and introspection triggers round-trip their scopes") {
    val conn = Trigger("vt-c", TriggerEventType.DeviceConnected,
      TriggerScope.OnDevice(deviceId), None, MatchOperator.Any, null, List("t"))
    val (i1, r1) = RpcWire.handleRpc(
      RpcWire.encodeInstall(realm, deviceId, "p", conn), Nil, registry)
    assert(RpcWire.decodeReply(r1) == Right(()))
    assert(i1.head.scope == TriggerScope.OnDevice(deviceId))
    assert(i1.head.eventType == TriggerEventType.DeviceConnected)

    val added = Trigger("vt-i", TriggerEventType.InterfaceAdded,
      TriggerScope.AnyInterface, None, MatchOperator.Any, null, List("t"))
    val (i2, _) = RpcWire.handleRpc(
      RpcWire.encodeInstall(realm, deviceId, "p", added), Nil, registry)
    assert(i2.head.scope == TriggerScope.AnyInterface)
    assert(i2.head.eventType == TriggerEventType.InterfaceAdded)
  }

  test("install errors: the reference's three synchronous rejections") {
    def installErr(t: Trigger): String =
      RpcWire.decodeReply(
        RpcWire.handleRpc(RpcWire.encodeInstall(realm, deviceId, "p", t),
          Nil, registry)._2)
        .swap.getOrElse(fail("expected error reply"))

    assert(installErr(dataTrigger("e1", "x", Some("/3/nope")))
      == "invalid_match_path")
    assert(installErr(dataTrigger("e2", "x", Some("/string"), objectIface.name))
      == "unsupported_interface_aggregation")
    assert(installErr(dataTrigger("e3", "x", None, "no.such.Iface"))
      == "interface_not_found")
    // rejected installs roll back: nothing added
    val (after, _) = RpcWire.handleRpc(
      RpcWire.encodeInstall(realm, deviceId, "p",
        dataTrigger("e4", "x", Some("/3/nope"))), Nil, registry)
    assert(after.isEmpty)
  }

  test("undecodable payload is an error reply, not an exception") {
    val (installed, reply) =
      RpcWire.handleRpc(Array[Byte](0x0a, 0x7f, 0x01), Nil, registry)
    assert(installed.isEmpty)
    assert(RpcWire.decodeReply(reply).isLeft)
    // empty Call (no oneof) — the reference's :empty_call
    val (_, r2) = RpcWire.handleRpc(Array.emptyByteArray, Nil, registry)
    assert(RpcWire.decodeReply(r2) == Left("empty_call"))
  }

  test("delete removes exactly the id'd trigger and always acks") {
    val t = dataTrigger("vt-del", "x")
    val (installed, _) = RpcWire.handleRpc(
      RpcWire.encodeInstall(realm, deviceId, "p", t), Nil, registry)
    val (afterDel, r) = RpcWire.handleRpc(
      RpcWire.encodeDelete(realm, deviceId, "vt-del"), installed, registry)
    assert(RpcWire.decodeReply(r) == Right(()))
    assert(afterDel.isEmpty)
    // deleting an unknown id is idempotent ok, like the reference
    val (still, r2) = RpcWire.handleRpc(
      RpcWire.encodeDelete(realm, deviceId, "no-such"), installed, registry)
    assert(RpcWire.decodeReply(r2) == Right(()))
    assert(still == installed)
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
      val (_, fx) = DeviceProcessor.processMessage(s0, e, plane.current())
      fx.filter(_.eventType == "incoming_data").flatMap(_.target.split(","))
    }
    // merged view fires both targets on one congruent trigger
    assert(fire().sorted == Seq("target-a", "target-b"))

    assert(RpcWire.decodeReply(
      plane.handleRpc(RpcWire.encodeDelete(realm, deviceId, "vt-a"))) == Right(()))
    // vt-a's target is gone; vt-b's survives and still fires
    assert(fire() == Seq("target-b"))
    assert(plane.installedTriggers.map(_.triggerId) == Seq("vt-b"))
  }
}
