package graft.triggers

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.streaming.Registry
import VolatileTriggers._

/** Install/delete semantics mirroring the reference's RPC assertions
  * (data_updater_test.exs:353-409: invalid_match_path,
  * unsupported_interface_aggregation, interface_not_found).
  */
class VolatileTriggersSpec extends AnyFunSuite {

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

  private def dataTrigger(scope: TriggerScope, path: Option[String]) =
    Trigger("v1", TriggerEventType.IncomingData, scope, path,
      MatchOperator.LessThan, 100, List("amqp://volatile"))

  test("valid install on individual interface with resolvable path") {
    val r = validate(dataTrigger(
      TriggerScope.OnInterface(individual.name, 1), Some("/3/value")), registry)
    assert(r.exists(_.volatile))
  }

  test("wildcard pattern resolves against parametric template") {
    assert(validate(dataTrigger(
      TriggerScope.OnInterface(individual.name, 1), Some("//value")), registry).isRight)
    assert(validate(dataTrigger(
      TriggerScope.OnInterface(individual.name, 1), Some("/%{x}/value")), registry).isRight)
  }

  test("invalid_match_path: pattern unresolvable") {
    assert(validate(dataTrigger(
      TriggerScope.OnInterface(individual.name, 1), Some("/3/nope")), registry)
      == Left(InvalidMatchPath))
    assert(validate(dataTrigger(
      TriggerScope.OnInterface(individual.name, 1), Some("/3/value/deep")), registry)
      == Left(InvalidMatchPath))
  }

  test("unsupported_interface_aggregation: data trigger on object interface") {
    assert(validate(dataTrigger(
      TriggerScope.OnInterface(objectIface.name, 1), Some("/string")), registry)
      == Left(UnsupportedInterfaceAggregation))
  }

  test("interface_not_found: unknown name or wrong major") {
    assert(validate(dataTrigger(
      TriggerScope.OnInterface("no.such.Iface", 1), None), registry)
      == Left(InterfaceNotFound))
    assert(validate(dataTrigger(
      TriggerScope.OnInterface(individual.name, 9), None), registry)
      == Left(InterfaceNotFound))
  }

  test("non-data trigger on object interface is allowed") {
    val t = Trigger("v2", TriggerEventType.InterfaceAdded,
      TriggerScope.OnInterface(objectIface.name, 1), None,
      MatchOperator.Any, null, List("amqp://x"))
    assert(validate(t, registry).isRight)
  }

  test("congruence-aware delete: removing one id drops only its targets") {
    // two congruent installs with distinct ids/targets, kept unmerged
    val t1 = Trigger("t1", TriggerEventType.IncomingData,
      TriggerScope.AnyInterface, None, MatchOperator.Any, null, List("z"))
    val t4 = t1.copy(triggerId = "t4", targets = List("a"))
    val after = deleteTarget(Seq(t1, t4), "t1")
    assert(after.map(_.triggerId) == Seq("t4"))
    // merged view now carries only t4's target — t1's "z" is gone,
    // t4's "a" survives
    assert(overlay(Nil, after).head.targets == List("a"))
    assert(deleteTarget(after, "t4").isEmpty)
  }

  test("data trigger on device scope is rejected at install") {
    assert(validate(dataTrigger(TriggerScope.OnDevice("dev-1"), None), registry)
      == Left(InvalidMatchPath))
    assert(validate(dataTrigger(TriggerScope.AnyDevice, None), registry)
      == Left(InvalidMatchPath))
  }

  test("overlay merges congruent persistent + volatile triggers") {
    val p = Trigger("p1", TriggerEventType.IncomingData,
      TriggerScope.AnyInterface, None, MatchOperator.Any, null, List("persist"))
    val v = p.copy(triggerId = "v1", targets = List("volatile"), volatile = true)
    val merged = overlay(Seq(p), Seq(v))
    assert(merged.size == 1)
    assert(merged.head.targets == List("persist", "volatile"))
  }
}
