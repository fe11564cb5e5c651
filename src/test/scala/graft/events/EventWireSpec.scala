package graft.events

import org.scalatest.funsuite.AnyFunSuite
import java.util.Arrays.{equals => beq}

/** Round-trip the full SimpleEvent wire family (reference
  * `triggers_handler.ex:377-459`): every variant encodes to protobuf
  * wire bytes and decodes back field-identically; headers carry the
  * five x_astarte_* entries in the reference's order.
  */
class EventWireSpec extends AnyFunSuite {

  private val sid = SimpleEventCodec.triggerId("amqp://t|x")
  private val pid = SimpleEventCodec.triggerId("amqp://t")
  private val bson = graft.core.Bson.encode(Seq("v" -> 42L))
  private val bson2 = graft.core.Bson.encode(Seq("v" -> "abc"))

  private def roundtrip(e: SimpleEvent): SimpleEvent = {
    val wire = SimpleEventCodec.encode(e, sid, pid)
    val (s2, p2, decoded) = SimpleEventCodec.decode(wire, e.target)
    assert(beq(s2, sid) && beq(p2, pid))
    decoded
  }

  test("device_connected / device_disconnected round-trip") {
    val c = DeviceConnected("r", "dev", "amqp://t", 123456789L, "10.1.2.3")
    assert(roundtrip(c) == c)
    val d = DeviceDisconnected("r", "dev", "amqp://t", 42L)
    assert(roundtrip(d) == d)
  }

  test("data-path events round-trip (incoming, change, applied, created, stored)") {
    val in = IncomingData("r", "dev", "t", 1L, "com.i", "/p", bson)
    val rin = roundtrip(in).asInstanceOf[IncomingData]
    assert(rin.interface == "com.i" && rin.path == "/p" && beq(rin.bsonValue, bson))

    val vc = ValueChange("r", "dev", "t", 2L, "com.i", "/p", bson, bson2)
    val rvc = roundtrip(vc).asInstanceOf[ValueChange]
    assert(beq(rvc.oldBsonValue, bson) && beq(rvc.newBsonValue, bson2))

    val va = ValueChangeApplied("r", "dev", "t", 3L, "com.i", "/p", bson, bson2)
    val rva = roundtrip(va).asInstanceOf[ValueChangeApplied]
    assert(beq(rva.oldBsonValue, bson) && beq(rva.newBsonValue, bson2))

    val pc = PathCreated("r", "dev", "t", 4L, "com.i", "/p", bson2)
    assert(beq(roundtrip(pc).asInstanceOf[PathCreated].bsonValue, bson2))

    val vs = ValueStored("r", "dev", "t", 5L, "com.i", "/p", bson)
    assert(beq(roundtrip(vs).asInstanceOf[ValueStored].bsonValue, bson))
  }

  test("path_removed / introspection / interface lifecycle round-trip") {
    val pr = PathRemoved("r", "dev", "t", 6L, "com.i", "/gone")
    assert(roundtrip(pr) == pr)
    val ii = IncomingIntrospection("r", "dev", "t", 7L, "com.i:1:0;com.j:2:1")
    assert(roundtrip(ii) == ii)
    val ia = InterfaceAdded("r", "dev", "t", 8L, "com.i", 1, 0)
    assert(roundtrip(ia) == ia) // minor 0 exercises proto3 zero-default
    val ir = InterfaceRemoved("r", "dev", "t", 9L, "com.i", 2)
    assert(roundtrip(ir) == ir)
    val im = InterfaceMinorUpdated("r", "dev", "t", 10L, "com.i", 1, 0, 3)
    assert(roundtrip(im) == im)
  }

  test("device_error round-trips its metadata map") {
    val de = DeviceError("r", "dev", "t", 11L, "invalid_path",
      Map("path" -> "//bad", "hint" -> "x"))
    assert(roundtrip(de) == de)
    val empty = DeviceError("r", "dev", "t", 12L, "oops", Map.empty)
    assert(roundtrip(empty) == empty)
  }

  test("headers match the reference's five x_astarte_* entries in order") {
    val e = DeviceConnected("realm1", "devA", "amqp://t", 1L, "ip")
    val hs = SimpleEventCodec.headers(e, sid, pid)
    assert(hs.map(_._1) == Seq(
      "x_astarte_realm", "x_astarte_device_id", "x_astarte_simple_trigger_id",
      "x_astarte_parent_trigger_id", "x_astarte_event_type"))
    assert(hs(0)._2 == "realm1" && hs(1)._2 == "devA")
    assert(hs(2)._2 == SimpleEventCodec.uuidString(sid))
    assert(hs(4)._2 == "device_connected_event")
    assert(hs(2)._2.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
  }

  test("varint boundary values survive (multi-byte lengths and timestamps)") {
    val big = IncomingData("r", "dev", "t", Long.MaxValue / 2, "i" * 300,
      "/" + ("p" * 200), Array.fill[Byte](1000)(7))
    val r = roundtrip(big).asInstanceOf[IncomingData]
    assert(r.timestampMs == Long.MaxValue / 2)
    assert(r.interface.length == 300 && r.bsonValue.length == 1000)
  }
}
