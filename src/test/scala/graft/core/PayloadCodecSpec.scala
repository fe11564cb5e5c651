package graft.core

import java.time.Instant
import java.util.Base64
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap

/** Decoder contract tests. The base64 BSON vectors reproduce the
  * reference's public decoder test inputs
  * (test/astarte_data_updater_plant/data_updater/payloads_decoder_test.exs,
  * catalogued in /root/repo/FIXTURES.md §6).
  */
class PayloadCodecSpec extends AnyFunSuite {

  private def b64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  test("empty payload decodes to unset") {
    assert(PayloadCodec.decodePayload(Array.emptyByteArray)
      .contains(DecodedPayload(null, None, None)))
  }

  test("deprecated unset (empty binary v) decodes to unset") {
    val p = PayloadCodec.decodePayload(b64("DQAAAAV2AAAAAAAAAA==")).get
    assert(p.value == null && p.timestamp.isEmpty && p.metadata.isEmpty)
  }

  test("string value") {
    val p = PayloadCodec.decodePayload(b64("FAAAAAJ2AAgAAAAjRTVEOTAwAAA=")).get
    assert(p.value == "#E5D900")
    assert(p.timestamp.isEmpty)
  }

  test("boolean value") {
    val p = PayloadCodec.decodePayload(b64("CQAAAAh2AAAA")).get
    assert(p.value == false)
  }

  test("double value") {
    val p = PayloadCodec.decodePayload(b64("EAAAAAF2AKqjtujUUds/AA==")).get
    assert(p.value == 0.4268696091262948)
  }

  test("double with explicit timestamp t") {
    val p = PayloadCodec.decodePayload(
      b64("GwAAAAF2AGZRYzaGqOE/CXQA4/JaPmIBAAAA")).get
    assert(p.value.asInstanceOf[Double] > 0.55 && p.value.asInstanceOf[Double] < 0.56)
    assert(p.timestamp.contains(Instant.ofEpochMilli(1521464570595L)))
  }

  test("double with metadata m") {
    val p = PayloadCodec.decodePayload(
      b64("MAAAAANtAB0AAAACbWV0YTEAAgAAAGEAEG1ldGEyAAIAAAAAAXYAZlFjNoao4T8A")).get
    assert(p.metadata.contains(Map("meta1" -> "a", "meta2" -> 2)))
    assert(p.value.isInstanceOf[Double])
  }

  test("object value with v wrapper") {
    val p = PayloadCodec.decodePayload(b64(
      "UwAAAAN2AEsAAAAFYmluAAQAAAAAAAECAwh0ZXN0MQABAnRlc3QyAAoAAADEp2XFgsWCw7gAAXRlc3QzAAAAAAAAABRACXRtAGhnL0hiAQAAAAA=")).get
    val m = p.value.asInstanceOf[ListMap[String, Any]]
    assert(m("test1") == true)
    assert(m("test2") == "ħełłø")
    assert(m("test3") == 5.0)
    assert(m("tm") == Instant.ofEpochMilli(1521629489000L))
    assert(m("bin") == BsonBinary(0, Array[Byte](0, 1, 2, 3)))
  }

  test("legacy object payload (no v wrapper)") {
    val p = PayloadCodec.decodePayload(b64(
      "SwAAAAViaW4ABAAAAAAAAQIDCHRlc3QxAAECdGVzdDIACgAAAMSnZcWCxYLDuAABdGVzdDMAAAAAAAAAFEAJdG0AaGcvSGIBAAAA")).get
    val m = p.value.asInstanceOf[ListMap[String, Any]]
    assert(m("test1") == true)
    assert(m("test2") == "ħełłø")
    assert(m("test3") == 5.0)
    assert(m("bin") == BsonBinary(0, Array[Byte](0, 1, 2, 3)))
  }

  test("malformed bson returns None") {
    assert(PayloadCodec.decodePayload(Array[Byte](1, 2, 3)).isEmpty)
    assert(PayloadCodec.decodePayload(
      Array[Byte](100, 0, 0, 0, 1, 2)).isEmpty)
  }

  test("bson round trip") {
    val doc = Seq[(String, Any)](
      "v" -> 42.5, "s" -> "héllo", "b" -> true, "i" -> 7, "l" -> 9L,
      "t" -> Instant.ofEpochMilli(1521464570595L),
      "arr" -> List(1, 2, 3),
      "bin" -> BsonBinary(0, Array[Byte](0, 1, 2)),
      "nested" -> ListMap("x" -> 1))
    val decoded = Bson.decode(Bson.encode(doc)).get
    assert(decoded("v") == 42.5)
    assert(decoded("s") == "héllo")
    assert(decoded("b") == true)
    assert(decoded("i") == 7)
    assert(decoded("l") == 9L)
    assert(decoded("t") == Instant.ofEpochMilli(1521464570595L))
    assert(decoded("arr") == List(1, 2, 3))
    assert(decoded("bin") == BsonBinary(0, Array[Byte](0, 1, 2)))
    assert(decoded("nested").asInstanceOf[ListMap[String, Any]]("x") == 1)
  }

  test("introspection parse: valid and invalid") {
    assert(PayloadCodec.parseIntrospection(
      "com.test.LCDMonitor:1:0;com.test.SimpleStreamTest:1:0").contains(List(
        IntrospectionEntry("com.test.LCDMonitor", 1, 0),
        IntrospectionEntry("com.test.SimpleStreamTest", 1, 0))))
    assert(PayloadCodec.parseIntrospection("").contains(Nil))
    assert(PayloadCodec.parseIntrospection("bad").isEmpty)
    assert(PayloadCodec.parseIntrospection("a.b:1").isEmpty)
    assert(PayloadCodec.parseIntrospection("a.b:1:x").isEmpty)
    assert(PayloadCodec.parseIntrospection("a.b:1:0;;").isEmpty)
  }

  test("safe inflate round trip and zip bomb cap") {
    val text = "com.test.LCDMonitor/time/to;com.test.LCDMonitor/weekSchedule/10/start"
    val wire = PayloadCodec.deflateProperties(text)
    // header = 4-byte BE size
    val size = ((wire(0) & 0xff) << 24) | ((wire(1) & 0xff) << 16) |
      ((wire(2) & 0xff) << 8) | (wire(3) & 0xff)
    assert(size == text.getBytes.length)
    val inflated = PayloadCodec.safeInflate(wire.drop(4)).get
    assert(new String(inflated, "UTF-8") == text)
    // a 100-byte cap must reject this payload
    assert(PayloadCodec.safeInflate(wire.drop(4), cap = 10).isEmpty)
  }

  test("device properties parse filters to introspection") {
    val text = "com.test.LCDMonitor/time/to;com.other.Iface/x;com.test.LCDMonitor/weekSchedule/10/start"
    val wire = PayloadCodec.deflateProperties(text)
    val got = PayloadCodec.parseDeviceProperties(
      wire, Set("com.test.LCDMonitor")).get
    assert(got == Set(
      "com.test.LCDMonitor" -> "/time/to",
      "com.test.LCDMonitor" -> "/weekSchedule/10/start"))
  }

  test("device id codec round trips the fixture id") {
    val encoded = "f0VMRgIBAQAAAAAAAAAAAA"
    val raw = PayloadCodec.decodeDeviceId(encoded).get
    assert(raw.length == 16)
    assert(PayloadCodec.encodeDeviceId(raw) == encoded)
    assert(PayloadCodec.decodeDeviceId("tooShort").isEmpty)
  }

  test("reception timestamp split (decimicroseconds)") {
    val (ms, sub) = PayloadCodec.splitReceptionTimestamp(15216455705951234L)
    assert(ms == 1521645570595L)
    assert(sub == 1234)
  }
}
