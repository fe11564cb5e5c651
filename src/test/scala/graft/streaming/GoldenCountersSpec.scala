package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._

/** Counters-on-disconnect golden test mirroring the reference's
  * "simple flow" accounting (seed device starts at 45000 msgs /
  * 4500000 bytes — FIXTURES.md §3; bytes = payload+interface+path per
  * message, errors included — SURVEY §2.4 A1).
  */
class GoldenCountersSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("seeded totals accumulate exactly through the batch driver") {
    import spark.implicits._
    val dev = "f0VMRgIBAQAAAAAAAAAAAA"
    val lcd = InterfaceDescriptor("com.test.LCDMonitor", 1, 3,
      InterfaceType.Properties, Ownership.Device, Aggregation.Individual)
    val registry = Registry(
      Map(lcd.name -> lcd),
      Map(lcd.name -> Seq(
        Mapping(lcd.name, 1, "/time/to", ALongInteger))), Nil)

    val seeded = DeviceSessionState.empty.copy(
      totalReceivedMsgs = 45000L, totalReceivedBytes = 4500000L)

    val p1 = Bson.encode(Seq("v" -> 20L))
    val badPayload = Array[Byte](1, 2, 3) // undecodable → error, still counted
    val msgs = Seq(
      Envelope("r", dev, "connection", null, null, Array.emptyByteArray, 10000L, "ip", 1),
      Envelope("r", dev, "data", lcd.name, "/time/to", p1, 20000L, "ip", 2),
      Envelope("r", dev, "data", lcd.name, "/time/to", badPayload, 30000L, "ip", 3),
      Envelope("r", dev, "disconnection", null, null, Array.emptyByteArray, 40000L, "ip", 4)
    ).toDS()

    val fx = DeviceStateMachine.processBatch(msgs, registry,
      Map(("r", dev) -> seeded)).collect()

    val expectedBytes = 4500000L +
      (p1.length + lcd.name.length + "/time/to".length) +
      (badPayload.length + lcd.name.length + "/time/to".length)
    val upd = fx.filter(e => e.kind == "device_update" &&
      e.detail.contains("total_received_msgs"))
    // disconnect flush + the end-of-slice stats patch (ST8 write
    // side); both carry the same final counters, exactly one carries
    // the connected:false transition
    assert(upd.length == 2)
    // 45002: connection and disconnection are lifecycle-only (the
    // reference bumps stats in neither handler, impl.ex:89-168)
    assert(upd.forall(_.detail.contains(s""""total_received_msgs":45002""")))
    assert(upd.forall(_.detail.contains(s""""total_received_bytes":$expectedBytes""")))
    assert(upd.count(_.detail.contains(""""connected":false""")) == 1)
    // the bad message errored but was counted, and produced the
    // clean-session escalation
    assert(fx.exists(e => e.kind == "error" && e.detail == "undecodable_bson_payload"))
  }
}
