package graft.events

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.streaming._

/** S8 RPC wire: publish/disconnect calls round-trip the protobuf
  * encoding, and the engine's command side-output serializes to
  * decodable calls end-to-end.
  */
class CommandSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("publish / disconnect RPC calls round-trip") {
    val p = VmqRpc.Publish(Seq("r", "dev", "control", "consumer", "properties"),
      Array[Byte](1, 2, 3), 2)
    val rp = VmqRpc.decode(VmqRpc.encode(p)).asInstanceOf[VmqRpc.Publish]
    assert(rp.topicTokens == p.topicTokens && rp.qos == 2)
    assert(java.util.Arrays.equals(rp.payload, p.payload))

    val d = VmqRpc.Disconnect("r/devA", discardState = true)
    assert(VmqRpc.decode(VmqRpc.encode(d)) == d)
    val d0 = VmqRpc.Disconnect("r/devB", discardState = false)
    assert(VmqRpc.decode(VmqRpc.encode(d0)) == d0)

    // empty payload publish (qos 0) survives
    val p0 = VmqRpc.Publish(Seq("r", "dev"), Array.emptyByteArray, 0)
    val rp0 = VmqRpc.decode(VmqRpc.encode(p0)).asInstanceOf[VmqRpc.Publish]
    assert(rp0.topicTokens == Seq("r", "dev") && rp0.qos == 0 && rp0.payload.isEmpty)
  }

  test("engine command effects serialize end-to-end") {
    import spark.implicits._
    val serverOwned = InterfaceDescriptor("com.test.ServerOwned", 1, 0,
      InterfaceType.Properties, Ownership.Server, Aggregation.Individual)
    val lcd = InterfaceDescriptor("com.test.LCDMonitor", 1, 0,
      InterfaceType.Properties, Ownership.Device, Aggregation.Individual)
    val registry = Registry(
      Map(serverOwned.name -> serverOwned, lcd.name -> lcd),
      Map(serverOwned.name -> Seq(Mapping(serverOwned.name, 1, "/x", AString)),
        lcd.name -> Seq(Mapping(lcd.name, 1, "/p", ALongInteger))), Nil)
    val propBson = Bson.encode(Seq("v" -> "hello"))
    val seeded = DeviceSessionState.empty.copy(
      introspection = Map(serverOwned.name -> 1, lcd.name -> 1),
      properties = Map(s"${serverOwned.name}/x" -> propBson))

    val msgs = Seq(
      // invalid path -> clean-session escalation -> disconnect command
      Envelope("r", "dev", "data", lcd.name, "//bad", Array.emptyByteArray,
        10000L, "ip", 1),
      // emptyCache -> server-property resend + consumer-properties digest
      Envelope("r", "dev", "control", null, "/emptyCache", Array.emptyByteArray,
        20000L, "ip", 2)).toDS()
    val fx = DeviceStateMachine.processBatch(msgs, registry, Map(("r", "dev") -> seeded))

    val sink = new CommandSink(
      java.nio.file.Files.createTempDirectory("graft-cmd").toString + "/cmds")
    sink.publish(fx)
    val rows = sink.read(spark).collect()
      .map(r => r.getAs[String]("command") ->
        VmqRpc.decode(r.getAs[Array[Byte]]("wire"))).toMap

    // forced disconnect carries the client id and discards state
    assert(rows("disconnect") == VmqRpc.Disconnect("r/dev", discardState = true))
    // digest goes to the control topic at qos 2
    val digest = rows("consumer_properties").asInstanceOf[VmqRpc.Publish]
    assert(digest.topicTokens == Seq("r", "dev", "control", "consumer", "properties"))
    assert(digest.qos == 2 && digest.payload.nonEmpty)
    // property resend publishes the stored BSON on the property topic
    val resend = rows("publish").asInstanceOf[VmqRpc.Publish]
    assert(resend.topicTokens == Seq("r", "dev", "com.test.ServerOwned", "x"))
    assert(java.util.Arrays.equals(resend.payload, propBson))
  }
}
