package graft.triggers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.streaming._

/** S9 end-to-end: encoded RPC Calls ride a control STREAM next to a
  * RUNNING data pipeline (reference `application.ex:42`). A trigger
  * installed mid-stream must fire on the data stream's next
  * micro-batch; a congruence-aware delete must stop exactly the
  * deleted id's targets while the congruent survivor keeps firing —
  * all across micro-batch boundaries, through the real
  * flatMapGroupsWithState query and the real Call wire.
  */
class RpcControlStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

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

  private def dataTrigger(id: String, target: String) =
    Trigger(id, TriggerEventType.IncomingData,
      TriggerScope.OnInterface(individual.name, 1), Some("/3/value"),
      MatchOperator.GreaterThan, 9L, List(target))

  test("install mid-stream fires next micro-batch; congruent delete stops one target") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val plane = new RpcControlPlane(
      DeviceStateMachine.StaticRegistryProvider(registry))

    // the data pipeline: envelopes → keyed state machine → memory sink
    val data = MemoryStream[Envelope]
    val fx = DeviceStateMachine.processStream(data.toDS(), plane)
    val dataQ = fx.writeStream
      .format("memory").queryName("ctrl_fx").outputMode("append").start()

    // the control pipeline: encoded Calls → driver-side plane, replies
    // captured like the transport glue would publish them
    val replies = scala.collection.mutable.ArrayBuffer.empty[(String, Either[String, Unit])]
    val calls = MemoryStream[ControlCall]
    val ctrlQ = RpcControlStream.attach(calls.toDS(), plane,
      onReply = (id, bytes) =>
        replies.synchronized { replies += id -> RpcWire.decodeReply(bytes) })

    try {
      var off = 0L
      def msg(): Envelope = {
        off += 1
        Envelope(realm, deviceId, "data", individual.name, "/3/value",
          graft.core.Bson.encode(Seq("v" -> 42)), 15216455705950000L + off * 10000,
          "10.0.0.1", off)
      }
      def firedTargets(): Seq[Seq[String]] = spark.sql(
        "SELECT target FROM ctrl_fx WHERE eventType = 'incoming_data' ORDER BY receptionMs")
        .collect().map(_.getString(0).split(",").toSeq.sorted).toSeq

      // micro-batch 1: no trigger installed yet → no event
      data.addData(msg())
      dataQ.processAllAvailable()
      assert(firedTargets().isEmpty)

      // two congruent installs (same predicate, different ids/targets)
      // arrive on the control stream; both ack ok
      calls.addData(
        ControlCall("c1", RpcWire.encodeInstall(realm, deviceId, "p",
          dataTrigger("vt-a", "target-a")), 1),
        ControlCall("c2", RpcWire.encodeInstall(realm, deviceId, "p",
          dataTrigger("vt-b", "target-b")), 2))
      ctrlQ.processAllAvailable()
      assert(replies.synchronized(replies.toList) ==
        List("c1" -> Right(()), "c2" -> Right(())))

      // the data stream's NEXT micro-batch sees the merged overlay:
      // one congruent trigger firing both targets
      data.addData(msg())
      dataQ.processAllAvailable()
      assert(firedTargets() == Seq(Seq("target-a", "target-b")))

      // delete vt-a mid-stream: exactly its target stops
      calls.addData(
        ControlCall("c3", RpcWire.encodeDelete(realm, deviceId, "vt-a"), 3))
      ctrlQ.processAllAvailable()
      assert(replies.synchronized(replies.last) == ("c3" -> Right(())))

      // the survivor still fires on the following micro-batch
      data.addData(msg())
      dataQ.processAllAvailable()
      assert(firedTargets() ==
        Seq(Seq("target-a", "target-b"), Seq("target-b")))

      // an invalid install (unknown interface) error-replies and
      // changes nothing for the running stream
      calls.addData(ControlCall("c4",
        RpcWire.encodeInstall(realm, deviceId, "p",
          dataTrigger("vt-c", "target-c").copy(
            scope = TriggerScope.OnInterface("com.missing.Iface", 1))), 4))
      ctrlQ.processAllAvailable()
      assert(replies.synchronized(replies.last) ==
        ("c4" -> Left("interface_not_found")))
      data.addData(msg())
      dataQ.processAllAvailable()
      assert(firedTargets().last == Seq("target-b"))

      // the other two reference install rejections
      // (data_updater_test.exs:353-409) surface through the SAME
      // control-stream wire as synchronous-style error replies:
      // an unresolvable match path...
      calls.addData(ControlCall("c5",
        RpcWire.encodeInstall(realm, deviceId, "p",
          dataTrigger("vt-d", "target-d").copy(pathPattern = Some("/3/nope"))), 5))
      ctrlQ.processAllAvailable()
      assert(replies.synchronized(replies.last) ==
        ("c5" -> Left("invalid_match_path")))

      // ...and a data trigger on an object-aggregated interface
      calls.addData(ControlCall("c6",
        RpcWire.encodeInstall(realm, deviceId, "p",
          dataTrigger("vt-e", "target-e").copy(
            scope = TriggerScope.OnInterface(objectIface.name, 1),
            pathPattern = Some("/string"))), 6))
      ctrlQ.processAllAvailable()
      assert(replies.synchronized(replies.last) ==
        ("c6" -> Left("unsupported_interface_aggregation")))

      // neither rejected install leaks into the running stream
      data.addData(msg())
      dataQ.processAllAvailable()
      assert(firedTargets().last == Seq("target-b"))
    } finally {
      dataQ.stop(); ctrlQ.stop()
    }
  }
}
