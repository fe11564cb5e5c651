package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.triggers._

/** Structured Streaming drive of the state machine: state must
  * persist across micro-batches (value_change semantics depend on the
  * previous batch's property value living in the state store).
  */
class StreamingStateSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("state persists across micro-batches: value_change sees prior batch") {
    import spark.implicits._
    val lcd = InterfaceDescriptor("com.test.LCDMonitor", 1, 3,
      InterfaceType.Properties, Ownership.Device, Aggregation.Individual)
    val registry = Registry(
      Map(lcd.name -> lcd),
      Map(lcd.name -> Seq(Mapping(lcd.name, 1, "/time/to", ALongInteger))),
      Seq(Trigger("vc", TriggerEventType.ValueChange,
        TriggerScope.OnInterface(lcd.name, 1), Some("/time/to"),
        MatchOperator.Any, null, List("test_events"))))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Envelope]
    val effects = DeviceStateMachine.processStream(input.toDS(), registry)
    val q = effects.writeStream
      .format("memory").queryName("fx").outputMode("append").start()
    try {
      def msg(v: Long, off: Long) = Envelope("r", "dev", "data", lcd.name,
        "/time/to", Bson.encode(Seq("v" -> v)), 1000000L + off * 10000, "ip", off)

      // batch 1: first write → value_change (created)
      input.addData(msg(8L, 1))
      q.processAllAvailable()
      val b1 = spark.sql(
        "SELECT count(*) FROM fx WHERE eventType = 'value_change'").head().getLong(0)
      assert(b1 == 1)

      // batch 2: same value → state remembered across batches → NO new event
      input.addData(msg(8L, 2))
      q.processAllAvailable()
      val b2 = spark.sql(
        "SELECT count(*) FROM fx WHERE eventType = 'value_change'").head().getLong(0)
      assert(b2 == 1)

      // batch 3: new value → fires again with the stored previous value
      input.addData(msg(20L, 3))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT prevBson FROM fx WHERE eventType = 'value_change' ORDER BY receptionMs DESC")
        .collect()
      assert(rows.length == 2)
      assert(Bson.decode(rows.head.getAs[Array[Byte]]("prevBson")).get("v") == 8L)
    } finally q.stop()
  }

  test("registry updates reach a running query via MutableRegistryProvider") {
    import spark.implicits._
    val lcd = InterfaceDescriptor("m.iface", 1, 0,
      InterfaceType.Properties, Ownership.Device, Aggregation.Individual)
    val base = Registry(
      Map(lcd.name -> lcd),
      Map(lcd.name -> Seq(Mapping(lcd.name, 1, "/p", ALongInteger))), Nil)
    val provider = new DeviceStateMachine.MutableRegistryProvider(base)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Envelope]
    val effects = DeviceStateMachine.processStream(input.toDS(), provider)
    val q = effects.writeStream
      .format("memory").queryName("fx2").outputMode("append").start()
    try {
      def msg(off: Long) = Envelope("r", "dev", "data", lcd.name, "/p",
        Bson.encode(Seq("v" -> off)), 2000000L + off * 10000, "ip", off)

      input.addData(msg(1))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM fx2 WHERE eventType = 'incoming_data'")
        .head().getLong(0) == 0)

      // install a volatile trigger mid-stream (S9 overlay)
      provider.update(base.copy(triggers = Seq(
        Trigger("vol", TriggerEventType.IncomingData,
          TriggerScope.OnInterface(lcd.name, 1), Some("/p"),
          MatchOperator.Any, null, List("amqp://volatile"), volatile = true))))

      input.addData(msg(2))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM fx2 WHERE eventType = 'incoming_data'")
        .head().getLong(0) == 1)
    } finally q.stop()
  }

  test("ST8: mid-flow restart bootstrapped from the store matches uninterrupted run") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.storage.AstarteStore
    import graft.events.EventSink
    val ifd = InterfaceDescriptor("b.iface", 1, 0,
      InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
    val registry = Registry(Map(ifd.name -> ifd),
      Map(ifd.name -> Seq(Mapping(ifd.name, 1, "/v", AInteger))), Nil)
    val provider = DeviceStateMachine.StaticRegistryProvider(registry)

    def env(msgType: String, off: Long, iface: String = null, path: String = null,
        payload: Array[Byte] = Array.emptyByteArray) =
      Envelope("r", "dev", msgType, iface, path, payload,
        5000000L + off * 10000, "ip", off)
    def conn(off: Long) = env("connection", off)
    def intro(off: Long) = env("introspection", off, payload = "b.iface:1:0".getBytes)
    def data(off: Long) = env("data", off, ifd.name, "/v", Bson.encode(Seq("v" -> off.toInt)))
    def disc(off: Long) = env("disconnection", off)

    // reference: the uninterrupted run's disconnect flush
    val fxAll = DeviceStateMachine.processBatch(
      Seq(conn(1), intro(2), data(3), data(4), disc(5)).toDS(), registry).collect()
    val expected = fxAll
      .filter(e => e.kind == "device_update" && e.detail.contains(""""connected":false"""))
      .head.detail

    val root = java.nio.file.Files.createTempDirectory("graft-st8").toString
    val store = new AstarteStore(s"$root/store")
    val sink = new EventSink(s"$root/events")
    implicit val sqlCtx = spark.sqlContext

    // run 1: dies mid-flow (after conn+intro+first value)
    val in1 = MemoryStream[Envelope]
    val q1 = Pipeline.start(in1.toDS(), provider, store, sink, s"$root/ckpt1")
    try { in1.addData(conn(1), intro(2), data(3)); q1.processAllAvailable() }
    finally q1.stop()

    // run 2: FRESH checkpoint (state store lost) but bootstrapped from
    // the durable store — counters must resume where run 1 stopped
    val in2 = MemoryStream[Envelope]
    val q2 = Pipeline.startBootstrapped(spark, "r", in2.toDS(), provider,
      store, sink, s"$root/ckpt2")
    try { in2.addData(data(4), disc(5)); q2.processAllAvailable() }
    finally q2.stop()

    val finalFlush = store.deviceUpdates(spark)
      .filter(col("update_json").contains(""""connected":false"""))
      .collect().map(_.getAs[String]("update_json"))
    assert(finalFlush.length == 1)
    assert(finalFlush.head == expected)
  }

  test("out-of-order within a batch is re-sorted by reception order") {
    import spark.implicits._
    val lcd = InterfaceDescriptor("i.face", 1, 0,
      InterfaceType.Properties, Ownership.Device, Aggregation.Individual)
    val registry = Registry(
      Map(lcd.name -> lcd),
      Map(lcd.name -> Seq(Mapping(lcd.name, 1, "/p", ALongInteger))), Nil)
    // arrival order scrambled: offsets 3, 1, 2
    val msgs = Seq(3L, 1L, 2L).map { off =>
      Envelope("r", "dev", "data", lcd.name, "/p",
        Bson.encode(Seq("v" -> off)), 1000000L + off * 10000, "ip", off)
    }.toDS()
    val fx = DeviceStateMachine.processBatch(msgs, registry)
      .filter(_.kind == "property_upsert").collect()
    // last write must be the one with the highest reception ts (v=3)
    assert(Bson.decode(fx.last.valueBson).get("v") == 3L)
  }
}
