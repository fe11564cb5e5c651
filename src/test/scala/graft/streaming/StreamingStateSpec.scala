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
