package graft.streaming

import org.apache.spark.sql.SparkSession
import graft.core._
import graft.core.AstarteValueType._
import graft.triggers._

/** Runnable end-to-end drive of the device state machine: synthesizes
  * an Astarte message stream from the `events` testdata table (one
  * device per user_id, one datastream interface per event_type, BSON
  * payloads from `value`), runs [[DeviceStateMachine.processBatch]],
  * and prints the effect summary.
  *
  * Usage: runMain graft.streaming.IngestDemo [sfDir]
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val iface = "com.bench.EventStream"
    val registry = Registry(
      interfaces = Map(iface -> InterfaceDescriptor(iface, 1, 0,
        InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)),
      mappings = Map(iface -> Seq(
        Mapping(iface, 1, "/%{type}/value", ADouble))),
      triggers = Seq(
        Trigger("t-gt", TriggerEventType.IncomingData,
          TriggerScope.OnInterface(iface, 1), Some("/purchase/value"),
          MatchOperator.GreaterThan, 150.0, List("amqp://high-purchase")),
        Trigger("t-any", TriggerEventType.IncomingData,
          TriggerScope.AnyInterface, None, MatchOperator.Any, null,
          List("amqp://firehose"))))

    val events = graft.queries.Tables.events(spark, sfDir)
    val envelopes = events.map { r =>
      val userId = r.getAs[Long]("user_id")
      val eventType = r.getAs[String]("event_type")
      val value = r.getAs[Double]("value")
      val tsNanos = r.getAs[Long]("ts")
      Envelope(
        realm = "bench",
        deviceId = s"device-$userId",
        msgType = "data",
        iface = iface,
        path = s"/$eventType/value",
        payload = Bson.encode(Seq("v" -> value)),
        receptionDecimicros = tsNanos / 1000 * 10,
        ipAddress = "10.0.0.1",
        offset = r.getAs[Long]("event_id"))
    }

    val effects = DeviceStateMachine.processBatch(envelopes, registry)
    effects.cache()
    val byKind = effects.groupByKey(_.kind).count().collect().sortBy(_._1)
    val nHigh = effects
      .filter(e => e.kind == "event" && e.target == "amqp://high-purchase")
      .count()
    val nAppend = effects.filter(_.kind == "datastream_append").count()

    // Persist through the storage layer and read back (W3 + R-path).
    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val store = new graft.storage.AstarteStore(root)
    store.applyEffects(effects)
    val stored = store.datastreams(spark)
    val nStored = stored.count()
    val sumStored = stored.agg(
      org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum("double_value"), 2)).head().get(0)

    // Object-aggregated mini-flow: one message per user carrying a
    // flat object; read back through the registry-projected table.
    val objIface = InterfaceDescriptor("com.bench.ObjectStream", 1, 0,
      InterfaceType.Datastream, Ownership.Device, Aggregation.Object)
    val objMappings = Seq(
      Mapping(objIface.name, 1, "/etype", AString),
      Mapping(objIface.name, 1, "/total", ADouble))
    val objRegistry = Registry(Map(objIface.name -> objIface),
      Map(objIface.name -> objMappings), Nil)
    val objMsgs = events.groupBy("user_id", "event_type")
      .agg(org.apache.spark.sql.functions.sum("value").as("total"))
      .map { r =>
        val uid = r.getAs[Long]("user_id")
        val et = r.getAs[String]("event_type")
        Envelope("bench", s"device-$uid", "data", objIface.name, "/",
          Bson.encode(Seq("v" -> scala.collection.immutable.ListMap(
            "etype" -> et, "total" -> r.getAs[Double]("total")))),
          1000000000L + uid * 10000, "10.0.0.1", uid)
      }
    store.applyEffects(DeviceStateMachine.processBatch(objMsgs, objRegistry),
      objRegistry)
    val objRows = store.objectTable(spark, objIface, objMappings).count()

    // Publish the event side-output through the sink (S7) and read back.
    val sink = new graft.events.EventSink(s"$root/events_topic")
    sink.publish(effects)
    val published = sink.read(spark)
      .groupBy("routing_key").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")

    // The streaming front door (S1): a real TCP broker, published to
    // over the socket, consumed by the `graft-broker` DSv2 source into
    // the SAME pipeline (state machine → store → events), exactly as
    // a deployment would run it.
    val broker = new graft.sources.MessageBroker()
    val pub = new graft.sources.BrokerClient("127.0.0.1", broker.port)
    val streamRoot = java.nio.file.Files.createTempDirectory("graft-ingest-stream").toString
    val streamStore = new graft.storage.AstarteStore(s"$streamRoot/store")
    val streamSink = new graft.events.EventSink(s"$streamRoot/events")
    val q = Pipeline.start(
      WireSource.brokerSource(spark, "127.0.0.1", broker.port),
      DeviceStateMachine.StaticRegistryProvider(registry),
      streamStore, streamSink, s"$streamRoot/ckpt")
    try {
      pub.addShard() // two queue shards, like a sharded AMQP setup
      (1 to 100).foreach { i =>
        pub.publish(i % 2, s"device-$i".getBytes,
          Bson.encode(Seq("v" -> (i * 2.5))),
          Seq(
            "x_astarte_msg_type" -> "data".getBytes,
            "x_astarte_realm" -> "bench".getBytes,
            "x_astarte_device_id" -> s"device-${i % 10}".getBytes,
            "x_astarte_interface" -> iface.getBytes,
            "x_astarte_path" -> "/purchase/value".getBytes))
      }
      q.processAllAvailable()
    } finally { q.stop(); pub.close(); broker.close() }
    val streamed = streamStore.datastreams(spark).count()

    println("INGEST_DEMO " + byKind.map { case (k, n) => s"$k=$n" }.mkString(" ") +
      s" high_purchase_events=$nHigh appends=$nAppend" +
      s" stored_rows=$nStored stored_value_sum=$sumStored" +
      s" object_rows=$objRows published[$published]" +
      s" broker_streamed_rows=$streamed")
    spark.stop()
  }
}
