package graft

import org.apache.spark.sql.SparkSession

/** One-off diagnostic main (test scope, not shipped): splits the
  * ingest bench's wall time into (a) parquet scan, (b) envelope
  * construction incl. the codegen'd BSON encode, (c) the full state
  * machine — so optimization effort lands where the time actually is.
  *
  * Usage: Test/runMain graft.IngestBreakdown
  */
object IngestBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.core._, graft.core.AstarteValueType._
    import graft.streaming._
    import graft.triggers._
    import org.apache.spark.sql.functions._

    val ifaceName = "com.bench.EventStream"
    val registry = Registry(
      Map(ifaceName -> InterfaceDescriptor(ifaceName, 1, 0,
        InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)),
      Map(ifaceName -> Seq(Mapping(ifaceName, 1, "/%{type}/value", ADouble))),
      Seq(Trigger("t-gt", TriggerEventType.IncomingData,
        TriggerScope.OnInterface(ifaceName, 1), Some("/purchase/value"),
        MatchOperator.GreaterThan, 150.0, List("amqp://high-purchase"))))
    val events = graft.queries.Tables.events(spark, sfDir)
    val envelopes = events.select(
      lit("bench").as("realm"),
      concat(lit("device-"), col("user_id")).as("deviceId"),
      lit("data").as("msgType"),
      lit(ifaceName).as("iface"),
      concat(lit("/"), col("event_type"), lit("/value")).as("path"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.BsonEncodeV(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("value"))))
        .as("payload"),
      expr("ts div 1000 * 10").as("receptionDecimicros"),
      lit("10.0.0.1").as("ipAddress"),
      col("event_id").as("offset")).as[Envelope]
    val n = events.count()
    val fx = DeviceStateMachine.processBatch(envelopes, registry)
      .filter(_.kind == "datastream_append")

    def time(tag: String)(f: => Long): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-22s min=${ts.min}%.3f s  eps=${math.round(n / ts.min)}")
    }
    println(s"n=$n events, sf=$sfDir")
    time("scan only")(events.count())
    time("scan+envelope(BSON)")(envelopes.toDF.count())
    time("full state machine")(fx.count())
    spark.stop()
  }
}
