package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.triggers._

/** The state machine on the RocksDB state store — the backend a real
  * cluster runs (HDFSBackedStateStore keeps every version on the JVM
  * heap; RocksDB spills keyed state to local disk, which is what
  * keeps million-device state off the executor heap at 100 TB). Same
  * semantics as the default provider — this pins that our state
  * encoders and timeout handling survive the swap, so flipping the
  * provider in production is a config change, not a migration.
  */
class RocksDbStateSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("value_change state persists across micro-batches under RocksDB") {
    import spark.implicits._
    // set at runtime (read per-query from SQLConf at stream start), so
    // the pin holds even when sbt test reuses a session another suite
    // built first
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksProvider)
    try rocksRun()
    finally prev match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def rocksRun(): Unit = {
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
      .format("memory").queryName("rocksfx").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-rocks").toString)
      .start()
    try {
      def msg(v: Long, off: Long) = Envelope("r", "dev", "data", lcd.name,
        "/time/to", Bson.encode(Seq("v" -> v)), 1000000L + off * 10000, "ip", off)

      input.addData(msg(8L, 1))
      q.processAllAvailable()
      // repeated value: RocksDB-held state from batch 1 suppresses it
      input.addData(msg(8L, 2))
      q.processAllAvailable()
      assert(spark.sql(
        "SELECT count(*) FROM rocksfx WHERE eventType = 'value_change'")
        .head().getLong(0) == 1)

      // changed value: fires again, carrying the RocksDB-stored prior
      input.addData(msg(20L, 3))
      q.processAllAvailable()
      assert(spark.sql(
        "SELECT count(*) FROM rocksfx WHERE eventType = 'value_change'")
        .head().getLong(0) == 2)
      // the query really ran on RocksDB, not a silent fallback
      assert(q.lastProgress.stateOperators.asInstanceOf[Array[_]].nonEmpty)
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
    } finally q.stop()
  }
}
