package graft.storage

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.streaming._

/** Pins the bucketed serving layout: after `bucketizeHotTables`, the
  * store's hot reads — J3 prev-value windows and the J5 prune
  * anti-join — plan with ZERO Exchange below (or at all): the
  * write-time bucket shuffle on `(device_id, iface)` is amortized
  * over every serving read. This is the reference's Cassandra
  * partition-key locality re-expressed as Spark's persisted layout.
  */
class BucketedStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val stream = InterfaceDescriptor("com.test.SimpleStreamTest", 1, 0,
    InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
  private val registry = Registry(
    Map(stream.name -> stream),
    Map(stream.name -> Seq(
      Mapping(stream.name, 1, "/%{itemIndex}/value", AInteger))),
    Nil)

  /** Runtime-scoped confs so the assertions are deterministic under
    * the shared test-JVM session: a broadcast would replace the SMJ
    * (its BroadcastExchange is not the shuffle this spec is about)
    * and AQE's wrapper hides the executed-plan string.
    */
  private def withStaticPlans[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      // allow co-partitioned joins on a bucket-key PREFIX of the join
      // keys — the layout's whole point for the 3-key prune anti-join
      "spark.sql.requireAllClusterKeysForCoPartition")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketized hot reads: J3 window and J5 anti-join plan without shuffles") {
    val root = Files.createTempDirectory("graft-bstore").toString
    val store = new AstarteStore(root)
    val t0 = 1521645570000L

    def env(dev: String, path: String, v: Int, off: Long): Envelope =
      Envelope("realm", dev, "data", stream.name, path,
        Bson.encode(Seq("v" -> v)), (t0 + off * 1000) * 10, "ip", off)

    // 3 devices × 2 paths × 2 values each — every (device, path)
    // series has exactly one predecessor row
    import spark.implicits._
    val msgs = (1 to 3).flatMap { i =>
      val dev = s"device-$i"
      Seq(env(dev, "/0/value", 10 + i, i * 10 + 1),
          env(dev, "/0/value", 20 + i, i * 10 + 2),
          env(dev, "/1/value", 30 + i, i * 10 + 3),
          env(dev, "/1/value", 40 + i, i * 10 + 4))
    }.toDS()
    store.applyEffects(DeviceStateMachine.processBatch(msgs, registry))
    // one stored path that never got (or no longer has) value rows —
    // exactly what the J5 prune read exists to find
    store.pathIndex.append(Seq(
      ("device-2", stream.name, "/9/value", t0, 99L, null: java.lang.Long))
      .toDF("device_id", "iface", "path", "datetime_value",
        "reception_timestamp", "expiry_ms"))
    store.bucketizeHotTables(spark, buckets = 4)

    withStaticPlans {
      // J3: previous value timestamp per (device, iface, path) series.
      // The window keys extend the bucket key, so the bucketed scan's
      // partitioning already satisfies the clustering: NO Exchange in
      // the whole executed plan — only the in-partition sort.
      val prev = store.streamPrevTimestamps(spark)
      val prevPlan = prev.queryExecution.executedPlan.toString()
      assert(prevPlan.contains("Window"), s"expected a window:\n$prevPlan")
      assert(!prevPlan.contains("Exchange"),
        s"J3 window over the bucketed layout must not shuffle:\n$prevPlan")
      assert(prevPlan.contains("Bucketed: true"), "scan did not use bucketing")
      // every series has one row without predecessor and one with
      val rows = prev.collect()
      assert(rows.length == 12)
      assert(rows.count(_.isNullAt(4)) == 6)

      // J5: stored paths with no surviving datastream rows — SMJ
      // anti-join on (device_id, iface, path), both sides bucketed on
      // the key prefix: zero Exchange below the join.
      val prune = store.prunableStreamPaths(spark)
      val prunePlan = prune.queryExecution.executedPlan.toString()
      assert(prunePlan.contains("SortMergeJoin") &&
             prunePlan.contains("LeftAnti"),
        s"expected a sort-merge anti join:\n$prunePlan")
      val joinPart = prunePlan.substring(prunePlan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"J5 prune over the bucketed layout still shuffles:\n$joinPart")
      assert(prune.collect().map(r =>
        (r.getString(0), r.getString(2))).toSeq == Seq(("device-2", "/9/value")))
    }
  }
}
