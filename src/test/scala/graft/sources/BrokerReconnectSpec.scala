package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The reference's connection manager redials its broker on a flat
  * backoff after a drop (`connection_manager.ex`, 10 s). The Spark
  * shape: the micro-batch stream's driver-side control client and the
  * per-partition readers redial with backoff instead of failing the
  * query on the first dead socket. This spec kills the broker
  * mid-stream, brings a new one up on the SAME port, and requires the
  * running query to carry on through the reconnect.
  */
class BrokerReconnectSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream survives a broker restart on the same port") {
    val broker1 = new MessageBroker()
    val port = broker1.port
    val pub1 = new BrokerClient("127.0.0.1", port)
    (1 to 3).foreach(i => pub1.publish(0, null, Array(i.toByte), Nil))
    pub1.close()

    val q = spark.readStream
      .format("graft-broker")
      .option("host", "127.0.0.1").option("port", port.toString)
      .option("reconnectBackoffMs", "50")
      .option("maxReconnects", "40") // ~2 s of patience in this test
      .load()
      .writeStream.format("memory").queryName("reconnect_stream").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM reconnect_stream").head().getLong(0) == 3L)

      // the broker dies; the driver's control socket and any reader
      // sockets die with it
      broker1.close()
      Thread.sleep(100)
      val broker2 = new MessageBroker(port)
      try {
        // the replacement broker has replayed the stream past the
        // consumed prefix (a durable broker would have retained it);
        // the checkpoint cursor is 3, so the query must pick up
        // offsets 3 and 4 — through a REDIALED connection
        val pub2 = new BrokerClient("127.0.0.1", port)
        (1 to 5).foreach(i => pub2.publish(0, null, Array((10 + i).toByte), Nil))
        pub2.close()
        q.processAllAvailable()
        val vals = spark.sql(
          "SELECT value FROM reconnect_stream ORDER BY offset")
          .collect().map(_.getAs[Array[Byte]](0).head.toInt).toSeq
        assert(vals == Seq(1, 2, 3, 14, 15),
          "query did not resume from its checkpoint cursor after the broker restart")
        assert(q.exception.isEmpty, s"query failed: ${q.exception}")
      } finally broker2.close()
    } finally q.stop()
  }
}
