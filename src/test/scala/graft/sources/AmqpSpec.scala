package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Real AMQP 0-9-1 framing against the broker: the full
  * connection.start → start-ok → tune → tune-ok → open → open-ok
  * negotiation, channel.open, framed basic.publish with a header
  * field-table, basic.consume/deliver, and basic.ack advancing the
  * same truncation floor the custom protocol uses — closing the
  * protocol-fidelity gap with the reference's AMQP front door
  * (`amqp_data_consumer.ex:109-165`) zero-egress.
  */
class AmqpSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AMQP handshake + publish + consume + ack round-trip, interoperating with the custom dialect") {
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    val custom = new BrokerClient("127.0.0.1", broker.port)
    try {
      // publish over REAL AMQP framing, headers as a field table
      (1 to 5).foreach { i =>
        amqp.publish(0, Array(i.toByte),
          Seq("x_astarte_msg_type" -> "data".getBytes,
            "n" -> Array(i.toByte)))
      }
      // both dialects see the same queue: the custom client reads the
      // AMQP-published records byte-for-byte (publish is async — no
      // response frame — so wait for the broker thread to land them)
      val pubDeadline = System.currentTimeMillis() + 5000
      while (broker.endOffsets.head < 5L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      val viaCustom = custom.fetch(0, 0L, 10)
      assert(viaCustom.map(_.value.head.toInt) == Seq(1, 2, 3, 4, 5))
      assert(viaCustom.head.headers.map(_._1) == Seq("x_astarte_msg_type", "n"))
      assert(new String(viaCustom.head.headers.head._2) == "data")

      // consume over AMQP: consume-ok then framed deliveries
      val deliveries = amqp.consume(0, 5)
      assert(deliveries.map(_.offset) == Seq(0L, 1L, 2L, 3L, 4L))
      assert(deliveries.map(_.value.head.toInt) == Seq(1, 2, 3, 4, 5))
      assert(deliveries.forall(d =>
        d.headers.exists(h => h._1 == "x_astarte_msg_type" &&
          new String(h._2) == "data")))

      // ack through delivery-tag 2 → the shared floor truncates 0..2
      amqp.ack(2L)
      // the ack is async (publish-style); poll the floor briefly
      val deadline = System.currentTimeMillis() + 5000
      while (broker.baseOffsets.head < 3L &&
          System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(broker.baseOffsets == Seq(3L))
      assert(custom.fetch(0, 0L, 10).isEmpty) // below the floor: gone
      assert(custom.fetch(0, 3L, 10).map(_.value.head.toInt) == Seq(4, 5))
    } finally {
      amqp.close(); custom.close(); broker.close()
    }
  }

  test("push dialect: basic.consume delivers the whole retained backlog") {
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    try {
      (1 to 4).foreach(i => amqp.publish(0, Array(i.toByte), Nil))
      val pubDeadline = System.currentTimeMillis() + 5000
      while (broker.endOffsets.head < 4L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      // a foreign AMQP client consumes by push, not get: the broker
      // must deliver the full backlog after consume-ok (a DEDICATED
      // connection — a pushed backlog interleaves with nothing else)
      val pushClient = new AmqpClient("127.0.0.1", broker.port)
      try {
        val pushed = pushClient.consumePush(0, 4)
        assert(pushed.map(_.offset) == Seq(0L, 1L, 2L, 3L))
        assert(pushed.map(_.value.head.toInt) == Seq(1, 2, 3, 4))
      } finally pushClient.close()
      // the polling dialect still sees the same queue afterwards
      assert(amqp.consume(0, 10).map(_.offset) == Seq(0L, 1L, 2L, 3L))
      // and a bad queue name is a protocol error, not shard 0: the
      // connection dies instead of silently returning misrouted data
      val evil = new AmqpClient("127.0.0.1", broker.port)
      try {
        intercept[Exception] {
          evil.publish(99, Array(1.toByte), Nil) // shard 99 doesn't exist
          evil.consume(0, 1) // force a response read to observe the close
        }
      } finally evil.close()
    } finally { amqp.close(); broker.close() }
  }

  test("basic.qos prefetch caps unacked deliveries; acks reopen the window") {
    val broker = new MessageBroker()
    val pub = new AmqpClient("127.0.0.1", broker.port)
    try {
      (0 until 900).foreach(i => pub.publish(0, Array((i % 127).toByte), Nil))
      val pubDeadline = System.currentTimeMillis() + 10000
      while (broker.endOffsets.head < 900L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      assert(broker.endOffsets.head == 900L)
      // the reference's capacity envelope: prefetch 300
      // (`config.ex:76-78`, `amqp_data_consumer.ex:153`) — a consumer
      // that never sees more than 300 unacked while the backlog drains
      val consumer = new AmqpClient("127.0.0.1", broker.port)
      try {
        consumer.qos(300)
        consumer.consumeStart(0)
        var next = 0L
        (1 to 3).foreach { _ =>
          val batch = (1 to 300).map(_ => consumer.readDelivery())
          assert(batch.map(_.offset) == (next until next + 300))
          // pause probe: after 300 deliveries the next frame MUST be
          // a qos-ok, not a 301st deliver — the window held
          consumer.qos(300)
          next += 300
          consumer.ack(next - 1) // cumulative ack reopens the window
        }
        val ackDeadline = System.currentTimeMillis() + 5000
        while (broker.baseOffsets.head < 900L &&
            System.currentTimeMillis() < ackDeadline) Thread.sleep(10)
        assert(broker.baseOffsets == Seq(900L)) // backlog fully drained
      } finally consumer.close()
    } finally { pub.close(); broker.close() }
  }

  test("basic.nack with requeue redelivers from the floor without advancing it") {
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    try {
      (1 to 5).foreach(i => amqp.publish(0, Array(i.toByte), Nil))
      val pubDeadline = System.currentTimeMillis() + 5000
      while (broker.endOffsets.head < 5L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      val consumer = new AmqpClient("127.0.0.1", broker.port)
      try {
        consumer.consumeStart(0)
        val first = (1 to 5).map(_ => consumer.readDelivery())
        assert(first.map(_.offset) == (0L until 5L))
        assert(first.forall(!_.redelivered))
        // the consumer "crashes" mid-processing: requeue everything —
        // the reference's tracker crash-requeue
        // (`message_tracker/server.ex:144-148`)
        consumer.nack(4L, multiple = true, requeue = true)
        val again = (1 to 5).map(_ => consumer.readDelivery())
        assert(again.map(_.offset) == (0L until 5L))
        assert(again.forall(_.redelivered), "requeued records must carry redelivered=1")
        assert(broker.baseOffsets == Seq(0L), "nack must not advance the floor")
        // a real ack then advances it
        consumer.ack(4L)
        val ackDeadline = System.currentTimeMillis() + 5000
        while (broker.baseOffsets.head < 5L &&
            System.currentTimeMillis() < ackDeadline) Thread.sleep(10)
        assert(broker.baseOffsets == Seq(5L))
      } finally consumer.close()
    } finally { amqp.close(); broker.close() }
  }

  test("basic.reject and single-message nack requeue exactly the tagged delivery") {
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    try {
      (1 to 5).foreach(i => amqp.publish(0, Array(i.toByte), Nil))
      val pubDeadline = System.currentTimeMillis() + 5000
      while (broker.endOffsets.head < 5L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      val consumer = new AmqpClient("127.0.0.1", broker.port)
      try {
        consumer.consumeStart(0)
        val first = (1 to 5).map(_ => consumer.readDelivery())
        assert(first.map(_.offset) == (0L until 5L))
        // basic.reject of tag 2: ONLY offset 2 comes back, flagged —
        // not a cumulative rewind (the 0-9-1 single-message form)
        consumer.reject(2L, requeue = true)
        val re = consumer.readDelivery()
        assert(re.offset == 2L && re.redelivered)
        // basic.nack multiple=false honors the tag the same way
        consumer.nack(4L, multiple = false, requeue = true)
        val re2 = consumer.readDelivery()
        assert(re2.offset == 4L && re2.redelivered)
        // nothing else was requeued: the floor is unmoved and a
        // heartbeat round-trip confirms no further deliveries pend
        assert(broker.baseOffsets == Seq(0L))
        consumer.heartbeat()
        consumer.ack(4L)
        val ackDeadline = System.currentTimeMillis() + 5000
        while (broker.baseOffsets.head < 5L &&
            System.currentTimeMillis() < ackDeadline) Thread.sleep(10)
        assert(broker.baseOffsets == Seq(5L))
      } finally consumer.close()
    } finally { amqp.close(); broker.close() }
  }

  test("reject of a tag outside the unacked window is a protocol error") {
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    try {
      amqp.publish(0, Array(1.toByte), Nil)
      val pubDeadline = System.currentTimeMillis() + 5000
      while (broker.endOffsets.head < 1L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      val consumer = new AmqpClient("127.0.0.1", broker.port)
      try {
        consumer.consumeStart(0)
        consumer.readDelivery()
        intercept[Exception] {
          consumer.reject(99L, requeue = true) // never delivered
          consumer.heartbeat() // force a read to observe the close
          consumer.readDelivery()
        }
      } finally consumer.close()
    } finally { amqp.close(); broker.close() }
  }

  test("client basic.cancel stops the push; unacked records redeliver flagged") {
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    try {
      (1 to 3).foreach(i => amqp.publish(0, Array(i.toByte), Nil))
      val pubDeadline = System.currentTimeMillis() + 5000
      while (broker.endOffsets.head < 3L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      val consumer = new AmqpClient("127.0.0.1", broker.port)
      try {
        consumer.consumeStart(0)
        assert((1 to 3).map(_ => consumer.readDelivery()).map(_.offset)
          == (0L until 3L))
        // unsubscribe without acking: cancel-ok confirms, and new
        // publishes are NOT pushed to this channel anymore
        consumer.cancel("ctag-0")
        amqp.publish(0, Array(4.toByte), Nil)
        val d2 = System.currentTimeMillis() + 5000
        while (broker.endOffsets.head < 4L &&
            System.currentTimeMillis() < d2) Thread.sleep(10)
        consumer.heartbeat() // would solicit pushes if still subscribed
        // the unacked+new backlog is all still there for a pull pass,
        // the previously-delivered part flagged redelivered (the
        // reference's resubscribe contract, amqp_data_consumer.ex:127)
        val repoll = consumer.consume(0, 10)
        assert(repoll.map(_.offset) == (0L until 4L))
        assert(repoll.map(_.redelivered) == Seq(true, true, true, false))
      } finally consumer.close()
    } finally { amqp.close(); broker.close() }
  }

  test("broker-initiated cancel surfaces as ConsumerCancelledException; resubscribe recovers") {
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    try {
      (1 to 3).foreach(i => amqp.publish(0, Array(i.toByte), Nil))
      val pubDeadline = System.currentTimeMillis() + 5000
      while (broker.endOffsets.head < 3L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      val consumer = new AmqpClient("127.0.0.1", broker.port)
      try {
        consumer.consumeStart(0)
        assert((1 to 3).map(_ => consumer.readDelivery()).map(_.offset)
          == (0L until 3L))
        broker.cancelConsumers()
        consumer.heartbeat() // next frame carries the cancel notice
        val ex = intercept[ConsumerCancelledException](consumer.readDelivery())
        assert(ex.consumerTag == "ctag-0")
        // the reference resubscribes on cancellation: the unacked
        // backlog redelivers in order, flagged
        consumer.consumeStart(0)
        val again = (1 to 3).map(_ => consumer.readDelivery())
        assert(again.map(_.offset) == (0L until 3L))
        assert(again.forall(_.redelivered))
      } finally consumer.close()
    } finally { amqp.close(); broker.close() }
  }

  test("channel.flow pauses deliveries without cancelling; resume flushes") {
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    try {
      (1 to 2).foreach(i => amqp.publish(0, Array(i.toByte), Nil))
      val pubDeadline = System.currentTimeMillis() + 5000
      while (broker.endOffsets.head < 2L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      val consumer = new AmqpClient("127.0.0.1", broker.port)
      try {
        consumer.consumeStart(0)
        assert((1 to 2).map(_ => consumer.readDelivery()).map(_.offset)
          == (0L until 2L))
        // gate the channel, publish more: the heartbeat that would
        // normally solicit the push must NOT produce a delivery —
        // the next frame after the echo is the flow-ok, not a deliver
        consumer.flow(active = false)
        amqp.publish(0, Array(3.toByte), Nil)
        val d2 = System.currentTimeMillis() + 5000
        while (broker.endOffsets.head < 3L &&
            System.currentTimeMillis() < d2) Thread.sleep(10)
        consumer.heartbeat()
        consumer.flow(active = false) // pause probe: flow-ok, no deliver
        // reopening the gate pushes the queued record
        consumer.flow(active = true)
        val d = consumer.readDelivery()
        assert(d.offset == 2L && d.value.head == 3.toByte)
      } finally consumer.close()
    } finally { amqp.close(); broker.close() }
  }

  test("connection.blocked notification reaches the client between responses") {
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    try {
      amqp.publish(0, Array(1.toByte), Nil)
      assert(amqp.blockedReason.isEmpty)
      broker.block("memory")
      // the notification rides ahead of the next response the client
      // reads (here a heartbeat echo) and must not desynchronize it
      amqp.heartbeat()
      assert(amqp.blockedReason.contains("memory"))
      broker.unblock()
      amqp.heartbeat()
      assert(amqp.blockedReason.isEmpty)
    } finally { amqp.close(); broker.close() }
  }

  test("basic.ack with no prior consume/get is a protocol error, not shard 0") {
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    try {
      (1 to 3).foreach(i => amqp.publish(0, Array(i.toByte), Nil))
      val pubDeadline = System.currentTimeMillis() + 5000
      while (broker.endOffsets.head < 3L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      // an ack on a fresh connection has no consumer shard to bind
      // the delivery tag to — the broker must NOT guess shard 0 and
      // truncate records nobody read
      val stray = new AmqpClient("127.0.0.1", broker.port)
      try {
        intercept[Exception] {
          stray.ack(2L) // async: force a response read to observe the close
          stray.consume(0, 1)
        }
      } finally stray.close()
      Thread.sleep(100) // give a (wrong) truncation time to land
      assert(broker.baseOffsets.head == 0L, "stray ack truncated shard 0")
      assert(amqp.consume(0, 10).map(_.offset) == Seq(0L, 1L, 2L))
    } finally { amqp.close(); broker.close() }
  }

  test("AMQP-published lifecycle flows through the DSv2 source end-to-end") {
    import org.apache.spark.sql.functions.col
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    try {
      (1 to 3).foreach(i => amqp.publish(0, Array(i.toByte),
        Seq("k" -> Array(i.toByte))))
      val pubDeadline = System.currentTimeMillis() + 5000
      while (broker.endOffsets.head < 3L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      // the graft-broker source (custom fast path) drains records the
      // AMQP front door ingested — one queue, two dialects
      val q = spark.readStream
        .format("graft-broker")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .load()
        .writeStream.format("memory").queryName("amqp_bridge").start()
      try {
        q.processAllAvailable()
        val rows = spark.sql(
          "SELECT offset, value FROM amqp_bridge ORDER BY offset").collect()
        assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
        assert(rows.map(_.getAs[Array[Byte]](1).head.toInt).toSeq == Seq(1, 2, 3))
      } finally q.stop()
    } finally { amqp.close(); broker.close() }
  }

  test("connection.close handshake and heartbeat echo") {
    val broker = new MessageBroker()
    val amqp = new AmqpClient("127.0.0.1", broker.port)
    try {
      (1 to 3).foreach(i => amqp.publish(0, Array(i.toByte), Nil))
      val pubDeadline = System.currentTimeMillis() + 5000
      while (broker.endOffsets.head < 3L &&
          System.currentTimeMillis() < pubDeadline) Thread.sleep(10)
      // liveness probe: heartbeat frame comes back as a heartbeat
      amqp.heartbeat()
      // graceful close: close → close-ok handshake completes (would
      // throw on a missing/wrong confirmation)
      amqp.closeGracefully()
      // the broker survives the departed client with its queue intact
      val again = new AmqpClient("127.0.0.1", broker.port)
      try assert(again.consume(0, 10).map(_.offset) == Seq(0L, 1L, 2L))
      finally again.close()
    } finally broker.close()
  }

  test("field-table and frame codec round-trip arbitrary header bytes") {
    val headers = Seq(
      "empty" -> Array.emptyByteArray,
      "utf8" -> "wörld-です".getBytes("UTF-8"),
      "bin" -> Array[Byte](0, -1, 127, -128, 61))
    val enc = AmqpWire.contentHeader(42L, headers)
    val (size, decoded) = AmqpWire.parseContentHeader(enc)
    assert(size == 42L)
    assert(decoded.map(_._1) == headers.map(_._1))
    assert(decoded.zip(headers).forall { case ((_, a), (_, b)) =>
      java.util.Arrays.equals(a, b)
    })
  }
}
