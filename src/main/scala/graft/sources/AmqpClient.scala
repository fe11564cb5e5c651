package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket

/** AMQP 0-9-1 client for [[MessageBroker]]'s AMQP dialect — the
  * protocol-faithful twin of [[BrokerClient]], negotiating the real
  * connection.start/tune/open handshake and speaking framed
  * basic.publish / basic.consume / basic.deliver / basic.ack
  * (the reference front door's protocol, `amqp_data_consumer.ex`).
  * Queue names are shard indices; delivery tags are queue offsets,
  * so `ack` advances the same truncation floor the custom protocol's
  * ACK does. One in-flight request per connection, like an AMQP
  * channel.
  */
final class AmqpClient(host: String, port: Int) extends AutoCloseable {
  import AmqpWire._

  private val sock = new Socket(host, port)
  private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
  private var channelOpen = false
  // last flow-control state the broker announced (connection.blocked /
  // connection.unblocked on channel 0) — these arrive asynchronously
  // between any request and its response, so every response read goes
  // through [[readResponse]], which absorbs them here
  @volatile private var blockedBy: Option[String] = None

  /** The broker's current flow-control state as announced by
    * connection.blocked: Some(reason) while blocked, None otherwise.
    * Advisory — a publisher seeing Some should stop offering work.
    */
  def blockedReason: Option[String] = blockedBy

  // broker-initiated basic.cancel (the nowait notification form) can
  // likewise arrive between any request and response; recorded here
  // and surfaced by [[readDelivery]] as [[ConsumerCancelledException]]
  @volatile private var cancelledTag: Option[String] = None

  /** Read the next frame that is NOT an async notification.
    * connection.blocked/unblocked are recorded in [[blockedReason]];
    * a broker-initiated basic.cancel is recorded in `cancelledTag`.
    * Both are skipped, per the published capability contract (they
    * may interleave with any expected response).
    */
  private def readResponse(): Frame = {
    while (true) {
      val f = readFrame(in)
      if (f.frameType == FrameMethod) {
        val r = new Reader(f.payload)
        (r.u16(), r.u16()) match {
          case ConnBlocked if f.channel == 0 => blockedBy = Some(r.shortstr())
          case ConnUnblocked if f.channel == 0 => blockedBy = None
          case BasicCancel => cancelledTag = Some(r.shortstr())
          case _ => return f
        }
      } else return f
    }
    throw new IllegalStateException("unreachable")
  }

  // --- connection negotiation (the real 0-9-1 handshake) ------------------
  out.write(ProtocolHeader); out.flush()
  locally {
    val start = readFrame(in)
    val r = new Reader(start.payload)
    require((r.u16(), r.u16()) == ConnStart, "expected connection.start")
    require(r.u8() == 0 && r.u8() == 9, "not AMQP 0-9")
    sendMethod(0, ConnStartOk) { w =>
      w.table(Seq("product" -> "graft-client".getBytes("UTF-8")))
      w.shortstr("PLAIN")
      w.longstr(Array[Byte](0) ++ "guest".getBytes ++ Array[Byte](0) ++ "guest".getBytes)
      w.shortstr("en_US")
    }
    val tune = readFrame(in)
    require((new Reader(tune.payload)).u16() == 10, "expected connection.tune")
    sendMethod(0, ConnTuneOk)(w => w.u16(0).u32(131072).u16(0))
    sendMethod(0, ConnOpen)(w => w.shortstr("/").shortstr("").u8(0))
    val openOk = readFrame(in)
    val ro = new Reader(openOk.payload)
    require((ro.u16(), ro.u16()) == ConnOpenOk, "expected connection.open-ok")
  }

  private def sendMethod(channel: Int, cm: (Int, Int))(args: Writer => Unit): Unit =
    writeFrame(out, Frame(FrameMethod, channel, method(cm._1, cm._2)(args)))

  private def ensureChannel(): Unit = synchronized {
    if (!channelOpen) {
      sendMethod(1, ChannelOpen)(_.shortstr(""))
      val ok = readResponse()
      val r = new Reader(ok.payload)
      require((r.u16(), r.u16()) == ChannelOpenOk, "expected channel.open-ok")
      channelOpen = true
    }
  }

  /** basic.publish to a shard queue: method + content header (with
    * the routing headers as an AMQP field table) + body frame.
    */
  def publish(shard: Int, value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Unit = synchronized {
    ensureChannel()
    sendMethod(1, BasicPublish)(w =>
      w.u16(0).shortstr("").shortstr(shard.toString).u8(0))
    writeFrame(out, Frame(FrameHeader, 1,
      contentHeader(value.length.toLong, headers)))
    writeFrame(out, Frame(FrameBody, 1, value))
  }

  /** One delivered message: offset (the delivery tag), payload,
    * routing headers, and whether the broker flagged it redelivered
    * (a nack-requeued record comes back with redelivered=1).
    */
  final case class Delivery(offset: Long, value: Array[Byte],
      headers: Seq[(String, Array[Byte])], redelivered: Boolean = false)

  /** basic.qos: negotiate the per-channel prefetch window (0 = no
    * limit). Synchronous (qos-ok reply) — which doubles as a PAUSE
    * PROBE mid-consume: if the broker were still pushing past the
    * window, the next frame would be a deliver, not qos-ok, and this
    * throws.
    */
  def qos(prefetchCount: Int): Unit = synchronized {
    ensureChannel()
    sendMethod(1, BasicQos)(w => w.u32(0).u16(prefetchCount).u8(0))
    val ok = readResponse()
    val r = new Reader(ok.payload)
    require((r.u16(), r.u16()) == BasicQosOk,
      "expected basic.qos-ok (a deliver here means the prefetch window leaked)")
  }

  /** basic.nack (async, like ack): `requeue=true` rewinds delivery to
    * the ack floor without advancing it — the reference's
    * crash-requeue path.
    */
  def nack(deliveryTag: Long, multiple: Boolean, requeue: Boolean): Unit =
    synchronized {
      ensureChannel()
      sendMethod(1, BasicNack)(w => w.u64(deliveryTag)
        .u8((if (multiple) 1 else 0) | (if (requeue) 2 else 0)))
    }

  /** channel.flow: pause (active=false) or resume (active=true) the
    * broker's deliveries on this channel without cancelling the
    * subscription — the 0-9-1 core per-channel gate. Synchronous
    * (flow-ok echoes the state). On resume, records that queued while
    * paused are pushed at the broker's next write opportunity.
    */
  def flow(active: Boolean): Unit = synchronized {
    ensureChannel()
    sendMethod(1, ChannelFlow)(w => w.u8(if (active) 1 else 0))
    val ok = readResponse()
    val r = new Reader(ok.payload)
    require((r.u16(), r.u16()) == ChannelFlowOk, "expected channel.flow-ok")
    require((r.u8() != 0) == active, "flow-ok state mismatch")
  }

  /** basic.reject — the 0-9-1 core single-message negative ack
    * (basic.nack is the cumulative extension): exactly the tagged
    * delivery is requeued (flagged redelivered) or dropped below the
    * unmoved floor.
    */
  def reject(deliveryTag: Long, requeue: Boolean): Unit = synchronized {
    ensureChannel()
    sendMethod(1, BasicReject)(w =>
      w.u64(deliveryTag).u8(if (requeue) 1 else 0))
  }

  /** basic.cancel: unsubscribe the push consumer started by
    * [[consumeStart]] and wait for cancel-ok. Deliveries already in
    * flight when the cancel was sent arrive BEFORE the cancel-ok (the
    * 0-9-1 ordering guarantee) and are drained and DISCARDED here —
    * unacked, so they stay below the floor and redeliver (flagged) to
    * the next consumer, the reference's resubscribe contract
    * (`amqp_data_consumer.ex:127-141`).
    */
  def cancel(consumerTag: String): Unit = synchronized {
    ensureChannel()
    sendMethod(1, BasicCancel)(w => w.shortstr(consumerTag).u8(0))
    var done = false
    while (!done) {
      val f = readResponse()
      if (f.frameType == FrameMethod) {
        val r = new Reader(f.payload)
        (r.u16(), r.u16()) match {
          case BasicCancelOk => done = true
          case BasicDeliver => () // in-flight push; header/body follow
          case other =>
            throw new java.io.IOException(s"expected cancel-ok, got $other")
        }
      }
      // header/body frames of in-flight deliveries fall through
    }
  }

  /** Poll up to `max` messages off a shard queue with basic.get —
    * the spec's synchronous pull (get-ok + content per message,
    * get-empty when drained). Strictly request/response, so the
    * connection can never hold undrained frames: basic.consume's
    * async push either leaves surplus deliveries buffered (backlog >
    * max, desynchronizing every later method call) or blocks forever
    * waiting for deliveries that never come (backlog < max).
    */
  def consume(shard: Int, max: Int): Seq[Delivery] = synchronized {
    ensureChannel()
    val out0 = Seq.newBuilder[Delivery]
    var n = 0
    var drained = false
    while (n < max && !drained) {
      sendMethod(1, BasicGet)(w =>
        w.u16(0).shortstr(shard.toString).u8(0))
      val resp = readResponse()
      val r = new Reader(resp.payload)
      (r.u16(), r.u16()) match {
        case BasicGetEmpty =>
          drained = true
        case BasicGetOk =>
          val deliveryTag = r.u64()
          val redelivered = r.u8() != 0
          r.shortstr(); r.shortstr() // exchange, routing key
          val header = readResponse()
          require(header.frameType == FrameHeader, "expected content header")
          val (bodySize, headers) = parseContentHeader(header.payload)
          val body = new java.io.ByteArrayOutputStream()
          while (body.size() < bodySize) {
            val bf = readResponse()
            require(bf.frameType == FrameBody, "expected content body")
            body.write(bf.payload)
          }
          out0 += Delivery(deliveryTag, body.toByteArray, headers, redelivered)
          n += 1
        case other =>
          throw new java.io.IOException(s"expected get-ok/get-empty, got $other")
      }
    }
    out0.result()
  }

  /** Push-model consume: basic.consume → consume-ok → the broker
    * pushes the retained backlog as deliver + header + body triplets.
    * Reads exactly `expect` deliveries, so the CALLER must know the
    * backlog size — which is why production polling uses [[consume]];
    * this exists to keep the broker's spec-mandated push dialect
    * exercised (a foreign AMQP client will basic.consume, not get).
    *
    * Delivery is pull-on-frame (see the broker's pump note): records
    * published by another connection AFTER the subscription went idle
    * are pushed at this consumer's next outbound frame — send a
    * [[heartbeat]] (or any method) to solicit them before
    * [[readDelivery]], or the read blocks until traffic appears.
    */
  private[sources] def consumePush(shard: Int, expect: Int): Seq[Delivery] =
    synchronized {
      consumeStart(shard)
      (1 to expect).map(_ => readDelivery())
    }

  /** Send basic.consume and read the consume-ok; pushed deliveries are
    * then read one at a time with [[readDelivery]] (so a test can
    * interleave acks/nacks/qos probes with the push stream).
    */
  private[sources] def consumeStart(shard: Int): Unit = synchronized {
    ensureChannel()
    cancelledTag = None // a fresh subscription supersedes old notices
    sendMethod(1, BasicConsume)(w =>
      w.u16(0).shortstr(shard.toString).shortstr(s"ctag-$shard").u8(0))
    val ok = readResponse()
    val r = new Reader(ok.payload)
    require((r.u16(), r.u16()) == BasicConsumeOk, "expected basic.consume-ok")
  }

  /** Read one pushed deliver + header + body triplet. */
  private[sources] def readDelivery(): Delivery = synchronized {
    // a broker-initiated cancellation (absorbed by any earlier read,
    // e.g. a heartbeat) means the subscription is gone: unacked
    // deliveries will redeliver — flagged — to whoever subscribes
    // next. Surfaced as a typed exception so the caller can
    // resubscribe, the reference's reaction
    // (`amqp_data_consumer.ex:127-141`).
    cancelledTag.foreach { t =>
      cancelledTag = None
      throw new ConsumerCancelledException(t)
    }
    val del = readResponse()
    val dr = new Reader(del.payload)
    require((dr.u16(), dr.u16()) == BasicDeliver, "expected basic.deliver")
    dr.shortstr() // consumer tag
    val deliveryTag = dr.u64()
    val redelivered = dr.u8() != 0
    val header = readResponse()
    require(header.frameType == FrameHeader, "expected content header")
    val (bodySize, headers) = parseContentHeader(header.payload)
    val body = new java.io.ByteArrayOutputStream()
    while (body.size() < bodySize) {
      val bf = readResponse()
      require(bf.frameType == FrameBody, "expected content body")
      body.write(bf.payload)
    }
    Delivery(deliveryTag, body.toByteArray, headers, redelivered)
  }

  /** basic.ack with multiple=true: acknowledges everything up to and
    * including `deliveryTag`, advancing the broker's truncation floor.
    */
  def ack(deliveryTag: Long): Unit = synchronized {
    ensureChannel()
    sendMethod(1, BasicAck)(w => w.u64(deliveryTag).u8(1))
  }

  /** One heartbeat round-trip: send a heartbeat frame, require the
    * broker's echo — the spec's liveness probe for an idle connection.
    */
  def heartbeat(): Unit = synchronized {
    writeFrame(out, Frame(FrameHeartbeat, 0, Array.emptyByteArray))
    val f = readResponse()
    require(f.frameType == FrameHeartbeat, "expected heartbeat echo")
  }

  /** The graceful shutdown handshake: connection.close (reply-code
    * 200, no offending method) → connection.close-ok → socket down.
    * A broker that never confirms means messages may still be in
    * flight — which is why [[close]] prefers this over just dropping
    * the socket.
    */
  def closeGracefully(): Unit = synchronized {
    sendMethod(0, ConnClose)(w =>
      w.u16(200).shortstr("goodbye").u16(0).u16(0))
    // drain whatever was already in flight (pushed deliveries, their
    // content frames, notifications) until close-ok — per the spec a
    // peer must discard non-close frames once it sent close. Bounded:
    // an unresponsive-but-open peer trips the socket read timeout set
    // by [[close]] instead of hanging forever.
    var done = false
    var budget = 10000
    while (!done && budget > 0) {
      budget -= 1
      val f = readResponse()
      if (f.frameType == FrameMethod) {
        val r = new Reader(f.payload)
        if ((r.u16(), r.u16()) == ConnCloseOk) done = true
      }
    }
    require(done, "no connection.close-ok within frame budget")
    sock.close()
  }

  override def close(): Unit =
    if (!sock.isClosed) {
      // a hung peer must not hang close(): bound the handshake reads
      try sock.setSoTimeout(2000) catch { case _: Throwable => () }
      try closeGracefully()
      catch { case _: Throwable => try sock.close() catch { case _: Throwable => () } }
    }
}

/** The broker cancelled our push consumer (basic.cancel arrived where
  * a deliver was expected); resubscribe or give up.
  */
final class ConsumerCancelledException(val consumerTag: String)
  extends java.io.IOException(s"consumer '$consumerTag' cancelled by broker")
