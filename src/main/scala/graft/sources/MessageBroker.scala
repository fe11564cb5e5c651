package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}

/** One record as it lives in a broker shard queue: assigned offset,
  * broker-side publish timestamp, opaque key/value, and routing
  * headers — the wire shape of the reference's AMQP deliveries
  * (`amqp_data_consumer.ex:109-165`: payload + `x_astarte_*` headers
  * per message, FIFO within a queue shard).
  */
final case class BrokerRecord(
    offset: Long,
    tsMs: Long,
    key: Array[Byte],
    value: Array[Byte],
    headers: Seq[(String, Array[Byte])])

/** A minimal in-JVM TCP message broker with sharded FIFO queues — the
  * stand-in for the reference's AMQP broker in an environment that
  * ships no broker client jar. It exists so the CLIENT path is real:
  * [[BrokerClient]] (and the `graft-broker` Spark source built on it,
  * [[BrokerSourceProvider]]) speaks an actual length-framed binary
  * protocol over an actual socket, with offset-based fetch,
  * per-shard end offsets, and a live shard-add (the consumer-group
  * rebalance hook). Swapping in a managed broker changes the server
  * side only.
  *
  * Protocol (DataInput/Output framing, one request-response per
  * round-trip, thread per connection):
  *   0 SHARDS      ()                         → int count
  *   1 END_OFFSETS ()                         → int n, n × long
  *   2 FETCH       (int shard, long from,
  *                  int max)                  → int n, n × record
  *   3 PUBLISH     (int shard, key, value,
  *                  int nHeaders × header)    → long offset
  *   4 ADD_SHARD   ()                         → int newCount
  *   5 ACK         (int shard, long upTo)     → long newBase
  * record = long offset, long tsMs, key, value, int nHeaders × header
  * key/value = int len + bytes (len -1 = null); header = UTF key + bytes value
  */
final class MessageBroker(requestedPort: Int = 0) extends AutoCloseable {

  private val server = new ServerSocket(requestedPort)
  /** The bound port (ephemeral when requestedPort = 0). */
  val port: Int = server.getLocalPort

  /** One FIFO queue. Offsets are absolute and monotonic; `base` is the
    * first still-retained offset — records below it were acknowledged
    * and truncated (the reference's ack-after-write FIFO,
    * `message_tracker/server.ex:45-88`), which is what bounds broker
    * memory to the unacked backlog instead of the stream's lifetime.
    */
  private final class Shard {
    val buf = scala.collection.mutable.ArrayBuffer.empty[BrokerRecord]
    var base: Long = 0L
    def end: Long = base + buf.length
  }

  private val shards = scala.collection.mutable.ArrayBuffer(new Shard)
  @volatile private var running = true

  // --- queue operations (also the server-side API for tests) -------------

  def shardCount: Int = synchronized(shards.length)

  def addShard(): Int = synchronized { shards += new Shard; shards.length }

  def endOffsets: Seq[Long] = synchronized(shards.map(_.end).toSeq)

  /** First retained offset per shard (the ack/truncation floor). */
  def baseOffsets: Seq[Long] = synchronized(shards.map(_.base).toSeq)

  def publish(shard: Int, key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Long = synchronized {
    val q = shards(shard)
    val off = q.end
    q.buf += BrokerRecord(off, System.currentTimeMillis(), key, value, headers)
    off
  }

  /** Acknowledge offsets below `upTo` (exclusive) as durably consumed
    * and truncate them. Acks never move the floor backwards and never
    * past the end; returns the new floor.
    */
  def ack(shard: Int, upTo: Long): Long = synchronized {
    val q = shards(shard)
    val newBase = math.min(math.max(q.base, upTo), q.end)
    if (newBase > q.base) {
      q.buf.remove(0, (newBase - q.base).toInt)
      q.base = newBase
    }
    q.base
  }

  /** Records in [from, from+max). A `from` below the truncation floor
    * returns EMPTY — the range is gone; serving from the floor instead
    * would let a rewound consumer silently skip the missing records.
    */
  def fetch(shard: Int, from: Long, max: Int): Seq[BrokerRecord] = synchronized {
    if (shard < 0 || shard >= shards.length) Nil
    else {
      val q = shards(shard)
      if (from < q.base || from >= q.end) Nil
      else {
        val lo = (from - q.base).toInt
        val hi = (math.min(q.end, from + math.max(0, max)) - q.base).toInt
        q.buf.slice(lo, hi).toList
      }
    }
  }

  // --- the socket server --------------------------------------------------

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock))
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () /* closed */ }
    }
  }, s"graft-broker-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    try {
      while (running) {
        val first = in.readByte()
        if (first == 'A') {
          // AMQP protocol header "AMQP\0\0\x09\x01": this connection
          // speaks real AMQP 0-9-1 framing; the custom fast-path
          // commands are 0..5, so the dialects can't collide
          val rest = new Array[Byte](7)
          in.readFully(rest)
          if (!java.util.Arrays.equals(
              Array[Byte]('A') ++ rest, AmqpWire.ProtocolHeader))
            throw new java.io.IOException("bad AMQP protocol header")
          serveAmqp(in, out)
          return
        }
        first match {
          case 0 =>
            out.writeInt(shardCount)
          case 1 =>
            val ends = endOffsets
            out.writeInt(ends.length)
            ends.foreach(out.writeLong)
          case 2 =>
            val (shard, from, max) = (in.readInt(), in.readLong(), in.readInt())
            val recs = fetch(shard, from, max)
            out.writeInt(recs.length)
            recs.foreach { r =>
              out.writeLong(r.offset); out.writeLong(r.tsMs)
              BrokerWire.writeBytes(out, r.key); BrokerWire.writeBytes(out, r.value)
              out.writeInt(r.headers.length)
              r.headers.foreach { case (k, v) =>
                out.writeUTF(k); BrokerWire.writeBytes(out, v)
              }
            }
          case 3 =>
            val shard = in.readInt()
            val key = BrokerWire.readBytes(in)
            val value = BrokerWire.readBytes(in)
            val n = in.readInt()
            val hs = (1 to n).map(_ => in.readUTF() -> BrokerWire.readBytes(in))
            out.writeLong(publish(shard, key, value, hs))
          case 4 =>
            out.writeInt(addShard())
          case 5 =>
            val (shard, upTo) = (in.readInt(), in.readLong())
            out.writeLong(ack(shard, upTo))
          case 6 =>
            val bases = baseOffsets
            out.writeInt(bases.length)
            bases.foreach(out.writeLong)
          case other =>
            throw new java.io.IOException(s"unknown broker command $other")
        }
        out.flush()
      }
    } catch { case _: Throwable => () /* client went away */ }
    finally sock.close()
  }

  /** One AMQP 0-9-1 connection: negotiate start/tune/open, then serve
    * channel.open, basic.publish (with content header + body frames),
    * basic.consume (delivering the shard's retained backlog) and
    * basic.ack (advancing the shard's truncation floor). Delivery tags
    * are the queue offsets, so ack semantics line up exactly with the
    * custom protocol's ACK command.
    */
  private def serveAmqp(in: DataInputStream, out: DataOutputStream): Unit = {
    import AmqpWire._
    def sendMethod(channel: Int, cm: (Int, Int))(args: Writer => Unit): Unit =
      writeFrame(out, Frame(FrameMethod, channel,
        method(cm._1, cm._2)(args)))

    // connection negotiation
    sendMethod(0, ConnStart) { w =>
      w.u8(0).u8(9)
      w.table(Seq("product" -> "graft-broker".getBytes("UTF-8")))
      w.longstr("PLAIN".getBytes); w.longstr("en_US".getBytes)
    }
    var f = readFrame(in) // start-ok (args ignored: no auth in-JVM)
    sendMethod(0, ConnTune)(w => w.u16(0).u32(131072).u16(0))
    f = readFrame(in) // tune-ok
    f = readFrame(in) // connection.open
    sendMethod(0, ConnOpenOk)(_.shortstr(""))

    // per-channel state: the shard a consumer subscribed on
    val consumerShard = scala.collection.mutable.Map.empty[Int, Int]
    // per-channel push-consumer state: the delivery cursor (next offset
    // to push) and the redelivery watermark (offsets below it were
    // pushed before — a nack-requeued record carries redelivered=1,
    // per the 0-9-1 contract)
    final class PushState(val tag: String, val queue: String, val shard: Int) {
      var cursor: Long = 0L
      var redeliverBelow: Long = -1L
    }
    val pushState = scala.collection.mutable.Map.empty[Int, PushState]
    // per-channel negotiated basic.qos prefetch-count; 0/absent =
    // unlimited (the spec's "no specific limit"). This is the
    // reference's capacity-envelope knob (`config.ex:76-78`, applied
    // at `amqp_data_consumer.ex:153` as prefetch 300).
    val prefetch = scala.collection.mutable.Map.empty[Int, Int]

    // Deliver as much of the shard's retained backlog as the prefetch
    // window allows. Unacked-count = cursor - ackFloor (delivery tags
    // are offsets and acks truncate), so the window closes itself as
    // deliveries outpace acks and reopens on every ack — back-pressure
    // for a slow consumer, exactly what prefetch exists for.
    def pump(channel: Int): Unit = pushState.get(channel).foreach { st =>
      val pf = prefetch.getOrElse(channel, 0)
      var go = true
      while (go) {
        val (base, end) = synchronized { val q = shards(st.shard); (q.base, q.end) }
        if (st.cursor < base) st.cursor = base
        if (st.cursor >= end || (pf > 0 && st.cursor - base >= pf)) go = false
        else fetch(st.shard, st.cursor, 1).headOption match {
          case None => go = false
          case Some(rec) =>
            sendMethod(channel, BasicDeliver) { w =>
              w.shortstr(st.tag).u64(rec.offset)
                .u8(if (rec.offset < st.redeliverBelow) 1 else 0)
              w.shortstr("").shortstr(st.queue)
            }
            writeFrame(out, Frame(FrameHeader, channel,
              contentHeader(rec.value.length.toLong, rec.headers)))
            writeFrame(out, Frame(FrameBody, channel, rec.value))
            st.cursor = rec.offset + 1
        }
      }
    }
    // per-connection basic.get cursors: next offset to hand out per
    // shard; a fresh connection restarts at the ack floor (unacked
    // messages redeliver, the AMQP contract)
    val getCursor = scala.collection.mutable.Map.empty[Int, Long]
    // queue names/routing keys are shard indices; anything else is a
    // protocol error, not a silent default to shard 0
    def shardOf(name: String, what: String): Int =
      name.toIntOption.filter(s => s >= 0 && s < shardCount).getOrElse(
        throw new java.io.IOException(
          s"$what '$name' is not a shard index [0, $shardCount)"))

    while (running) {
      val frame = readFrame(in)
      if (frame.frameType == FrameMethod) {
        val r = new Reader(frame.payload)
        (r.u16(), r.u16()) match {
          case ChannelOpen =>
            r.shortstr() // reserved
            sendMethod(frame.channel, ChannelOpenOk)(_.longstr(Array.emptyByteArray))

          case BasicPublish =>
            r.u16() // reserved
            r.shortstr() // exchange (default)
            val routingKey = r.shortstr() // shard index
            val header = readFrame(in)
            require(header.frameType == FrameHeader, "expected content header")
            val (bodySize, headers) = parseContentHeader(header.payload)
            val body = new java.io.ByteArrayOutputStream()
            while (body.size() < bodySize) {
              val bf = readFrame(in)
              require(bf.frameType == FrameBody, "expected content body")
              body.write(bf.payload)
            }
            val shard = shardOf(routingKey, "routing key")
            publish(shard, null, body.toByteArray, headers)

          case BasicQos =>
            r.u32() // prefetch-size (octets): not enforced, like RabbitMQ
            val count = r.u16()
            r.u8() // global flag: one consumer per channel here
            prefetch(frame.channel) = count
            sendMethod(frame.channel, BasicQosOk)(_ => ())
            pump(frame.channel) // a raised window may unblock deliveries

          case BasicConsume =>
            r.u16() // reserved
            val queue = r.shortstr()
            val tag = r.shortstr()
            val shard = shardOf(queue, "queue")
            consumerShard(frame.channel) = shard
            val st = new PushState(tag, queue, shard)
            st.cursor = synchronized(shards(shard).base)
            pushState(frame.channel) = st
            sendMethod(frame.channel, BasicConsumeOk)(_.shortstr(tag))
            // deliver the retained backlog (ack floor → end), one
            // deliver + header + body per record, delivery-tag =
            // offset — paced by the channel's prefetch window
            pump(frame.channel)

          case BasicGet =>
            // the synchronous poll of the 0-9-1 spec: one message per
            // get-ok (+ header + body), get-empty when drained — the
            // bounded request/response shape a snapshot reader needs
            // (basic.consume pushes the whole backlog asynchronously)
            r.u16() // reserved
            val queue = r.shortstr()
            r.u8() // no-ack flag: acks always explicit here
            val shard = shardOf(queue, "queue")
            val (lo, hi) = synchronized {
              val q = shards(shard); (q.base, q.end)
            }
            val cursor = math.max(getCursor.getOrElse(shard, lo), lo)
            val rec = fetch(shard, cursor, 1).headOption
            rec match {
              case None =>
                sendMethod(frame.channel, BasicGetEmpty)(_.shortstr(""))
              case Some(record) =>
                getCursor(shard) = record.offset + 1
                consumerShard(frame.channel) = shard
                sendMethod(frame.channel, BasicGetOk) { w =>
                  w.u64(record.offset).u8(0)
                  w.shortstr("").shortstr(queue)
                  w.u32(math.max(hi - record.offset - 1, 0L).toInt)
                }
                writeFrame(out, Frame(FrameHeader, frame.channel,
                  contentHeader(record.value.length.toLong, record.headers)))
                writeFrame(out, Frame(FrameBody, frame.channel, record.value))
            }

          case BasicAck =>
            val deliveryTag = r.u64()
            r.u8() // multiple flag: offsets are cumulative either way
            // an ack on a channel with no prior consume/get has no
            // shard to attribute the tag to — defaulting would
            // silently truncate shard 0's unread records; per 0-9-1
            // an unknown delivery-tag is a precondition failure
            val shard = consumerShard.getOrElse(frame.channel,
              throw new java.io.IOException(
                s"basic.ack on channel ${frame.channel} with no prior consume/get"))
            ack(shard, deliveryTag + 1)
            pump(frame.channel) // the freed window admits more deliveries

          case BasicNack =>
            // the reference nack-requeues when a tracker crashes mid-
            // message (`message_tracker/server.ex:144-148`): the floor
            // does NOT advance and the backlog redelivers from it
            r.u64() // delivery-tag (cumulative floor rewind either way)
            val bits = r.u8() // bit0 multiple, bit1 requeue
            val shard = consumerShard.getOrElse(frame.channel,
              throw new java.io.IOException(
                s"basic.nack on channel ${frame.channel} with no prior consume/get"))
            if ((bits & 2) != 0) {
              // requeue: rewind this channel's cursors to the ack
              // floor; already-pushed records go out again flagged
              // redelivered=1
              pushState.get(frame.channel).foreach { st =>
                st.redeliverBelow = math.max(st.redeliverBelow, st.cursor)
                st.cursor = synchronized(shards(st.shard).base)
              }
              getCursor.remove(shard)
              pump(frame.channel)
            }
            // requeue=false would dead-letter in a full broker; with no
            // DLX the records simply stay below the unmoved floor for
            // the next consumer — either way the floor never advances

          case ChannelClose =>
            // drop the channel's consumer/prefetch state and confirm;
            // the connection (and other channels) stay up
            consumerShard.remove(frame.channel)
            pushState.remove(frame.channel)
            prefetch.remove(frame.channel)
            sendMethod(frame.channel, ChannelCloseOk)(_ => ())

          case ConnClose =>
            // the graceful shutdown handshake of the 0-9-1 spec: the
            // peer announces close (reply-code + text + offending
            // class/method), we confirm with close-ok and drop the
            // socket — so a clean disconnect is distinguishable from a
            // died peer (which is only ever detected by read failure)
            sendMethod(0, ConnCloseOk)(_ => ())
            return

          case other =>
            throw new java.io.IOException(s"unsupported AMQP method $other")
        }
      } else if (frame.frameType == FrameHeartbeat) {
        // heartbeat echo: the spec's liveness signal — a peer sending
        // heartbeats on an idle connection gets proof the broker is
        // still there without a timer thread on either side
        writeFrame(out, Frame(FrameHeartbeat, 0, Array.emptyByteArray))
      }
      // other stray frames are ignored
    }
  }

  override def close(): Unit = {
    running = false
    server.close()
  }
}

private[sources] object BrokerWire {
  def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit =
    if (b == null) out.writeInt(-1)
    else { out.writeInt(b.length); out.write(b) }

  def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    if (n < 0) null
    else {
      val b = new Array[Byte](n)
      in.readFully(b)
      b
    }
  }
}

/** The broker CLIENT — the code path the reference's AMQP consumer
  * occupies (`amqp_data_consumer.ex`): a socket to the broker, offset
  * cursors, batched fetch. One instance per user; calls are
  * synchronized on the connection (one in-flight request per socket,
  * like an AMQP channel). Used driver-side for offset discovery and
  * executor-side by each input partition reader.
  */
final class BrokerClient(host: String, port: Int) extends AutoCloseable {
  private val sock = new Socket(host, port)
  private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

  def shardCount(): Int = synchronized {
    out.writeByte(0); out.flush(); in.readInt()
  }

  def endOffsets(): Seq[Long] = synchronized {
    out.writeByte(1); out.flush()
    val n = in.readInt()
    (1 to n).map(_ => in.readLong())
  }

  /** Per-shard truncation floor (first retained offset). */
  def baseOffsets(): Seq[Long] = synchronized {
    out.writeByte(6); out.flush()
    val n = in.readInt()
    (1 to n).map(_ => in.readLong())
  }

  def fetch(shard: Int, from: Long, max: Int): Seq[BrokerRecord] = synchronized {
    out.writeByte(2); out.writeInt(shard); out.writeLong(from); out.writeInt(max)
    out.flush()
    val n = in.readInt()
    (1 to n).map { _ =>
      val off = in.readLong(); val ts = in.readLong()
      val key = BrokerWire.readBytes(in); val value = BrokerWire.readBytes(in)
      val nh = in.readInt()
      val hs = (1 to nh).map(_ => in.readUTF() -> BrokerWire.readBytes(in))
      BrokerRecord(off, ts, key, value, hs)
    }
  }

  def publish(shard: Int, key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Long = synchronized {
    out.writeByte(3); out.writeInt(shard)
    BrokerWire.writeBytes(out, key); BrokerWire.writeBytes(out, value)
    out.writeInt(headers.length)
    headers.foreach { case (k, v) => out.writeUTF(k); BrokerWire.writeBytes(out, v) }
    out.flush()
    in.readLong()
  }

  def addShard(): Int = synchronized {
    out.writeByte(4); out.flush(); in.readInt()
  }

  def ack(shard: Int, upTo: Long): Long = synchronized {
    out.writeByte(5); out.writeInt(shard); out.writeLong(upTo)
    out.flush(); in.readLong()
  }

  override def close(): Unit = sock.close()
}
