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
    /** High-water mark of delivery: offsets below this were handed to
      * SOME consumer at least once, so handing them out again must set
      * the 0-9-1 `redelivered` flag — regardless of which connection
      * or channel saw them first (real brokers track this per-message;
      * a monotone mark is equivalent under FIFO delivery).
      */
    var deliveredBelow: Long = 0L
    def end: Long = base + buf.length
  }

  private val shards = scala.collection.mutable.ArrayBuffer(new Shard)
  @volatile private var running = true
  // connection.blocked flow control (the RabbitMQ capability
  // extension): when set, every AMQP connection notifies its peer at
  // the next write opportunity. Operational hook — a real broker
  // raises this on memory/disk alarms.
  @volatile private var blockedReason: Option[String] = None
  // consumer-cancel epoch: bumping it makes every AMQP connection
  // send basic.cancel to its push consumers (the broker-initiated
  // cancellation the reference's consumer reacts to by resubscribing,
  // `amqp_data_consumer.ex:127-141`)
  @volatile private var cancelEpoch: Int = 0

  /** Raise the connection.blocked notification on all AMQP
    * connections (cleared with [[unblock]]). Publishes are still
    * accepted — the notification is advisory back-pressure, exactly
    * the published RabbitMQ semantics.
    */
  def block(reason: String): Unit = blockedReason = Some(reason)

  def unblock(): Unit = blockedReason = None

  /** Broker-initiated basic.cancel of every push consumer; their
    * unacked backlog stays below the floor and redelivers (flagged)
    * to the next consumer.
    */
  def cancelConsumers(): Unit = cancelEpoch += 1

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

  /** Record that `offset` is being delivered; returns true when this
    * is a REdelivery (the offset was already handed out once).
    */
  private def markDelivered(shard: Int, offset: Long): Boolean = synchronized {
    val q = shards(shard)
    val re = offset < q.deliveredBelow
    if (offset + 1 > q.deliveredBelow) q.deliveredBelow = offset + 1
    re
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
    // to push) and the set of single-message requeues (basic.reject /
    // basic.nack multiple=false) pending redelivery ahead of the
    // cursor. The redelivered flag itself comes from the shard's
    // deliveredBelow mark, so it survives cancel and reconnect.
    final class PushState(val tag: String, val queue: String, val shard: Int) {
      var cursor: Long = 0L
      val requeued = scala.collection.mutable.TreeSet.empty[Long]
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
    //
    // DELIVERY MODEL: pump runs when a frame arrives on the
    // consumer's own connection (consume/ack/nack/qos/heartbeat…) —
    // pull-on-frame, not the push-anytime of a threaded broker. A
    // record published by ANOTHER connection while this consumer is
    // idle waits until the consumer's next frame (a heartbeat
    // suffices). This keeps one writer per connection with no timer
    // thread; [[AmqpClient.consumePush]] documents the client-side
    // consequence.
    // channels paused by channel.flow(active=false): deliveries gate
    // until flow(active=true); acks/nacks still process (the spec
    // stops CONTENT, not methods)
    val flowPaused = scala.collection.mutable.Set.empty[Int]
    def deliverOne(channel: Int, st: PushState, rec: BrokerRecord): Unit = {
      val redelivered = markDelivered(st.shard, rec.offset)
      sendMethod(channel, BasicDeliver) { w =>
        w.shortstr(st.tag).u64(rec.offset).u8(if (redelivered) 1 else 0)
        w.shortstr("").shortstr(st.queue)
      }
      writeFrame(out, Frame(FrameHeader, channel,
        contentHeader(rec.value.length.toLong, rec.headers)))
      writeFrame(out, Frame(FrameBody, channel, rec.value))
    }
    def pump(channel: Int): Unit = pushState.get(channel)
        .filterNot(_ => flowPaused(channel)).foreach { st =>
      // single-message requeues first: they sit below the cursor,
      // inside the already-counted unacked window, so the prefetch
      // check doesn't apply to them
      while (st.requeued.nonEmpty) {
        val off = st.requeued.head
        st.requeued.remove(off)
        val base = synchronized(shards(st.shard).base)
        if (off >= base)
          fetch(st.shard, off, 1).headOption.foreach(deliverOne(channel, st, _))
      }
      val pf = prefetch.getOrElse(channel, 0)
      var go = true
      while (go) {
        val (base, end) = synchronized { val q = shards(st.shard); (q.base, q.end) }
        if (st.cursor < base) st.cursor = base
        if (st.cursor >= end || (pf > 0 && st.cursor - base >= pf)) go = false
        else fetch(st.shard, st.cursor, 1).headOption match {
          case None => go = false
          case Some(rec) =>
            deliverOne(channel, st, rec)
            st.cursor = rec.offset + 1
        }
      }
    }
    // per-connection basic.get cursors: next offset to hand out per
    // shard; a fresh connection restarts at the ack floor (unacked
    // messages redeliver, the AMQP contract)
    val getCursor = scala.collection.mutable.Map.empty[Int, Long]
    // single-message requeues for pull consumers, per shard: served
    // (redelivered-flagged) by the next basic.get before the cursor
    val getRequeued = scala.collection.mutable.Map.empty[Int,
      scala.collection.mutable.TreeSet[Long]]
    // notification bookkeeping: what this connection last told its
    // peer about flow-control state / which cancel epoch it honored
    var sentBlocked: Option[String] = None
    var seenCancelEpoch = cancelEpoch

    // shared basic.nack / basic.reject semantics: the truncation floor
    // NEVER advances; `multiple` requeues every unacked delivery up to
    // and including the tag, the single form exactly the tagged one.
    // Redeliveries carry redelivered=1 via the shard's deliveredBelow
    // mark. A single-form tag outside the unacked window (never
    // delivered, or already acked away) is a protocol error, not a
    // silent no-op.
    def requeue(channel: Int, deliveryTag: Long, multiple: Boolean,
        doRequeue: Boolean): Unit = {
      val shard = consumerShard.getOrElse(channel,
        throw new java.io.IOException(
          s"basic.nack/reject on channel $channel with no prior consume/get"))
      if (doRequeue) {
        val floor = synchronized(shards(shard).base)
        def offsets(cursorExcl: Long): Seq[Long] =
          if (multiple) floor to math.min(deliveryTag, cursorExcl - 1)
          else if (deliveryTag >= floor && deliveryTag < cursorExcl) Seq(deliveryTag)
          else throw new java.io.IOException(
            s"basic.nack/reject of unknown delivery-tag $deliveryTag " +
              s"(unacked window [$floor, $cursorExcl))")
        pushState.get(channel) match {
          case Some(st) => st.requeued ++= offsets(st.cursor)
          case None =>
            val cur = math.max(getCursor.getOrElse(shard, floor), floor)
            getRequeued.getOrElseUpdate(shard,
              scala.collection.mutable.TreeSet.empty[Long]) ++= offsets(cur)
        }
        pump(channel)
      }
      // doRequeue=false would dead-letter in a full broker; with no
      // DLX the records simply stay below the unmoved floor for the
      // next consumer — either way the floor never advances
    }

    // queue names/routing keys are shard indices; anything else is a
    // protocol error, not a silent default to shard 0
    def shardOf(name: String, what: String): Int =
      name.toIntOption.filter(s => s >= 0 && s < shardCount).getOrElse(
        throw new java.io.IOException(
          s"$what '$name' is not a shard index [0, $shardCount)"))

    while (running) {
      val frame = readFrame(in)
      // surface async control-plane changes now that the frame-driven
      // loop has a write opportunity: flow-control notifications on
      // channel 0, broker-initiated consumer cancellation per channel.
      // (Delivery itself is also frame-driven — see the pump() note —
      // so piggybacking notifications on the same trigger keeps one
      // writer per connection, no timer thread.)
      val nowBlocked = blockedReason
      if (nowBlocked != sentBlocked) {
        nowBlocked match {
          case Some(reason) => sendMethod(0, ConnBlocked)(_.shortstr(reason))
          case None => sendMethod(0, ConnUnblocked)(_ => ())
        }
        sentBlocked = nowBlocked
      }
      val nowEpoch = cancelEpoch
      if (nowEpoch != seenCancelEpoch) {
        seenCancelEpoch = nowEpoch
        pushState.toList.foreach { case (ch, st) =>
          // nowait=1: the notification form — the client does not
          // reply, it resubscribes (or gives up), like the reference
          sendMethod(ch, BasicCancel)(w => w.shortstr(st.tag).u8(1))
          pushState.remove(ch)
        }
      }
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
            // a single-message requeue (reject / nack multiple=false)
            // outranks the cursor: serve the oldest one first, and
            // don't advance the cursor for it — it sits below
            val requeuedHit = getRequeued.get(shard)
              .flatMap(_.rangeFrom(lo).headOption)
            requeuedHit.foreach(off => getRequeued(shard).remove(off))
            val rec = requeuedHit match {
              case Some(off) => fetch(shard, off, 1).headOption
              case None =>
                val cursor = math.max(getCursor.getOrElse(shard, lo), lo)
                fetch(shard, cursor, 1).headOption
            }
            rec match {
              case None =>
                sendMethod(frame.channel, BasicGetEmpty)(_.shortstr(""))
              case Some(record) =>
                if (requeuedHit.isEmpty) getCursor(shard) = record.offset + 1
                consumerShard(frame.channel) = shard
                val redelivered = markDelivered(shard, record.offset)
                sendMethod(frame.channel, BasicGetOk) { w =>
                  w.u64(record.offset).u8(if (redelivered) 1 else 0)
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
            val deliveryTag = r.u64()
            val bits = r.u8() // bit0 multiple, bit1 requeue
            requeue(frame.channel, deliveryTag,
              multiple = (bits & 1) != 0, doRequeue = (bits & 2) != 0)

          case BasicReject =>
            // the 0-9-1 core single-message form (basic.nack is the
            // RabbitMQ multi extension): delivery-tag + requeue bit,
            // never cumulative
            val deliveryTag = r.u64()
            val doRequeue = r.u8() != 0
            requeue(frame.channel, deliveryTag,
              multiple = false, doRequeue = doRequeue)

          case BasicCancel =>
            // client-initiated unsubscribe: drop the push consumer and
            // confirm with cancel-ok (unless nowait); its unacked
            // deliveries stay below the unmoved floor and redeliver —
            // flagged — to the next consumer, matching the reference's
            // resubscribe-after-cancel flow (`amqp_data_consumer.ex:
            // 127-141`)
            val tag = r.shortstr()
            val nowait = r.u8() != 0
            pushState.remove(frame.channel)
            if (!nowait) sendMethod(frame.channel, BasicCancelOk)(_.shortstr(tag))

          case ChannelFlow =>
            // per-channel delivery gate: flow-ok echoes the state; a
            // reopened gate pumps whatever queued while paused
            val active = r.u8() != 0
            if (active) flowPaused.remove(frame.channel)
            else flowPaused.add(frame.channel)
            sendMethod(frame.channel, ChannelFlowOk)(
              _.u8(if (active) 1 else 0))
            if (active) pump(frame.channel)

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
        // still there without a timer thread on either side. Echo
        // first (the client reads it synchronously), then pump: a
        // heartbeat is also how an idle push consumer solicits records
        // published by other connections since its last frame (the
        // pull-on-frame delivery model — see pump's note).
        writeFrame(out, Frame(FrameHeartbeat, 0, Array.emptyByteArray))
        pushState.keys.toList.foreach(pump)
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
