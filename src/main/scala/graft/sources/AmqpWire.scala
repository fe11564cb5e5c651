package graft.sources

import java.io.{DataInputStream, DataOutputStream}

/** Minimal AMQP 0-9-1 framing — the subset of the PUBLIC protocol
  * spec (amqp0-9-1, OASIS) the reference's front door actually
  * exercises (`amqp_data_consumer.ex:109-165`): connection
  * start/tune/open negotiation, channel.open, basic.publish with
  * header properties, basic.consume/deliver/ack. Frames are the
  * standard `type(1) channel(2) size(4) payload frame-end(0xCE)`
  * layout; methods are `class-id(2) method-id(2) args`.
  *
  * This is a wire codec only — [[MessageBroker]] serves the broker
  * side, [[AmqpClient]] the client side. Everything here is byte
  * arithmetic on the published spec; no broker library involved.
  */
object AmqpWire {

  val ProtocolHeader: Array[Byte] =
    Array[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1)

  val FrameMethod = 1
  val FrameHeader = 2
  val FrameBody = 3
  val FrameHeartbeat = 8
  val FrameEnd: Int = 0xCE

  // (classId, methodId) pairs used by the subset
  val ConnStart = (10, 10); val ConnStartOk = (10, 11)
  val ConnTune = (10, 30); val ConnTuneOk = (10, 31)
  val ConnOpen = (10, 40); val ConnOpenOk = (10, 41)
  val ConnClose = (10, 50); val ConnCloseOk = (10, 51)
  // connection.blocked/unblocked: the flow-control notification a
  // broker under resource pressure sends on channel 0 (RabbitMQ's
  // published capability extension to 0-9-1); asynchronous, so
  // clients must tolerate one arriving between any request and its
  // expected response
  val ConnBlocked = (10, 60); val ConnUnblocked = (10, 61)
  val ChannelOpen = (20, 10); val ChannelOpenOk = (20, 11)
  // channel.flow: the 0-9-1 core per-channel delivery gate (a peer
  // asks the other to stop/resume sending content). Modern brokers
  // prefer connection.blocked for broker→client back-pressure, but
  // the client→broker direction remains the spec's way to pause a
  // subscription without cancelling it.
  val ChannelFlow = (20, 20); val ChannelFlowOk = (20, 21)
  val ChannelClose = (20, 40); val ChannelCloseOk = (20, 41)
  val BasicQos = (60, 10); val BasicQosOk = (60, 11)
  val BasicConsume = (60, 20); val BasicConsumeOk = (60, 21)
  // basic.cancel travels both ways: client→broker to stop a
  // subscription (answered by cancel-ok), broker→client as the
  // consumer-cancelled notification the reference's consumer handles
  // by resubscribing (`amqp_data_consumer.ex:127-141`)
  val BasicCancel = (60, 30); val BasicCancelOk = (60, 31)
  val BasicPublish = (60, 40)
  val BasicDeliver = (60, 60)
  val BasicGet = (60, 70); val BasicGetOk = (60, 71)
  val BasicGetEmpty = (60, 72)
  val BasicAck = (60, 80)
  val BasicReject = (60, 90)
  val BasicNack = (60, 120)

  final case class Frame(frameType: Int, channel: Int, payload: Array[Byte])

  def writeFrame(out: DataOutputStream, f: Frame): Unit = {
    out.writeByte(f.frameType)
    out.writeShort(f.channel)
    out.writeInt(f.payload.length)
    out.write(f.payload)
    out.writeByte(FrameEnd)
    out.flush()
  }

  def readFrame(in: DataInputStream): Frame = {
    val t = in.readUnsignedByte()
    val ch = in.readUnsignedShort()
    val size = in.readInt()
    if (size < 0 || size > 64 * 1024 * 1024)
      throw new java.io.IOException(s"amqp frame size $size out of bounds")
    val payload = new Array[Byte](size)
    in.readFully(payload)
    if (in.readUnsignedByte() != FrameEnd)
      throw new java.io.IOException("amqp frame-end octet missing")
    Frame(t, ch, payload)
  }

  // --- payload builders ---------------------------------------------------

  final class Writer {
    private val bos = new java.io.ByteArrayOutputStream()
    private val out = new DataOutputStream(bos)
    def u8(v: Int): Writer = { out.writeByte(v); this }
    def u16(v: Int): Writer = { out.writeShort(v); this }
    def u32(v: Int): Writer = { out.writeInt(v); this }
    def u64(v: Long): Writer = { out.writeLong(v); this }
    def shortstr(s: String): Writer = {
      val b = s.getBytes("UTF-8")
      require(b.length < 256, "shortstr overflow")
      out.writeByte(b.length); out.write(b); this
    }
    def longstr(b: Array[Byte]): Writer = { out.writeInt(b.length); out.write(b); this }
    def bytes(b: Array[Byte]): Writer = { out.write(b); this }
    /** Field table with long-string ('S') values — the header-table
      * shape the x_astarte_* routing headers use.
      */
    def table(entries: Seq[(String, Array[Byte])]): Writer = {
      val w = new Writer
      entries.foreach { case (k, v) => w.shortstr(k).u8('S').longstr(v) }
      longstr(w.result())
    }
    def result(): Array[Byte] = { out.flush(); bos.toByteArray }
  }

  def method(classId: Int, methodId: Int)(args: Writer => Unit): Array[Byte] = {
    val w = new Writer
    w.u16(classId).u16(methodId)
    args(w)
    w.result()
  }

  final class Reader(payload: Array[Byte]) {
    private val in = new DataInputStream(new java.io.ByteArrayInputStream(payload))
    def u8(): Int = in.readUnsignedByte()
    def u16(): Int = in.readUnsignedShort()
    def u32(): Int = in.readInt()
    def u64(): Long = in.readLong()
    def shortstr(): String = {
      val n = in.readUnsignedByte()
      val b = new Array[Byte](n); in.readFully(b)
      new String(b, "UTF-8")
    }
    def longstr(): Array[Byte] = {
      val n = in.readInt()
      if (n < 0 || n > payload.length)
        throw new java.io.IOException("longstr size out of bounds")
      val b = new Array[Byte](n); in.readFully(b)
      b
    }
    def table(): Seq[(String, Array[Byte])] = {
      val body = longstr()
      val r = new Reader(body)
      val out = Seq.newBuilder[(String, Array[Byte])]
      var remaining = body.length
      while (remaining > 0) {
        val before = r.position
        val k = r.shortstr()
        val tpe = r.u8()
        val v = tpe match {
          case 'S' => r.longstr()
          case 't' => Array(r.u8().toByte)
          case 'I' => { val w = new Writer; w.u32(r.u32()); w.result() }
          case 'l' => { val w = new Writer; w.u64(r.u64()); w.result() }
          case other =>
            throw new java.io.IOException(s"unsupported field-table type $other")
        }
        out += k -> v
        remaining -= (r.position - before)
      }
      out.result()
    }
    def position: Int = payload.length - in.available()
  }

  /** Content HEADER frame payload for class `basic`: body size + the
    * property flags; only the `headers` property (bit 13) is used.
    */
  def contentHeader(bodySize: Long, headers: Seq[(String, Array[Byte])]): Array[Byte] = {
    val w = new Writer
    w.u16(60).u16(0) // class basic, weight 0
    w.u64(bodySize)
    if (headers.isEmpty) w.u16(0)
    else { w.u16(1 << 13); w.table(headers) }
    w.result()
  }

  def parseContentHeader(payload: Array[Byte]): (Long, Seq[(String, Array[Byte])]) = {
    val r = new Reader(payload)
    val classId = r.u16(); r.u16() // weight
    require(classId == 60, s"content header for unexpected class $classId")
    val size = r.u64()
    val flags = r.u16()
    val headers =
      if ((flags & (1 << 13)) != 0) r.table() else Nil
    (size, headers)
  }
}
