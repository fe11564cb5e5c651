package graft.events

import java.nio.charset.StandardCharsets.UTF_8

/** Minimal protobuf wire-format writer/reader (varint + tag +
  * length-delimited, proto3 zero-default skipping) — enough to carry
  * the SimpleEvent family without a protobuf runtime (none ships in
  * this environment).
  */
object ProtoWire {

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()

    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    private def tag(field: Int, wireType: Int): Unit =
      varint((field.toLong << 3) | wireType)

    /** proto3 semantics: zero is the default and is not emitted. */
    def int64(field: Int, v: Long): Unit =
      if (v != 0L) { tag(field, 0); varint(v) }
    def int32(field: Int, v: Int): Unit = int64(field, v.toLong)
    def bytes(field: Int, v: Array[Byte]): Unit =
      if (v != null && v.nonEmpty) { tag(field, 2); varint(v.length.toLong); out.write(v) }
    def string(field: Int, v: String): Unit =
      if (v != null && v.nonEmpty) bytes(field, v.getBytes(UTF_8))
    def message(field: Int, body: Array[Byte]): Unit = {
      // submessages are emitted even when empty: the oneof presence
      // IS the event-type discriminator
      tag(field, 2); varint(body.length.toLong); out.write(body)
    }
    def result(): Array[Byte] = out.toByteArray
  }

  /** Parsed field multiset: varint fields and length-delimited fields
    * by number, in arrival order.
    */
  final case class Fields(
      varints: Map[Int, Seq[Long]], blobs: Map[Int, Seq[Array[Byte]]]) {
    def long(field: Int, default: Long = 0L): Long =
      varints.getOrElse(field, Nil).headOption.getOrElse(default)
    def int(field: Int): Int = long(field).toInt
    def blob(field: Int): Array[Byte] =
      blobs.getOrElse(field, Nil).headOption.orNull
    def str(field: Int): String =
      Option(blob(field)).map(new String(_, UTF_8)).getOrElse("")
    def messages(field: Int): Seq[Array[Byte]] = blobs.getOrElse(field, Nil)
  }

  def read(bytes: Array[Byte]): Fields = {
    var i = 0
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        // bounds-checked: a truncated varint (or one stretched past
        // 64 bits by a run of continuation bytes) is a protocol
        // error, not an index crash
        if (i >= bytes.length || shift > 63)
          throw new IllegalArgumentException(
            s"truncated or overlong varint at offset $i")
        b = bytes(i) & 0xff; i += 1; v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    val vs = scala.collection.mutable.Map.empty[Int, Vector[Long]]
    val bs = scala.collection.mutable.Map.empty[Int, Vector[Array[Byte]]]
    while (i < bytes.length) {
      val key = varint()
      val field = (key >>> 3).toInt
      (key & 7L).toInt match {
        case 0 => vs(field) = vs.getOrElse(field, Vector.empty) :+ varint()
        case 2 =>
          // validate the declared length as a LONG before narrowing:
          // a hostile 2^32+5 would .toInt-wrap to 5 and silently
          // re-frame the stream instead of being rejected
          val len64 = varint()
          if (len64 < 0L || len64 > (bytes.length - i).toLong)
            throw new IllegalArgumentException(
              s"length-delimited field $field overruns buffer ($len64 bytes at $i)")
          val len = len64.toInt
          // copyOfRange would silently zero-pad past the end — a
          // truncated blob must fail, not decode to corrupt values
          bs(field) = bs.getOrElse(field, Vector.empty) :+
            java.util.Arrays.copyOfRange(bytes, i, i + len)
          i += len
        case 1 => // fixed64: skip (unused by this schema)
          if (i + 8 > bytes.length)
            throw new IllegalArgumentException(s"truncated fixed64 at $i")
          i += 8
        case 5 => // fixed32: skip
          if (i + 4 > bytes.length)
            throw new IllegalArgumentException(s"truncated fixed32 at $i")
          i += 4
        case wt => throw new IllegalArgumentException(s"unsupported wire type $wt")
      }
    }
    Fields(vs.toMap, bs.toMap)
  }
}

/** SimpleEvent wire codec + AMQP routing metadata (S7/§2.1): the
  * reference serializes each fired event as an `astarte_core`
  * SimpleEvent protobuf and publishes it with the trigger target's
  * routing key and five `x_astarte_*` headers
  * (`triggers_handler.ex:377-459`). The envelope fields
  * (simple/parent trigger id, realm, device, timestamp, oneof event)
  * and the header list match that shape field-for-field; the concrete
  * field numbers are this library's stable numbering, documented
  * below (astarte_core's .proto is not part of the reference repo).
  *
  * SimpleEvent:
  *   1 simple_trigger_id (bytes, 16)   2 parent_trigger_id (bytes, 16)
  *   3 realm                            4 device_id
  *   5 timestamp (int64 epoch-ms)
  *   oneof event:
  *   6 device_connected{1 device_ip_address}
  *   7 device_disconnected{}
  *   8 incoming_data{1 interface, 2 path, 3 bson_value}
  *   9 value_change{1 interface, 2 path, 3 old_bson_value, 4 new_bson_value}
  *  10 value_change_applied{same as 9}
  *  11 path_created{1 interface, 2 path, 3 bson_value}
  *  12 path_removed{1 interface, 2 path}
  *  13 value_stored{1 interface, 2 path, 3 bson_value}
  *  14 incoming_introspection{1 introspection}
  *  15 interface_added{1 interface, 2 major_version, 3 minor_version}
  *  16 interface_removed{1 interface, 2 major_version}
  *  17 interface_minor_updated{1 interface, 2 major_version,
  *                             3 old_minor_version, 4 new_minor_version}
  *  18 device_error{1 error_name, 2 metadata (map<string,string>)}
  */
object SimpleEventCodec {
  import ProtoWire._

  def eventTypeName(e: SimpleEvent): String = e match {
    case _: DeviceConnected => "device_connected_event"
    case _: DeviceDisconnected => "device_disconnected_event"
    case _: IncomingData => "incoming_data_event"
    case _: ValueChange => "value_change_event"
    case _: ValueChangeApplied => "value_change_applied_event"
    case _: PathCreated => "path_created_event"
    case _: PathRemoved => "path_removed_event"
    case _: ValueStored => "value_stored_event"
    case _: IncomingIntrospection => "incoming_introspection_event"
    case _: InterfaceAdded => "interface_added_event"
    case _: InterfaceRemoved => "interface_removed_event"
    case _: InterfaceMinorUpdated => "interface_minor_updated_event"
    case _: DeviceError => "device_error_event"
  }

  private def sub(build: Writer => Unit): Array[Byte] = {
    val w = new Writer; build(w); w.result()
  }

  def encode(
      e: SimpleEvent,
      simpleTriggerId: Array[Byte],
      parentTriggerId: Array[Byte]): Array[Byte] = {
    val w = new Writer
    w.bytes(1, simpleTriggerId)
    w.bytes(2, parentTriggerId)
    w.string(3, e.realm)
    w.string(4, e.deviceId)
    w.int64(5, e.timestampMs)
    e match {
      case ev: DeviceConnected =>
        w.message(6, sub(_.string(1, ev.deviceIpAddress)))
      case _: DeviceDisconnected =>
        w.message(7, Array.emptyByteArray)
      case ev: IncomingData =>
        w.message(8, sub { s =>
          s.string(1, ev.interface); s.string(2, ev.path); s.bytes(3, ev.bsonValue) })
      case ev: ValueChange =>
        w.message(9, sub { s =>
          s.string(1, ev.interface); s.string(2, ev.path)
          s.bytes(3, ev.oldBsonValue); s.bytes(4, ev.newBsonValue) })
      case ev: ValueChangeApplied =>
        w.message(10, sub { s =>
          s.string(1, ev.interface); s.string(2, ev.path)
          s.bytes(3, ev.oldBsonValue); s.bytes(4, ev.newBsonValue) })
      case ev: PathCreated =>
        w.message(11, sub { s =>
          s.string(1, ev.interface); s.string(2, ev.path); s.bytes(3, ev.bsonValue) })
      case ev: PathRemoved =>
        w.message(12, sub { s => s.string(1, ev.interface); s.string(2, ev.path) })
      case ev: ValueStored =>
        w.message(13, sub { s =>
          s.string(1, ev.interface); s.string(2, ev.path); s.bytes(3, ev.bsonValue) })
      case ev: IncomingIntrospection =>
        w.message(14, sub(_.string(1, ev.introspection)))
      case ev: InterfaceAdded =>
        w.message(15, sub { s =>
          s.string(1, ev.interface); s.int32(2, ev.majorVersion); s.int32(3, ev.minorVersion) })
      case ev: InterfaceRemoved =>
        w.message(16, sub { s => s.string(1, ev.interface); s.int32(2, ev.majorVersion) })
      case ev: InterfaceMinorUpdated =>
        w.message(17, sub { s =>
          s.string(1, ev.interface); s.int32(2, ev.majorVersion)
          s.int32(3, ev.oldMinorVersion); s.int32(4, ev.newMinorVersion) })
      case ev: DeviceError =>
        w.message(18, sub { s =>
          s.string(1, ev.errorName)
          ev.metadata.toSeq.sortBy(_._1).foreach { case (k, v) =>
            s.message(2, sub { kv => kv.string(1, k); kv.string(2, v) })
          }
        })
    }
    w.result()
  }

  /** Decode back to the typed event. `target` is routing metadata, not
    * wire content (the reference carries it as the AMQP routing key).
    * Returns (simple_trigger_id, parent_trigger_id, event).
    */
  def decode(bytes: Array[Byte], target: String = ""): (Array[Byte], Array[Byte], SimpleEvent) = {
    val f = read(bytes)
    val realm = f.str(3); val dev = f.str(4); val ts = f.long(5)
    def ev(field: Int): Fields = read(f.blob(field))
    val e: SimpleEvent =
      if (f.blobs.contains(6)) DeviceConnected(realm, dev, target, ts, ev(6).str(1))
      else if (f.blobs.contains(7)) DeviceDisconnected(realm, dev, target, ts)
      else if (f.blobs.contains(8)) { val s = ev(8)
        IncomingData(realm, dev, target, ts, s.str(1), s.str(2), s.blob(3)) }
      else if (f.blobs.contains(9)) { val s = ev(9)
        ValueChange(realm, dev, target, ts, s.str(1), s.str(2), s.blob(3), s.blob(4)) }
      else if (f.blobs.contains(10)) { val s = ev(10)
        ValueChangeApplied(realm, dev, target, ts, s.str(1), s.str(2), s.blob(3), s.blob(4)) }
      else if (f.blobs.contains(11)) { val s = ev(11)
        PathCreated(realm, dev, target, ts, s.str(1), s.str(2), s.blob(3)) }
      else if (f.blobs.contains(12)) { val s = ev(12)
        PathRemoved(realm, dev, target, ts, s.str(1), s.str(2)) }
      else if (f.blobs.contains(13)) { val s = ev(13)
        ValueStored(realm, dev, target, ts, s.str(1), s.str(2), s.blob(3)) }
      else if (f.blobs.contains(14)) IncomingIntrospection(realm, dev, target, ts, ev(14).str(1))
      else if (f.blobs.contains(15)) { val s = ev(15)
        InterfaceAdded(realm, dev, target, ts, s.str(1), s.int(2), s.int(3)) }
      else if (f.blobs.contains(16)) { val s = ev(16)
        InterfaceRemoved(realm, dev, target, ts, s.str(1), s.int(2)) }
      else if (f.blobs.contains(17)) { val s = ev(17)
        InterfaceMinorUpdated(realm, dev, target, ts, s.str(1), s.int(2), s.int(3), s.int(4)) }
      else if (f.blobs.contains(18)) { val s = ev(18)
        DeviceError(realm, dev, target, ts, s.str(1),
          s.messages(2).map { kv => val m = read(kv); m.str(1) -> m.str(2) }.toMap) }
      else throw new IllegalArgumentException("no event oneof field set")
    (f.blob(1), f.blob(2), e)
  }

  /** The five routing headers of `triggers_handler.ex:446-453`, in the
    * reference's order; trigger ids render as canonical UUID strings.
    */
  def headers(
      e: SimpleEvent,
      simpleTriggerId: Array[Byte],
      parentTriggerId: Array[Byte]): Seq[(String, String)] = Seq(
    "x_astarte_realm" -> e.realm,
    "x_astarte_device_id" -> e.deviceId,
    "x_astarte_simple_trigger_id" -> uuidString(simpleTriggerId),
    "x_astarte_parent_trigger_id" -> uuidString(parentTriggerId),
    "x_astarte_event_type" -> eventTypeName(e))

  def uuidString(bytes16: Array[Byte]): String = {
    val bb = java.nio.ByteBuffer.wrap(bytes16)
    new java.util.UUID(bb.getLong, bb.getLong).toString
  }

  /** Deterministic 16-byte trigger-id stand-ins for sink rows: the
    * engine's EffectRow carries the matched target, not the trigger's
    * UUID; md5 of (target, event type) gives a stable id so replays
    * serialize byte-identically.
    */
  def triggerId(seed: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(seed.getBytes(UTF_8))

  /** Build the typed event from an EffectRow event output (the sink
    * side of S7). Unknown event types map to DeviceError, mirroring
    * the reference's catch-all error event.
    */
  def fromEffectRow(
      eventType: String, realm: String, deviceId: String, target: String,
      iface: String, major: Int, path: String, valueBson: Array[Byte],
      prevBson: Array[Byte], timestampMs: Long, detail: String): SimpleEvent =
    eventType match {
      case "device_connected" =>
        DeviceConnected(realm, deviceId, target, timestampMs,
          Option(detail).getOrElse(""))
      case "device_disconnected" =>
        DeviceDisconnected(realm, deviceId, target, timestampMs)
      case "incoming_data" =>
        IncomingData(realm, deviceId, target, timestampMs, iface, path, valueBson)
      case "value_change" =>
        ValueChange(realm, deviceId, target, timestampMs, iface, path, prevBson, valueBson)
      case "value_change_applied" =>
        ValueChangeApplied(realm, deviceId, target, timestampMs, iface, path, prevBson, valueBson)
      case "path_created" =>
        PathCreated(realm, deviceId, target, timestampMs, iface, path, valueBson)
      case "path_removed" =>
        PathRemoved(realm, deviceId, target, timestampMs, iface, path)
      case "value_stored" =>
        ValueStored(realm, deviceId, target, timestampMs, iface, path, valueBson)
      case "incoming_introspection" =>
        IncomingIntrospection(realm, deviceId, target, timestampMs,
          Option(detail).getOrElse(""))
      case "interface_added" =>
        InterfaceAdded(realm, deviceId, target, timestampMs, iface,
          major, Option(detail).flatMap(_.toIntOption).getOrElse(0))
      case "interface_removed" =>
        InterfaceRemoved(realm, deviceId, target, timestampMs, iface, major)
      case "interface_minor_updated" =>
        val (o, n) = Option(detail).map(_.split("->")) match {
          case Some(Array(a, b)) => (a.toIntOption.getOrElse(0), b.toIntOption.getOrElse(0))
          case _ => (0, 0)
        }
        InterfaceMinorUpdated(realm, deviceId, target, timestampMs, iface, major, o, n)
      case other =>
        DeviceError(realm, deviceId, target, timestampMs, other,
          Option(detail).map(d => Map("detail" -> d)).getOrElse(Map.empty))
    }
}
