package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.time.Instant
import scala.collection.immutable.ListMap
import scala.collection.mutable

/** BSON binary element: subtype + raw bytes. The reference's decoder
  * surfaces binaries as a `{subtype, bytes}` tuple and storage later
  * unwraps to the raw bytes (SURVEY §1.2 "BSON binary subtype tuple").
  */
final case class BsonBinary(subtype: Int, bytes: Array[Byte]) {
  override def equals(o: Any): Boolean = o match {
    case BsonBinary(s, b) => s == subtype && java.util.Arrays.equals(b, bytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * subtype + java.util.Arrays.hashCode(bytes)
}

/** Minimal BSON codec (the subset the Astarte wire format uses; see
  * bsonspec.org for the public format). Values decode to:
  * Double, String, Boolean, Int (int32), Long (int64),
  * java.time.Instant (UTC datetime), BsonBinary, null,
  * List[Any] (array), ListMap[String, Any] (document — insertion
  * order preserved, BSON documents are ordered).
  */
object Bson {

  /** Decode a full BSON document. Returns None on malformed input
    * (truncation, bad sizes, unknown element types).
    */
  def decode(bytes: Array[Byte]): Option[ListMap[String, Any]] =
    try {
      if (bytes.length < 5) None
      else {
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val doc = readDocument(buf)
        // top-level document must span the whole payload
        if (buf.position() != bytes.length)
          throw new IllegalArgumentException("trailing bytes after document")
        Some(doc)
      }
    } catch { case _: Exception => None }

  private def readDocument(buf: ByteBuffer): ListMap[String, Any] = {
    val size = buf.getInt()
    val end = buf.position() + size - 4
    if (size < 5 || end > buf.limit())
      throw new IllegalArgumentException("bad doc size")
    val out = mutable.LinkedHashMap.empty[String, Any]
    var tpe = buf.get()
    while (tpe != 0) {
      val name = readCString(buf)
      out(name) = readValue(tpe, buf)
      tpe = buf.get()
    }
    // declared size must agree with the parsed extent
    if (buf.position() != end)
      throw new IllegalArgumentException("document size mismatch")
    ListMap.from(out)
  }

  private def readArray(buf: ByteBuffer): List[Any] =
    readDocument(buf).values.toList

  private def readCString(buf: ByteBuffer): String = {
    val sb = new mutable.ArrayBuilder.ofByte
    var b = buf.get()
    while (b != 0) { sb += b; b = buf.get() }
    new String(sb.result(), StandardCharsets.UTF_8)
  }

  private def readValue(tpe: Byte, buf: ByteBuffer): Any = tpe match {
    case 0x01 => buf.getDouble()
    case 0x02 =>
      val len = buf.getInt()
      val arr = new Array[Byte](len - 1)
      buf.get(arr); buf.get() // trailing NUL
      new String(arr, StandardCharsets.UTF_8)
    case 0x03 => readDocument(buf)
    case 0x04 => readArray(buf)
    case 0x05 =>
      val len = buf.getInt()
      val subtype = buf.get() & 0xff
      val arr = new Array[Byte](len)
      buf.get(arr)
      BsonBinary(subtype, arr)
    case 0x08 => buf.get() != 0
    case 0x09 => Instant.ofEpochMilli(buf.getLong())
    case 0x0A => null
    case 0x10 => buf.getInt()
    case 0x11 => buf.getLong() // timestamp (internal) — surface as long
    case 0x12 => buf.getLong()
    case other => throw new IllegalArgumentException(s"unsupported bson type $other")
  }

  /** Encode a document from an ordered (key, value) sequence. Accepts
    * the same value universe `decode` produces.
    */
  def encode(fields: Seq[(String, Any)]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    fields.foreach { case (k, v) => writeElement(body, k, v) }
    val total = body.size() + 5
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(total)
    out.put(body.toByteArray)
    out.put(0.toByte)
    out.array()
  }

  def encode(doc: Map[String, Any]): Array[Byte] = encode(doc.toSeq)

  private def writeElement(out: java.io.ByteArrayOutputStream, name: String, v: Any): Unit = {
    def put(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def le32(i: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    def le64(l: Long): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array()
    def cstring(s: String): Array[Byte] = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      val r = new Array[Byte](b.length + 1)
      System.arraycopy(b, 0, r, 0, b.length)
      r
    }
    v match {
      case d: Double =>
        out.write(0x01); put(cstring(name))
        put(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array())
      case f: Float => writeElement(out, name, f.toDouble)
      case s: String =>
        out.write(0x02); put(cstring(name))
        val b = s.getBytes(StandardCharsets.UTF_8)
        put(le32(b.length + 1)); put(b); out.write(0)
      case m: collection.Map[_, _] =>
        out.write(0x03); put(cstring(name))
        put(encode(m.toSeq.map { case (k, vv) => (k.toString, vv: Any) }))
      case xs: Seq[_] =>
        out.write(0x04); put(cstring(name))
        put(encode(xs.zipWithIndex.map { case (x, i) => (i.toString, x: Any) }))
      case BsonBinary(subtype, bytes) =>
        out.write(0x05); put(cstring(name))
        put(le32(bytes.length)); out.write(subtype); put(bytes)
      case bytes: Array[Byte] =>
        writeElement(out, name, BsonBinary(0, bytes))
      case b: Boolean =>
        out.write(0x08); put(cstring(name)); out.write(if (b) 1 else 0)
      case i: Instant =>
        out.write(0x09); put(cstring(name)); put(le64(i.toEpochMilli))
      case null =>
        out.write(0x0A); put(cstring(name))
      case i: Int =>
        out.write(0x10); put(cstring(name)); put(le32(i))
      case l: Long =>
        out.write(0x12); put(cstring(name)); put(le64(l))
      case other =>
        throw new IllegalArgumentException(s"cannot bson-encode ${other.getClass}")
    }
  }
}
