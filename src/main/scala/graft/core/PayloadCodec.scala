package graft.core

import java.time.Instant
import java.util.Base64
import java.util.zip.{DataFormatException, Inflater}
import scala.collection.immutable.ListMap

/** Decoded Astarte data payload: value (null = unset), optional
  * explicit timestamp, optional metadata map.
  */
final case class DecodedPayload(
    value: Any,
    timestamp: Option[Instant],
    metadata: Option[Map[String, Any]])

/** Wire-format codecs for the ingestion path, re-expressed from the
  * reference's decoder semantics (SURVEY §1.3, §2.2 F1–F4, F10–F11;
  * reference `data_updater/payloads_decoder.ex`). Pure JVM code — used
  * from Spark either via UDF or inside the keyed state function.
  */
object PayloadCodec {

  /** Zip-bomb cap on uncompressed control payloads (reference
    * constant, `payloads_decoder.ex:22`).
    */
  val MaxUncompressedSize: Int = 10485760

  /** Decode the `{v, t, m}` BSON envelope.
    *
    * - empty payload → unset (value null)
    * - `{v: <0-byte binary>}` → unset (deprecated encoding)
    * - `{v, t?, m?}` → value + optional explicit timestamp + metadata
    * - legacy bare document (no `v` key) → whole doc as object value
    * - malformed BSON → None
    */
  def decodePayload(bytes: Array[Byte]): Option[DecodedPayload] = {
    if (bytes == null || bytes.isEmpty)
      return Some(DecodedPayload(null, None, None))
    Bson.decode(bytes).flatMap { doc =>
      doc.get("v") match {
        case Some(BsonBinary(_, b)) if b.isEmpty =>
          Some(DecodedPayload(null, None, None))
        case Some(v) =>
          val ts = doc.get("t").collect { case i: Instant => i }
          val meta = doc.get("m").collect {
            case m: collection.Map[_, _] =>
              m.toSeq.map { case (k, vv) => k.toString -> vv }.toMap[String, Any]
          }
          Some(DecodedPayload(unwrapBinaries(v), ts, meta))
        case None =>
          // Legacy object-aggregation payload: the document IS the
          // value — INCLUDING `{}` (the reference stores an all-NULL
          // object row for it, simple-flow payload4); unset is only
          // the empty payload / empty-binary forms above.
          Some(DecodedPayload(unwrapBinaries(doc), None, None))
      }
    }
  }

  /** Keep BsonBinary wrappers at the top level (the storage layer
    * unwraps them) but normalize nested structures recursively.
    */
  private def unwrapBinaries(v: Any): Any = v match {
    case m: ListMap[_, _] =>
      ListMap.from(m.toSeq.map { case (k, vv) => k.toString -> unwrapBinaries(vv) })
    case xs: List[_] => xs.map(unwrapBinaries)
    case other => other
  }

  /** Inflate zlib data with a hard cap on the uncompressed size
    * (zip-bomb guard, reference F2). Returns None if the cap is
    * exceeded or the stream is corrupt.
    */
  def safeInflate(bytes: Array[Byte], cap: Int = MaxUncompressedSize): Option[Array[Byte]] = {
    val inflater = new Inflater()
    try {
      inflater.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 16))
      val chunk = new Array[Byte](65536)
      while (!inflater.finished()) {
        val n = inflater.inflate(chunk)
        // n == 0 with the stream unfinished means no progress is
        // possible: truncated input (needsInput) or a preset-dictionary
        // header (needsDictionary) — both invalid here; bailing on
        // either also prevents an infinite loop on FDICT streams.
        // (A COMPLETE empty-content stream finishes with n == 0.)
        if (n == 0 && !inflater.finished()) return None
        out.write(chunk, 0, n)
        if (out.size() > cap) return None // bomb
      }
      Some(out.toByteArray)
    } catch {
      case _: DataFormatException => None
    } finally inflater.end()
  }

  private val IntrospectionEntryRe =
    "^([a-zA-Z][a-zA-Z0-9]*(?:\\.[a-zA-Z0-9][a-zA-Z0-9-]*)*):(\\d+):(\\d+)$".r

  /** Parse an introspection string `"a.b:1:0;c.d:2:1"` into entries;
    * any malformed entry fails the whole parse (reference F3).
    */
  def parseIntrospection(s: String): Option[List[IntrospectionEntry]] = {
    if (s.isEmpty) return Some(Nil)
    val parts = s.split(";", -1).toList
    val parsed = parts.map {
      case IntrospectionEntryRe(name, maj, min) =>
        try Some(IntrospectionEntry(name, maj.toInt, min.toInt))
        catch { case _: NumberFormatException => None }
      case _ => None
    }
    if (parsed.forall(_.isDefined)) Some(parsed.map(_.get)) else None
  }

  /** Parse a device-properties control payload: 4-byte big-endian
    * uncompressed size + zlib of `";"`-joined `"iface/path"` strings.
    * Only entries whose interface appears in `introspection` are kept
    * (reference F4).
    */
  def parseDeviceProperties(
      payload: Array[Byte],
      introspection: Set[String]): Option[Set[(String, String)]] = {
    if (payload.length < 4) return None
    val declared =
      ((payload(0) & 0xffL) << 24) | ((payload(1) & 0xffL) << 16) |
        ((payload(2) & 0xffL) << 8) | (payload(3) & 0xffL)
    if (declared > MaxUncompressedSize) return None
    safeInflate(payload.drop(4)).map { raw =>
      val text = new String(raw, java.nio.charset.StandardCharsets.UTF_8)
      text.split(";", -1).iterator
        .filter(_.nonEmpty)
        .flatMap { entry =>
          val slash = entry.indexOf('/')
          if (slash <= 0) None
          else {
            val iface = entry.substring(0, slash)
            val path = entry.substring(slash)
            if (introspection.contains(iface)) Some(iface -> path) else None
          }
        }
        .toSet
    }
  }

  /** Compress a `";"`-joined path list into the control wire form:
    * 4-byte big-endian uncompressed size + zlib body (reference F12).
    */
  def deflateProperties(text: String): Array[Byte] = {
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](65536)
    while (!deflater.finished()) out.write(chunk, 0, deflater.deflate(chunk))
    deflater.end()
    val header = Array[Byte](
      ((raw.length >> 24) & 0xff).toByte, ((raw.length >> 16) & 0xff).toByte,
      ((raw.length >> 8) & 0xff).toByte, (raw.length & 0xff).toByte)
    header ++ out.toByteArray
  }

  /** Device-ID codec: 128-bit id, base64url (no padding) on the wire,
    * 16 raw bytes in storage (reference F10).
    */
  def decodeDeviceId(encoded: String): Option[Array[Byte]] =
    try {
      val b = Base64.getUrlDecoder.decode(encoded)
      if (b.length == 16) Some(b) else None
    } catch { case _: IllegalArgumentException => None }

  def encodeDeviceId(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(bytes.take(16))

  /** Broker reception timestamps arrive in tenths of microseconds;
    * storage keeps ms + a submillis remainder (reference F11,
    * `impl.ex:335`, `queries.ex:147-148`).
    */
  def splitReceptionTimestamp(decimicros: Long): (Long, Int) =
    (decimicros / 10000, (decimicros % 10000).toInt)
}
