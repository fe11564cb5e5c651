package graft.analytics

/** REAL QOI ("Quite OK Image") decode and encode — lib-free like the
  * PNG/GIF/WebP-lossless family. QOI is a public single-pass format
  * (qoiformat.org): a 14-byte header then a byte-oriented op stream
  * over a running pixel, a 64-entry recently-seen index, and an
  * 8-byte end marker. Ops: RGB (0xFE), RGBA (0xFF), INDEX
  * (0b00xxxxxx), DIFF (0b01drdgdb, 2-bit deltas bias 2), LUMA
  * (0b10dddddd + drdg/dbdg nibbles, bias 32/8), RUN (0b11xxxxxx,
  * bias −1, 62/63 reserved for the RGB/RGBA tags). All byte deltas
  * wrap mod 256. The index hash is (3r + 5g + 7b + 11a) mod 64; the
  * index is updated after every decoded OP (run repeats don't
  * re-store — the value is already present), mirroring the reference
  * codec's behavior.
  *
  * Reference repo context: the reference treats binary payloads as
  * opaque BSON blobs at its decode boundary (`payloads_decoder.ex`);
  * this engine's multimodal layer decodes them for real, and QOI is
  * the cheapest real format to keep the encode+decode pair honest
  * end-to-end.
  */
object Qoi {

  /** Pixel-count cap: a crafted header must not demand gigabytes
    * (the GIF fuzz lesson — dimension bombs via declared sizes). */
  private val MaxPixels = 1L << 24

  def isQoi(b: Array[Byte]): Boolean =
    b.length >= 14 && b(0) == 'q' && b(1) == 'o' && b(2) == 'i' && b(3) == 'f'

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def hash(r: Int, g: Int, bl: Int, a: Int): Int =
    (r * 3 + g * 5 + bl * 7 + a * 11) % 64

  final case class Image(width: Int, height: Int,
      rgba: Array[Int]) // packed 0xAARRGGBB per pixel

  /** Strict decode: any spec violation — bad magic, zero or bomb
    * dimensions, truncated op stream, a run overshooting the pixel
    * count, or a wrong end marker — throws IllegalArgumentException
    * (the rejection contract the fuzz arm pins). */
  def decodeStrict(b: Array[Byte]): Image = {
    def bad(msg: String): Nothing = throw new IllegalArgumentException(msg)
    if (!isQoi(b)) bad("not a qoif stream")
    val w = be32(b, 4); val h = be32(b, 8)
    val channels = b(12) & 0xff; val colorspace = b(13) & 0xff
    if (w <= 0 || h <= 0) bad(s"bad dimensions ${w}x$h")
    if (w * h > MaxPixels) bad(s"dimension bomb ${w}x$h")
    if (channels != 3 && channels != 4) bad(s"bad channels $channels")
    if (colorspace > 1) bad(s"bad colorspace $colorspace")
    val n = (w * h).toInt
    val out = new Array[Int](n)
    val index = new Array[Int](64) // packed, zero-init = transparent black
    var r = 0; var g = 0; var bl = 0; var a = 255
    var p = 14; var i = 0
    def need(k: Int): Unit =
      if (p + k > b.length - 8) bad("truncated op stream")
    while (i < n) {
      need(1)
      val tag = b(p) & 0xff; p += 1
      var emit = 1
      if (tag == 0xfe) { // RGB
        need(3)
        r = b(p) & 0xff; g = b(p + 1) & 0xff; bl = b(p + 2) & 0xff; p += 3
      } else if (tag == 0xff) { // RGBA
        need(4)
        r = b(p) & 0xff; g = b(p + 1) & 0xff
        bl = b(p + 2) & 0xff; a = b(p + 3) & 0xff; p += 4
      } else (tag >> 6) match {
        case 0 => // INDEX
          val v = index(tag & 63)
          a = (v >>> 24) & 0xff; r = (v >>> 16) & 0xff
          g = (v >>> 8) & 0xff; bl = v & 0xff
        case 1 => // DIFF
          r = (r + ((tag >> 4) & 3) - 2) & 0xff
          g = (g + ((tag >> 2) & 3) - 2) & 0xff
          bl = (bl + (tag & 3) - 2) & 0xff
        case 2 => // LUMA
          need(1)
          val dg = (tag & 63) - 32
          val nb = b(p) & 0xff; p += 1
          r = (r + dg + ((nb >> 4) & 15) - 8) & 0xff
          g = (g + dg) & 0xff
          bl = (bl + dg + (nb & 15) - 8) & 0xff
        case _ => // RUN
          emit = (tag & 63) + 1
          if (i + emit > n) bad("run past pixel count")
      }
      if ((tag >> 6) != 3 || tag == 0xfe || tag == 0xff)
        index(hash(r, g, bl, a)) = (a << 24) | (r << 16) | (g << 8) | bl
      val px = (a << 24) | (r << 16) | (g << 8) | bl
      var k = 0
      while (k < emit) { out(i) = px; i += 1; k += 1 }
    }
    if (p + 8 != b.length) bad("trailing bytes after pixel stream")
    var z = 0
    while (z < 7) { if (b(p + z) != 0) bad("bad end marker"); z += 1 }
    if (b(p + 7) != 1) bad("bad end marker")
    Image(w.toInt, h.toInt, out)
  }

  /** Average Rec.601 luma ×1000 of a decoded image (alpha ignored —
    * the family-wide convention). */
  def lumaMilliOf(img: Image): Long = {
    var sum = 0L; var i = 0
    while (i < img.rgba.length) {
      val v = img.rgba(i)
      sum += 299L * ((v >>> 16) & 0xff) + 587L * ((v >>> 8) & 0xff) +
        114L * (v & 0xff)
      i += 1
    }
    if (img.rgba.length == 0) -1L else sum / img.rgba.length
  }

  /** Greedy reference-shape encoder over packed 0xAARRGGBB pixels:
    * run detection first, then index hit, then DIFF/LUMA when alpha
    * is unchanged, else RGB/RGBA. Returns the stream plus per-op
    * counts so specs can pin that a given input really exercises the
    * op families it was designed to. */
  private[analytics] def encodeWithStats(w: Int, h: Int,
      rgba: Array[Int], channels: Int = 3):
      (Array[Byte], Map[String, Int]) = {
    require(rgba.length == w * h, "pixel count mismatch")
    val out = new java.io.ByteArrayOutputStream()
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be(w); be(h); out.write(channels); out.write(0)
    val index = new Array[Int](64)
    var prev = 0xff000000 // a=255, r=g=b=0
    var run = 0
    var stats = Map("run" -> 0, "index" -> 0, "diff" -> 0,
      "luma" -> 0, "rgb" -> 0, "rgba" -> 0)
    def bump(k: String): Unit = stats = stats.updated(k, stats(k) + 1)
    def flushRun(): Unit = if (run > 0) {
      out.write(0xc0 | (run - 1)); bump("run"); run = 0
    }
    var i = 0
    while (i < rgba.length) {
      val px = rgba(i)
      if (px == prev) {
        run += 1
        if (run == 62) flushRun()
      } else {
        flushRun()
        val a = (px >>> 24) & 0xff; val r = (px >>> 16) & 0xff
        val g = (px >>> 8) & 0xff; val bl = px & 0xff
        val hpos = hash(r, g, bl, a)
        if (index(hpos) == px) { out.write(hpos); bump("index") }
        else {
          index(hpos) = px
          val pa = (prev >>> 24) & 0xff
          if (a == pa) {
            // wrapped signed byte deltas
            def d(x: Int, y: Int): Int = (((x - y) & 0xff) ^ 0x80) - 0x80
            val dr = d(r, (prev >>> 16) & 0xff)
            val dg = d(g, (prev >>> 8) & 0xff)
            val db = d(bl, prev & 0xff)
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
                db >= -2 && db <= 1) {
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
              bump("diff")
            } else if (dg >= -32 && dg <= 31 && dr - dg >= -8 &&
                dr - dg <= 7 && db - dg >= -8 && db - dg <= 7) {
              out.write(0x80 | (dg + 32))
              out.write(((dr - dg + 8) << 4) | (db - dg + 8))
              bump("luma")
            } else {
              out.write(0xfe); out.write(r); out.write(g); out.write(bl)
              bump("rgb")
            }
          } else {
            out.write(0xff); out.write(r); out.write(g)
            out.write(bl); out.write(a)
            bump("rgba")
          }
        }
      }
      prev = px
      i += 1
    }
    flushRun()
    var z = 0
    while (z < 7) { out.write(0); z += 1 }
    out.write(1)
    (out.toByteArray, stats)
  }

  object Builder {
    /** Greyscale image: pixel v → RGB (v, v, v), alpha 255. */
    def grey8(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] =
      encodeWithStats(w, h, pixels.map { p =>
        val v = p & 0xff
        0xff000000 | (v << 16) | (v << 8) | v
      })._1
  }

  /** Plug-in for [[Multimodal.FormatAwareCodec]]. */
  final class QoiCodec extends Multimodal.MediaCodec {
    override def decodeBatch(batch: Seq[Multimodal.MediaRow]):
        Seq[Multimodal.MediaFeatures] =
      batch.map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(r.content)
        val img = decodeStrict(r.content)
        Multimodal.MediaFeatures(r.mediaId, r.mediaType,
          r.content.length.toLong, md.map("%02x".format(_)).mkString,
          width = img.width, height = img.height, durationMs = 0L,
          batchSize = batch.size, avgLumaMilli = lumaMilliOf(img))
      }
  }
}
