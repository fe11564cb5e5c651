package graft.analytics

import graft.analytics.Multimodal.{MediaCodec, MediaFeatures, MediaRow}

/** Lib-free WebP-lossless (VP8L) decode — the last mainstream still
  * image format decodable without a codec library, completing the
  * BMP/PNG/JPEG/GIF family in [[Multimodal]]. Reference behavior:
  * the same opaque-binary media contract as the rest of the family
  * (astarte treats payloads as opaque blobs at its decode boundary,
  * `payloads_decoder.ex:29-62`); the bitstream layout follows the
  * public VP8L specification (RFC 9649).
  *
  * Decoder coverage: RIFF/VP8X chunk walk; LSB-first bit stream;
  * simple (1–2 symbol) and normal (code-length-coded) prefix codes
  * with the canonical-code construction and the complete-when-space-
  * exhausted early stop; meta prefix groups; color cache; LZ77
  * backward references (plain distances and the 120-entry
  * neighborhood distance map); and all four inverse transforms —
  * predictor (14 modes), color transform, subtract-green, and
  * color-indexing with pixel bundling. Bounded like the GIF path: a
  * declared dimension product over `MaxPixels` is refused before any
  * allocation (the decompression-bomb guard the reference applies to
  * zlib at `payloads_decoder.ex:22`).
  *
  * [[WebpBuilder]] emits real VP8L streams for the oracle-checked
  * queries: subtract-green transform, a normal (code-length-coded)
  * green tree, simple-coded channel trees, and optionally LZ77 runs
  * with prefix-coded lengths and plain distances — so the tested
  * path exercises both prefix-code kinds, the transform chain, and
  * the backward-reference loop.
  */
object Webp {

  /** Same hard pixel cap as the GIF path: 2^26 px ≈ 256 MiB of ARGB. */
  val MaxPixels: Long = 1L << 26

  def isWebp(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'

  final case class Decoded(width: Int, height: Int, argb: Array[Int])

  /** Locate the VP8L chunk inside the RIFF container (directly or
    * behind a VP8X extended header) and decode it. None on anything
    * malformed — callers stub, they don't crash.
    */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    try decodeStrict(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  /** The decode path WITHOUT the blanket catch: malformed input is
    * rejected via None or IllegalArgumentException only. The fuzz
    * soak drives this entry so any OTHER throw (index/arithmetic/
    * allocation) surfaces as a finding instead of vanishing into the
    * dispatcher's stub fallback.
    */
  private[graft] def decodeStrict(bytes: Array[Byte]): Option[Decoded] = {
    if (!isWebp(bytes)) return None
    var off = 12
    while (off + 8 <= bytes.length) {
      val tag = new String(bytes, off, 4, "ISO-8859-1")
      val size = le32(bytes, off + 4)
      // bounds math in Long: a declared size near 2^31 would wrap
      // `off + 8 + size` negative in Int and bypass this check (the
      // Wav decoder's discipline)
      if (size < 0 || off + 8L + size > bytes.length) return None
      if (tag == "VP8L")
        return decodeVp8l(java.util.Arrays.copyOfRange(
          bytes, off + 8, off + 8 + size))
      // chunks are 2-byte aligned
      off += 8 + size + (size & 1)
    }
    None
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  // ---------------------------------------------------------------- bits

  /** LSB-first bit reader (VP8L reads bits from each byte low bit
    * first, like DEFLATE).
    */
  private[analytics] final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def readBit(): Int = {
      val i = pos >>> 3
      if (i >= b.length)
        throw new IllegalArgumentException("truncated VP8L stream")
      val bit = (b(i) >> (pos & 7)) & 1
      pos += 1
      bit
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  /** Prefix-code decoder. Codes are canonical (deflate-style,
    * assigned in (length, symbol) order) and read MSB-first bit by
    * bit; a code whose only used symbol is unique decodes with ZERO
    * bits (the spec's single-symbol special case, which is also how
    * 1-symbol simple codes behave).
    */
  private[analytics] final class Prefix private (
      table: java.util.HashMap[Integer, Integer], val zeroBitSym: Int) {
    def decode(br: BitReader): Int = {
      if (zeroBitSym >= 0) return zeroBitSym
      var code = 0; var len = 0
      while (len < 16) {
        code = (code << 1) | br.readBit(); len += 1
        val s = table.get(Integer.valueOf((len << 16) | code))
        if (s != null) return s.intValue()
      }
      throw new IllegalArgumentException("invalid prefix code")
    }
  }

  private[analytics] object Prefix {
    /** Canonical construction from per-symbol code lengths (0 =
      * unused). Shared — via the same algorithm — with the builder,
      * so encode and decode can never disagree on code assignment.
      */
    def canonicalCodes(lengths: Array[Int]): Array[(Int, Int, Int)] = {
      val counts = new Array[Int](16)
      lengths.foreach { l =>
        if (l < 0 || l > 15) throw new IllegalArgumentException(s"code length $l")
        if (l > 0) counts(l) += 1
      }
      val next = new Array[Int](16)
      var code = 0
      for (l <- 1 to 15) { code = (code + counts(l - 1)) << 1; next(l) = code }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      for (sym <- lengths.indices; l = lengths(sym) if l > 0) {
        out += ((sym, next(l), l)); next(l) += 1
      }
      out.toSeq.toArray
    }

    def fromLengths(lengths: Array[Int]): Prefix = {
      val nonzero = lengths.count(_ > 0)
      if (nonzero == 0)
        throw new IllegalArgumentException("empty prefix code")
      if (nonzero == 1)
        return new Prefix(new java.util.HashMap, lengths.indexWhere(_ > 0))
      val t = new java.util.HashMap[Integer, Integer]
      canonicalCodes(lengths).foreach { case (sym, code, len) =>
        t.put(Integer.valueOf((len << 16) | code), Integer.valueOf(sym))
      }
      new Prefix(t, -1)
    }

    /** Simple codes assign codes in the order the symbols are READ
      * (first symbol → 0), not in canonical symbol order.
      */
    def simple(symbols: Array[Int]): Prefix =
      if (symbols.length == 1) new Prefix(new java.util.HashMap, symbols(0))
      else {
        val t = new java.util.HashMap[Integer, Integer]
        t.put(Integer.valueOf((1 << 16) | 0), Integer.valueOf(symbols(0)))
        t.put(Integer.valueOf((1 << 16) | 1), Integer.valueOf(symbols(1)))
        new Prefix(t, -1)
      }
  }

  // ------------------------------------------------------------- decoder

  /** Order in which the 19 code-length-code lengths arrive. */
  private[analytics] val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  private def readPrefixCode(br: BitReader, alphabetSize: Int): Prefix = {
    if (br.readBits(1) == 1) { // simple
      val numSymbols = br.readBits(1) + 1
      val firstLen = if (br.readBits(1) == 1) 8 else 1
      val s0 = br.readBits(firstLen)
      val syms =
        if (numSymbols == 2) Array(s0, br.readBits(8)) else Array(s0)
      if (syms.exists(s => s < 0 || s >= alphabetSize))
        throw new IllegalArgumentException("simple-code symbol out of range")
      Prefix.simple(syms)
    } else {
      val numCl = 4 + br.readBits(4)
      if (numCl > 19)
        throw new IllegalArgumentException(s"$numCl code-length codes")
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = br.readBits(3); i += 1 }
      val cl = Prefix.fromLengths(clLengths)
      val lengths = new Array[Int](alphabetSize)
      // optional bound on how many length entries are present
      val maxSymbol =
        if (br.readBits(1) == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          2 + br.readBits(nbits)
        } else alphabetSize
      var symbol = 0
      var prev = 8
      var space = 1 << 15 // Kraft space; exhausting it ends the lengths
      var read = 0
      while (symbol < alphabetSize && space > 0) {
        if (read >= maxSymbol) { symbol = alphabetSize }
        else {
          read += 1
          val code = cl.decode(br)
          if (code < 16) {
            lengths(symbol) = code; symbol += 1
            if (code != 0) { prev = code; space -= (1 << 15) >> code }
          } else {
            val (repeat, len) = code match {
              case 16 => (3 + br.readBits(2), prev)
              case 17 => (3 + br.readBits(3), 0)
              case 18 => (11 + br.readBits(7), 0)
              case c => throw new IllegalArgumentException(s"cl code $c")
            }
            if (symbol + repeat > alphabetSize)
              throw new IllegalArgumentException("code-length repeat overflow")
            var r = 0
            while (r < repeat) { lengths(symbol) = len; symbol += 1; r += 1 }
            if (len != 0) space -= repeat * ((1 << 15) >> len)
          }
        }
      }
      if (space < 0)
        throw new IllegalArgumentException("over-subscribed prefix code")
      Prefix.fromLengths(lengths)
    }
  }

  /** The LZ77 length/distance prefix-value decode: 4 direct values,
    * then (extra-bits, offset) ranges.
    */
  private def prefixValue(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.readBits(extra) + 1
    }

  /** The 120 closest backward-reference neighbors, ordered by squared
    * distance, then larger dy first, then positive dx before
    * negative: (0,1),(1,0),(1,1),(-1,1),(0,2),(2,0),… — the spec's
    * neighborhood map (dy 0..7; dx −7..8, strictly positive when
    * dy = 0 — exactly 120 candidates, so the sort is a total order
    * over the whole set, not a truncation).
    */
  private[analytics] val DistanceMap: Array[(Int, Int)] = {
    val cands = (for {
      dy <- 0 to 7
      dx <- -7 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)).toArray
    val m = cands
      .sortBy { case (dx, dy) => (dx * dx + dy * dy, -dy, -dx) }
    assert(m.length == 120, s"distance map ${m.length}")
    m
  }

  private def planeDistance(code: Int, width: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistanceMap(code - 1)
      math.max(1, dy * width + dx)
    }

  private final class Groups(
      prefixes: Array[Array[Prefix]],
      meta: Array[Int], metaW: Int, bits: Int) {
    def forPixel(x: Int, y: Int): Array[Prefix] =
      if (meta == null) prefixes(0)
      else prefixes(meta((y >> bits) * metaW + (x >> bits)))
  }

  /** One image stream: optional color cache + prefix groups + LZ77
    * pixel loop. `isRoot` gates transform parsing and meta groups
    * (auxiliary images have neither). Returns raw ARGB BEFORE
    * inverse transforms.
    */
  private def decodeImageStream(br: BitReader, width: Int, height: Int,
      isRoot: Boolean): Array[Int] = {
    if (width.toLong * height > MaxPixels || width <= 0 || height <= 0)
      throw new IllegalArgumentException(s"refusing ${width}x$height image")

    var transforms = List.empty[Transform]
    var xsize = width
    if (isRoot) {
      var seen = Set.empty[Int]
      while (br.readBits(1) == 1) {
        val t = br.readBits(2)
        if (seen(t))
          throw new IllegalArgumentException(s"transform $t repeated")
        seen += t
        val tr = t match {
          case 0 | 1 =>
            val bits = br.readBits(3) + 2
            val bw = subSize(xsize, bits); val bh = subSize(height, bits)
            val img = decodeImageStream(br, bw, bh, isRoot = false)
            if (t == 0) PredictorT(bits, bw, img) else ColorT(bits, bw, img)
          case 2 => SubtractGreenT
          case 3 =>
            val n = br.readBits(8) + 1
            val raw = decodeImageStream(br, n, 1, isRoot = false)
            // palette entries arrive delta-coded per channel
            val pal = new Array[Int](n)
            var prev = 0
            var i = 0
            while (i < n) {
              val p = addPixels(prev, raw(i)); pal(i) = p; prev = p; i += 1
            }
            val widthBits =
              if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
            val packed = subSize(width, widthBits)
            val tr = IndexT(widthBits, width, pal)
            xsize = packed
            tr
        }
        transforms = tr :: transforms // reverse order = inverse order
      }
    }

    val cacheBits = if (br.readBits(1) == 1) br.readBits(4) else 0
    if (cacheBits > 11)
      throw new IllegalArgumentException(s"color cache bits $cacheBits")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null

    val groups: Groups =
      if (isRoot && br.readBits(1) == 1) {
        val bits = br.readBits(3) + 2
        val mw = subSize(xsize, bits); val mh = subSize(height, bits)
        val img = decodeImageStream(br, mw, mh, isRoot = false)
        val idx = img.map(p => ((p >> 8) & 0xffff))
        val n = idx.max + 1
        if (n > 1024)
          throw new IllegalArgumentException(s"$n prefix groups")
        new Groups(readGroupArray(br, n, cacheSize), idx, mw, bits)
      } else new Groups(readGroupArray(br, 1, cacheSize), null, 0, 0)

    val n = xsize * height
    val out = new Array[Int](n)
    var pos = 0
    while (pos < n) {
      val x = pos % xsize; val y = pos / xsize
      val g = groups.forPixel(x, y)
      val s = g(0).decode(br)
      if (s < 256) {
        val red = g(1).decode(br)
        val blue = g(2).decode(br)
        val alpha = g(3).decode(br)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = px
        if (cache != null) cache(cacheIndex(px, cacheBits)) = px
        pos += 1
      } else if (s < 256 + 24) {
        val length = prefixValue(s - 256, br)
        val dCode = prefixValue(g(4).decode(br), br)
        val dist = planeDistance(dCode, xsize)
        if (dist <= 0 || dist > pos || length > n - pos)
          throw new IllegalArgumentException("backward reference overflow")
        var k = 0
        while (k < length) {
          val px = out(pos - dist)
          out(pos) = px
          if (cache != null) cache(cacheIndex(px, cacheBits)) = px
          pos += 1; k += 1
        }
      } else {
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize)
          throw new IllegalArgumentException("color cache miss-indexed")
        out(pos) = cache(idx)
        pos += 1
      }
    }

    // inverse transforms, newest-first (reverse of stream order)
    var img = out
    var w = xsize
    transforms.foreach { tr =>
      img = tr.inverse(img, w, height)
      w = tr.outWidth(w)
    }
    img
  }

  private def readGroupArray(br: BitReader, n: Int,
      cacheSize: Int): Array[Array[Prefix]] = {
    val alphabets = Array(256 + 24 + cacheSize, 256, 256, 256, 40)
    Array.fill(n)(alphabets.map(a => readPrefixCode(br, a)))
  }

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  private def cacheIndex(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  private def addPixels(a: Int, b: Int): Int = {
    val al = (((a >>> 24) + (b >>> 24)) & 0xff) << 24
    val r = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16
    val g = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8
    val bl = (((a & 0xff) + (b & 0xff)) & 0xff)
    al | r | g | bl
  }

  // ---------------------------------------------------- inverse transforms

  private sealed trait Transform {
    def inverse(img: Array[Int], w: Int, h: Int): Array[Int]
    def outWidth(w: Int): Int = w
  }

  private case object SubtractGreenT extends Transform {
    def inverse(img: Array[Int], w: Int, h: Int): Array[Int] = {
      var i = 0
      while (i < img.length) {
        val p = img(i)
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) + g) & 0xff
        val b = ((p & 0xff) + g) & 0xff
        img(i) = (p & 0xff000000) | (r << 16) | (g << 8) | b
        i += 1
      }
      img
    }
  }

  private final case class ColorT(bits: Int, blockW: Int,
      elems: Array[Int]) extends Transform {
    private def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
    def inverse(img: Array[Int], w: Int, h: Int): Array[Int] = {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val e = elems((y >> bits) * blockW + (x >> bits))
          val g2r = e & 0xff          // blue channel of the element
          val g2b = (e >> 8) & 0xff   // green channel
          val r2b = (e >> 16) & 0xff  // red channel
          val p = img(y * w + x)
          val g = (p >> 8) & 0xff
          var r = (p >> 16) & 0xff
          var b = p & 0xff
          r = (r + delta(g2r, g)) & 0xff
          b = (b + delta(g2b, g)) & 0xff
          b = (b + delta(r2b, r)) & 0xff
          img(y * w + x) = (p & 0xff000000) | (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      img
    }
  }

  private final case class IndexT(widthBits: Int, fullWidth: Int,
      palette: Array[Int]) extends Transform {
    override def outWidth(w: Int): Int = fullWidth
    def inverse(img: Array[Int], w: Int, h: Int): Array[Int] = {
      val out = new Array[Int](fullWidth * h)
      val perPacked = 1 << widthBits
      val bpp = 8 >> widthBits
      val mask = (1 << bpp) - 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < fullWidth) {
          val packed = img(y * w + (x >> widthBits))
          val green = (packed >> 8) & 0xff
          val shift = (x & (perPacked - 1)) * bpp
          val idx = (green >> shift) & mask
          out(y * fullWidth + x) =
            if (idx < palette.length) palette(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Per-pixel prediction over an ARGB buffer — SHARED by the
    * inverse transform and the builder's forward residual pass (the
    * Prefix.canonicalCodes discipline: one definition, the two sides
    * cannot drift). `img` must hold reconstructed pixels for every
    * position before (y*w + x).
    */
  private[analytics] def predictAt(img: Array[Int], w: Int,
      x: Int, y: Int, mode: Int): Int = {
    def avg2(a: Int, b: Int): Int = {
      val al = (((a >>> 24) + (b >>> 24)) / 2) << 24
      val r = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) / 2) << 16
      val g = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) / 2) << 8
      val bl = (((a & 0xff) + (b & 0xff)) / 2)
      al | r | g | bl
    }
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    def casFull(a: Int, b: Int, c: Int): Int = {
      def ch(s: Int): Int =
        clamp(((a >> s) & 0xff) + ((b >> s) & 0xff) - ((c >> s) & 0xff))
      (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
    }
    def casHalf(ave: Int, c: Int): Int = {
      def ch(s: Int): Int = {
        val a = (ave >> s) & 0xff
        clamp(a + (a - ((c >> s) & 0xff)) / 2)
      }
      (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
    }
    def select(l: Int, t: Int, tl: Int): Int = {
      def ch(p: Int, s: Int): Int = (p >> s) & 0xff
      var pl = 0; var pt = 0
      var s = 0
      while (s < 32) {
        val pred = ch(l, s) + ch(t, s) - ch(tl, s)
        pl += math.abs(pred - ch(l, s)); pt += math.abs(pred - ch(t, s))
        s += 8
      }
      // the spec's rule is `if (pL < pT) L else T` — TOP wins ties
      if (pl < pt) l else t
    }
    val i = y * w + x
    if (x == 0 && y == 0) 0xff000000
    else if (y == 0) img(i - 1)
    else if (x == 0) img(i - w)
    else {
      val l = img(i - 1); val t = img(i - w)
      val tl = img(i - w - 1)
      // at the rightmost column the spec's top-right wraps to the
      // CURRENT row's leftmost pixel — which in this contiguous
      // buffer is literally img(i - w + 1), so no special case
      // (matching libwebp's top[1] read)
      val tr = img(i - w + 1)
      mode match {
        case 0 => 0xff000000
        case 1 => l
        case 2 => t
        case 3 => tr
        case 4 => tl
        case 5 => avg2(avg2(l, tr), t)
        case 6 => avg2(l, tl)
        case 7 => avg2(l, t)
        case 8 => avg2(tl, t)
        case 9 => avg2(t, tr)
        case 10 => avg2(avg2(l, tl), avg2(t, tr))
        case 11 => select(l, t, tl)
        case 12 => casFull(l, t, tl)
        case 13 => casHalf(avg2(l, t), tl)
        case m => throw new IllegalArgumentException(s"predictor mode $m")
      }
    }
  }

  private final case class PredictorT(bits: Int, blockW: Int,
      modes: Array[Int]) extends Transform {
    def inverse(img: Array[Int], w: Int, h: Int): Array[Int] = {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          val mode = (modes((y >> bits) * blockW + (x >> bits)) >> 8) & 0xff
          img(i) = addPixels(predictAt(img, w, x, y, mode), img(i))
          x += 1
        }
        y += 1
      }
      img
    }
  }

  private def decodeVp8l(payload: Array[Byte]): Option[Decoded] = {
    if (payload.length < 5 || (payload(0) & 0xff) != 0x2f) return None
    val br = new BitReader(java.util.Arrays.copyOfRange(
      payload, 1, payload.length))
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    br.readBits(1) // alpha hint
    if (br.readBits(3) != 0) return None // version must be 0
    Some(Decoded(w, h, decodeImageStream(br, w, h, isRoot = true)))
  }

  // --------------------------------------------------------------- codec

  /** Rec.601 luma ×1000 of decoded ARGB, matching the family's
    * integer convention (sum of per-pixel 299r+587g+114b over n).
    */
  def lumaMilliOf(d: Decoded): Long = {
    if (d.argb.isEmpty) return -1L
    var sum = 0L; var i = 0
    while (i < d.argb.length) {
      val p = d.argb(i)
      sum += 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
        114L * (p & 0xff)
      i += 1
    }
    sum / d.argb.length
  }

  /** Test-vector builder: real VP8L streams for greyscale pixels.
    * Emits the SUBTRACT_GREEN transform (channel deltas collapse to
    * 0, so red/blue ride simple codes), a normal code-length-coded
    * green tree (exercising the canonical construction and the
    * space-exhaustion stop), and — in `withRuns` mode — real LZ77
    * backward references with prefix-coded lengths and plain
    * distance 1, plus a 9-bit literal tree whose Kraft sum the
    * length symbols complete. Code assignment reuses
    * [[Prefix.canonicalCodes]], the decoder's own constructor, so
    * the two sides cannot drift.
    */
  object Builder {

    private final class BitWriter {
      private val out = new java.io.ByteArrayOutputStream
      private var cur = 0
      private var nb = 0
      def writeBit(b: Int): Unit = {
        cur |= (b & 1) << nb; nb += 1
        if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
      }
      def writeBits(v: Int, n: Int): Unit = {
        var i = 0
        while (i < n) { writeBit((v >> i) & 1); i += 1 }
      }
      /** prefix codes are written MSB-first (the decoder walks them
        * bit by bit from the top)
        */
      def writeCode(code: Int, len: Int): Unit = {
        var i = len - 1
        while (i >= 0) { writeBit((code >> i) & 1); i -= 1 }
      }
      def result(): Array[Byte] = {
        if (nb > 0) { out.write(cur); cur = 0; nb = 0 }
        out.toByteArray
      }
    }

    private def simpleTree(bw: BitWriter, symbol: Int): Unit = {
      bw.writeBits(1, 1) // simple
      bw.writeBits(0, 1) // one symbol
      if (symbol < 2) { bw.writeBits(0, 1); bw.writeBits(symbol, 1) }
      else { bw.writeBits(1, 1); bw.writeBits(symbol, 8) }
    }

    /** Greyscale VP8L inside a RIFF/WEBP container. `withRuns` turns
      * repeats of the previous pixel (length ≥ 3) into LZ77
      * backrefs; without it every pixel is a literal on a fixed
      * 8-bit green tree.
      */
    def grey8(width: Int, height: Int, pixels: Array[Byte],
        withRuns: Boolean = false): Array[Byte] = {
      require(width >= 1 && width <= (1 << 14) &&
        height >= 1 && height <= (1 << 14), "dims out of VP8L range")
      require(pixels.length == width * height, "pixel count")
      val bw = new BitWriter
      bw.writeBits(width - 1, 14)
      bw.writeBits(height - 1, 14)
      bw.writeBits(0, 1) // no alpha hint
      bw.writeBits(0, 3) // version 0
      // transforms: SUBTRACT_GREEN only
      bw.writeBits(1, 1); bw.writeBits(2, 2)
      bw.writeBits(0, 1) // end of transforms
      bw.writeBits(0, 1) // no color cache
      bw.writeBits(0, 1) // no meta prefix groups

      // green tree (alphabet 280)
      val greenLengths = new Array[Int](280)
      if (!withRuns) {
        // 256 literals at 8 bits: Kraft-complete, the decoder's
        // space counter stops the length stream at symbol 256
        java.util.Arrays.fill(greenLengths, 0, 256, 8)
        bw.writeBits(0, 1) // normal code
        // code-length code: only symbol 8 used -> zero-bit CL code;
        // symbol 8 sits at position 10 of the CL order
        bw.writeBits(7, 4) // 11 code-length lengths
        for (i <- 0 until 11)
          bw.writeBits(if (ClOrder(i) == 8) 1 else 0, 3)
        bw.writeBits(0, 1) // no max-symbol bound
        // 256 zero-bit CL symbols: nothing to write
      } else {
        // 9-bit literals + length symbols 258 (len 3), 259 (3),
        // 260 (2) complete the Kraft sum: 256/512 + 2/8 + 1/4 = 1
        java.util.Arrays.fill(greenLengths, 0, 256, 9)
        greenLengths(258) = 3; greenLengths(259) = 3; greenLengths(260) = 2
        bw.writeBits(0, 1) // normal code
        // CL lengths: 9 -> 1 bit, 0 -> 2, 2 -> 3, 3 -> 3
        val cl = new Array[Int](19)
        cl(9) = 1; cl(0) = 2; cl(2) = 3; cl(3) = 3
        bw.writeBits(8, 4) // 12 code-length lengths (symbol 9 at idx 11)
        for (i <- 0 until 12) bw.writeBits(cl(ClOrder(i)), 3)
        bw.writeBits(0, 1) // no max-symbol bound
        val clCodes = Prefix.canonicalCodes(cl)
          .map { case (s, c, l) => s -> ((c, l)) }.toMap
        def clSym(s: Int): Unit = {
          val (c, l) = clCodes(s); bw.writeCode(c, l)
        }
        for (_ <- 0 until 256) clSym(9)
        clSym(0); clSym(0) // symbols 256, 257 unused
        clSym(3); clSym(3); clSym(2) // 258, 259, 260
        // space exhausted -> decoder stops here
      }
      val greenCodes = Prefix.canonicalCodes(greenLengths)
        .map { case (s, c, l) => s -> ((c, l)) }.toMap

      simpleTree(bw, 0)   // red   (0 after subtract-green)
      simpleTree(bw, 0)   // blue
      simpleTree(bw, 255) // alpha
      // distance tree: prefix code 13 covers plain distance 1
      // (value 121 = 96 + 24 + 1 -> 5 extra bits of 24)
      simpleTree(bw, if (withRuns) 13 else 0)

      def literal(v: Int): Unit = {
        val (c, l) = greenCodes(v); bw.writeCode(c, l)
        // red/blue/alpha are single-symbol codes: zero bits
      }
      var i = 0
      val n = pixels.length
      while (i < n) {
        val run =
          if (withRuns && i > 0) {
            var r = 0
            while (i + r < n && pixels(i + r) == pixels(i - 1) && r < 6)
              r += 1
            r
          } else 0
        if (run >= 3) {
          val lenSym = run match {
            case 3 => 258
            case 4 => 259
            case _ => 260
          }
          val (c, l) = greenCodes(lenSym); bw.writeCode(c, l)
          if (run >= 5) bw.writeBits(run - 5, 1) // extra bit of code 4
          // distance symbol 13 is zero-bit; its 5 extra bits encode 24
          bw.writeBits(24, 5)
          i += run
        } else {
          literal(pixels(i) & 0xff)
          i += 1
        }
      }

      val payload = Array[Byte](0x2f) ++ bw.result()
      riff(payload)
    }

    /** Fixed 8-bit code over symbols 0..255 of an alphabet ≥ 256:
      * only CL symbol 8 is used (a zero-bit CL code), the 256 lengths
      * cost no bits, and the decoder's Kraft-space counter stops the
      * length stream at symbol 256 exactly. Canonical codes are then
      * code(v) = v in 8 bits.
      */
    private def fixed8Tree(bw: BitWriter): Unit = {
      bw.writeBits(0, 1) // normal code
      bw.writeBits(7, 4) // 11 code-length lengths (symbol 8 at idx 10)
      for (i <- 0 until 11)
        bw.writeBits(if (ClOrder(i) == 8) 1 else 0, 3)
      bw.writeBits(0, 1) // no max-symbol bound; 256 zero-bit entries
    }

    /** Simple code over exactly two symbols (first → code 0). */
    private def simple2(bw: BitWriter, first: Int, second: Int): Unit = {
      bw.writeBits(1, 1) // simple
      bw.writeBits(1, 1) // two symbols
      bw.writeBits(1, 1) // first symbol in 8 bits
      bw.writeBits(first, 8)
      bw.writeBits(second, 8)
    }

    /** Greyscale VP8L whose whole image is coded through ONE
      * predictor-transform block of the given mode (any of the 14),
      * composed with subtract-green: residuals are computed with the
      * decoder's own [[predictAt]], so the stream exercises the full
      * predictor inverse over real bits. Dims ≤ 512 (one block).
      */
    def grey8Predicted(width: Int, height: Int, pixels: Array[Byte],
        mode: Int): Array[Byte] = {
      require(width >= 1 && width <= 512 && height >= 1 && height <= 512,
        "one-block mode needs dims <= 512")
      require(mode >= 0 && mode <= 13, s"predictor mode $mode")
      require(pixels.length == width * height, "pixel count")
      // forward pass: residual(i) = pixel(i) - predict(reconstructed)
      // per channel mod 256; the reconstructed prefix IS the original
      val img = pixels.map(p => 0xff000000 | ((p & 0xff) * 0x010101))
      val residual = new Array[Int](img.length)
      for (y <- 0 until height; x <- 0 until width) {
        val i = y * width + x
        val pr = predictAt(img, width, x, y, mode)
        def ch(s: Int) = (((img(i) >> s) & 0xff) - ((pr >> s) & 0xff)) & 0xff
        residual(i) = (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
      }
      val bw = new BitWriter
      bw.writeBits(width - 1, 14)
      bw.writeBits(height - 1, 14)
      bw.writeBits(0, 1); bw.writeBits(0, 3)
      // transforms, read order PREDICTOR then SUBTRACT_GREEN → the
      // decoder inverts subtract-green first, predictor second, so
      // the encoder applies predictor first, subtract-green second
      bw.writeBits(1, 1); bw.writeBits(0, 2) // PREDICTOR
      val sizeBits = (2 to 9).find(b => (1 << b) >= math.max(width, height)).get
      bw.writeBits(sizeBits - 2, 3)
      // 1×1 mode sub-image: no cache, all five trees single-symbol →
      // the one pixel costs zero bits
      bw.writeBits(0, 1) // no color cache
      simpleTree(bw, mode) // green = predictor mode
      simpleTree(bw, 0); simpleTree(bw, 0)
      simpleTree(bw, 255); simpleTree(bw, 0)
      bw.writeBits(1, 1); bw.writeBits(2, 2) // SUBTRACT_GREEN
      bw.writeBits(0, 1) // end of transforms
      bw.writeBits(0, 1) // no color cache
      bw.writeBits(0, 1) // no meta prefix groups
      // after subtract-green on the (equal-channel) residuals: green
      // carries the residual byte, red/blue collapse to 0; the alpha
      // residual is 0 everywhere (every alpha prediction is 255)
      fixed8Tree(bw)
      simpleTree(bw, 0); simpleTree(bw, 0)
      simpleTree(bw, 0); simpleTree(bw, 0)
      for (i <- residual.indices) bw.writeCode((residual(i) >> 8) & 0xff, 8)
      riff(Array[Byte](0x2f) ++ bw.result())
    }

    /** Greyscale VP8L using a real COLOR CACHE (2^cacheBits entries):
      * repeats of recently-seen pixels are emitted as cache-hit
      * symbols, exercising the decoder's cache indexing and the
      * literal/cache split of the green alphabet. Kraft: 256 literals
      * at 9 bits + 2^k cache symbols at (k+1) bits sum to exactly 1.
      */
    def grey8Cached(width: Int, height: Int, pixels: Array[Byte],
        cacheBits: Int = 4): Array[Byte] = {
      // cacheBits = 8 would give cache symbols the literals' length 9,
      // collapsing the two CL classes this layout keeps distinct
      require(cacheBits >= 1 && cacheBits <= 10 && cacheBits != 8,
        s"cache bits $cacheBits")
      require(pixels.length == width * height, "pixel count")
      val cacheSize = 1 << cacheBits
      val bw = new BitWriter
      bw.writeBits(width - 1, 14)
      bw.writeBits(height - 1, 14)
      bw.writeBits(0, 1); bw.writeBits(0, 3)
      bw.writeBits(1, 1); bw.writeBits(2, 2) // SUBTRACT_GREEN
      bw.writeBits(0, 1) // end of transforms
      bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) // color cache ON
      bw.writeBits(0, 1) // no meta prefix groups
      // green tree: literals 0..255 at 9 bits, cache symbols at
      // cacheBits+1; CL code: 9 → 1 bit, (k+1) → 2, 0 → 2
      val cacheLen = cacheBits + 1
      val greenLengths = new Array[Int](256 + 24 + cacheSize)
      java.util.Arrays.fill(greenLengths, 0, 256, 9)
      for (i <- 0 until cacheSize) greenLengths(280 + i) = cacheLen
      bw.writeBits(0, 1) // normal code
      val cl = new Array[Int](19)
      cl(9) = 1; cl(cacheLen) = 2; cl(0) = 2
      val numCl = ClOrder.lastIndexWhere(s => cl(s) > 0) + 1
      bw.writeBits(numCl - 4, 4)
      for (i <- 0 until numCl) bw.writeBits(cl(ClOrder(i)), 3)
      bw.writeBits(0, 1) // no max-symbol bound
      val clCodes = Prefix.canonicalCodes(cl)
        .map { case (s, c, l) => s -> ((c, l)) }.toMap
      def clSym(s: Int): Unit = {
        val (c, l) = clCodes(s); bw.writeCode(c, l)
      }
      for (_ <- 0 until 256) clSym(9)
      for (_ <- 0 until 24) clSym(0)
      for (_ <- 0 until cacheSize) clSym(cacheLen)
      val greenCodes = Prefix.canonicalCodes(greenLengths)
        .map { case (s, c, l) => s -> ((c, l)) }.toMap
      simpleTree(bw, 0); simpleTree(bw, 0)
      simpleTree(bw, 255); simpleTree(bw, 0)
      // the cache tracks IN-STREAM pixels (pre-inverse-transform):
      // after subtract-green a grey v is (a=255, r=0, g=v, b=0)
      val cache = new Array[Int](cacheSize)
      for (p <- pixels) {
        val px = 0xff000000 | ((p & 0xff) << 8)
        val idx = cacheIndex(px, cacheBits) // the decoder's own hash
        if (cache(idx) == px) {
          val (c, l) = greenCodes(280 + idx); bw.writeCode(c, l)
        } else {
          val (c, l) = greenCodes(p & 0xff); bw.writeCode(c, l)
          cache(idx) = px
        }
      }
      riff(Array[Byte](0x2f) ++ bw.result())
    }

    /** COLOR-INDEXED VP8L: pixels are indices into a ≤256-entry grey
      * palette; with ≤16 colors the indices are PIXEL-BUNDLED (2, 4
      * or 8 per green byte), exercising the decoder's palette
      * delta-decode and unbundling inverse.
      */
    def grey8Indexed(width: Int, height: Int, indices: Array[Byte],
        palette: Array[Int]): Array[Byte] = {
      val n = palette.length
      require(n >= 1 && n <= 256, s"palette size $n")
      require(indices.length == width * height, "index count")
      require(indices.forall(i => (i & 0xff) < n), "index out of palette")
      val bw = new BitWriter
      bw.writeBits(width - 1, 14)
      bw.writeBits(height - 1, 14)
      bw.writeBits(0, 1); bw.writeBits(0, 3)
      bw.writeBits(1, 1); bw.writeBits(3, 2) // COLOR_INDEXING
      bw.writeBits(n - 1, 8)
      // palette stream (n×1): entries are DELTA-coded per channel;
      // grey palette → r=g=b=delta, alpha delta 255 then 0
      bw.writeBits(0, 1) // no color cache (palette stream)
      fixed8Tree(bw) // green deltas
      fixed8Tree(bw) // red deltas
      fixed8Tree(bw) // blue deltas
      if (n == 1) simpleTree(bw, 255) else simple2(bw, 255, 0)
      simpleTree(bw, 0) // distance
      var prev = 0
      for (i <- 0 until n) {
        val dv = (palette(i) - prev) & 0xff
        bw.writeCode(dv, 8) // green
        bw.writeCode(dv, 8) // red
        bw.writeCode(dv, 8) // blue
        if (n > 1) bw.writeCode(if (i == 0) 0 else 1, 1) // alpha 255/0
        prev = palette(i)
      }
      bw.writeBits(0, 1) // end of transforms
      bw.writeBits(0, 1) // no color cache (spatial stream)
      bw.writeBits(0, 1) // no meta prefix groups
      // spatial stream: bundled indices in the green channel
      val widthBits =
        if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
      val bpp = 8 >> widthBits
      val perPacked = 1 << widthBits
      val pw = (width + perPacked - 1) >> widthBits
      fixed8Tree(bw) // green = packed index byte
      simpleTree(bw, 0); simpleTree(bw, 0)
      simpleTree(bw, 255); simpleTree(bw, 0)
      for (y <- 0 until height; px <- 0 until pw) {
        var packed = 0
        for (k <- 0 until perPacked) {
          val x = (px << widthBits) + k
          if (x < width)
            packed |= (indices(y * width + x) & 0xff) << (k * bpp)
        }
        bw.writeCode(packed, 8)
      }
      riff(Array[Byte](0x2f) ++ bw.result())
    }

    private def riff(vp8l: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream
      def ascii(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
      def le32(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
      }
      val pad = vp8l.length & 1
      ascii("RIFF"); le32(4 + 8 + vp8l.length + pad); ascii("WEBP")
      ascii("VP8L"); le32(vp8l.length); out.write(vp8l, 0, vp8l.length)
      if (pad == 1) out.write(0)
      out.toByteArray
    }
  }

  final class WebpCodec extends MediaCodec {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(r.content)
        val digest = md.map("%02x".format(_)).mkString
        val d = decode(r.content)
        MediaFeatures(r.mediaId, r.mediaType, r.content.length.toLong, digest,
          width = d.map(_.width).getOrElse(0),
          height = d.map(_.height).getOrElse(0),
          durationMs = 0L, batchSize = batch.size,
          avgLumaMilli = d.map(lumaMilliOf).getOrElse(-1L))
      }
  }
}
