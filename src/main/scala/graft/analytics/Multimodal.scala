package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batched decode / feature-extract
  * plumbing.
  *
  * Decoding is REAL for everything that is pure byte arithmetic —
  * PCM WAV ([[PcmWavCodec]]: channels, sample rate, duration,
  * mean-square energy), uncompressed 24-bit BMP ([[BmpCodec]]:
  * dimensions, average luma), PNG ([[PngCodec]]: full inflate +
  * unfilter + luma), ISO-BMFF/MP4 ([[Mp4Codec]]: true duration and
  * track dimensions from the box tree) and JPEG ([[JpegCodec]]: full
  * entropy decode — Huffman, dequantize, IDCT — to dimensions and
  * average luma, for BOTH baseline SOF0 and progressive SOF2 with
  * spectral selection + successive approximation) — dispatched by
  * magic bytes in [[FormatAwareCodec]]. VIDEO FRAMES decode for real
  * too when the samples are JPEGs ([[Mjpeg]]: sample-index walk →
  * frame byte ranges → the in-house JPEG decoder). Only inter-coded
  * codecs that genuinely need a library absent from this environment
  * (H.264 et al.) stay opaque — their keyframe BYTE ranges are still
  * indexed for real via the sample tables.
  * Unrecognized formats fall back to
  * [[DeterministicStubCodec]], which produces stable fake features
  * so the pipeline stays testable end-to-end. The
  * Spark-side plumbing is real throughout: schema, size-aware
  * partitioning, per-partition batched invocation (the Scala
  * analogue of `mapInPandas` batch shape), and the metadata-only
  * fast paths.
  */
object Multimodal {

  /** One media object: opaque payload + typed envelope. */
  final case class MediaRow(
      mediaId: Long,
      mediaType: String, // image | audio | video
      content: Array[Byte])

  final case class MediaFeatures(
      mediaId: Long,
      mediaType: String,
      byteLen: Long,
      digest: String,
      width: Int,       // image dimensions (0 for audio)
      height: Int,
      durationMs: Long, // audio/video duration (0 for images)
      batchSize: Int,   // observability: size of the decode batch
      sampleRate: Int = 0,       // WAV: samples/s
      channels: Int = 0,         // WAV: channel count
      energyMilli: Long = -1L,   // WAV: mean-square energy ×1000 (normalized)
      avgLumaMilli: Long = -1L)  // BMP: average Rec.601 luma ×1000 (0..255000)

  /** Pluggable decoder, invoked once per BATCH of rows — the shape a
    * vectorized decode (GPU / native lib) needs. Implementations must
    * be deterministic per content bytes.
    */
  trait MediaCodec extends Serializable {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** Deterministic fake decode for lib-dependent formats only (see
    * [[FormatAwareCodec]]): "dimensions" from the content digest,
    * "duration" from the byte length. Replace with a real codec
    * (??? = libjpeg/ffmpeg binding) without touching the plumbing.
    */
  final class DeterministicStubCodec extends MediaCodec {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
      // a real lib-backed implementation would decode the whole batch
      // vectorized: ??? (no video codec libs in this container;
      // WAV/BMP/PNG/JPEG never reach this — FormatAwareCodec routes
      // them to the real parsers)
      batch.map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(r.content)
        val hex = md.map("%02x".format(_)).mkString
        MediaFeatures(
          mediaId = r.mediaId,
          mediaType = r.mediaType,
          byteLen = r.content.length.toLong,
          digest = hex,
          width = 16 + (md(0) & 0x7f),
          height = 16 + (md(1) & 0x7f),
          durationMs = if (r.mediaType == "image") 0L else r.content.length.toLong * 10,
          batchSize = batch.size)
      }
    }
  }

  private def metaOf(r: MediaRow): (String, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(r.content)
    (md.map("%02x".format(_)).mkString, r.content.length.toLong)
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Shared big-endian byte helpers for the PNG and ISO-BMFF codecs
    * and builders (one place for reads and their write twins).
    */
  private[analytics] object BE {
    /** Unsigned 32-bit read, widened to Long (box sizes, offsets). */
    def read32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    /** Signed 32-bit read (PNG chunk sizes: negative = malformed). */
    def read32i(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    def read64(b: Array[Byte], o: Int): Long =
      (read32(b, o) << 32) | read32(b, o + 4)
    def write32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def write64(v: Long): Array[Byte] = write32(v >> 32) ++ write32(v)
  }

  /** REAL audio decode for RIFF/WAVE PCM — container walk + 16-bit
    * sample math, no codec library involved. Emits channel count,
    * sample rate, exact duration, and the normalized mean-square
    * energy ×1000 (an all-integer loudness proxy — the audio-quality
    * gate a curation pipeline thresholds on).
    */
  final class PcmWavCodec extends MediaCodec {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val (digest, len) = metaOf(r)
        val b = r.content
        var channels = 0; var rate = 0; var bits = 0
        var nSamples = 0L; var energyMilli = -1L
        var off = 12L // after RIFF<size>WAVE
        var malformed = false
        while (!malformed && off + 8 <= b.length) {
          val o = off.toInt
          val id = new String(b, o, 4, "US-ASCII")
          val size = le32(b, o + 4)
          val data = o + 8
          if (size < 0) {
            // a corrupt signed chunk size must not walk backwards or
            // stall the scan — bail with whatever was parsed so far
            malformed = true
          } else {
            if (id == "fmt " && data + 16 <= b.length) {
              channels = le16(b, data + 2)
              rate = le32(b, data + 4)
              bits = le16(b, data + 14)
            } else if (id == "data" && channels > 0 && bits == 16) {
              val end = math.min(b.length.toLong, data.toLong + size).toInt
              val frameBytes = channels * 2
              nSamples = (end - data).toLong / frameBytes
              var i = data
              var sumSq = 0L
              while (i + 1 < end) {
                val s = (le16(b, i) << 16) >> 16 // sign-extend
                sumSq += s.toLong * s
                i += 2
              }
              val totalVals = (end - data).toLong / 2
              if (totalVals > 0)
                // mean square over normalized [-1,1) amplitude, ×1000;
                // BigInt so sumSq*1000 can't overflow on long clips
                energyMilli =
                  (BigInt(sumSq) * 1000 / totalVals / (32768L * 32768L)).toLong
            }
            val next = data.toLong + size + (size & 1) // chunks 2-byte aligned
            if (next <= off) malformed = true else off = next
          }
        }
        MediaFeatures(r.mediaId, r.mediaType, len, digest,
          width = 0, height = 0,
          durationMs = if (rate > 0) nSamples * 1000L / rate else 0L,
          batchSize = batch.size,
          sampleRate = rate, channels = channels, energyMilli = energyMilli)
      }
  }

  /** Sample-level PCM WAV access for the audio-feature path — the
    * same RIFF walk as [[PcmWavCodec]] but returning the decoded
    * samples instead of folding them into one energy scalar, so
    * downstream features (zero-crossing rate, peak, square-wave
    * correlation) compute from real decoded audio. Returns None
    * unless a valid 16-bit PCM fmt chunk AND a data chunk are both
    * present ([[PcmWavCodec]] keeps its partial-parse leniency for
    * the metadata path; features need the full contract).
    */
  object Wav {
    final case class Pcm(rate: Int, channels: Int, samples: Array[Short])

    def decode(b: Array[Byte]): Option[Pcm] = {
      if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return None
      var channels = 0; var rate = 0; var bits = 0
      var samples: Array[Short] = null
      var off = 12L
      var ok = true
      while (ok && off + 8 <= b.length) {
        val o = off.toInt
        val id = new String(b, o, 4, "US-ASCII")
        val size = le32(b, o + 4)
        val data = o + 8
        if (size < 0) ok = false
        else {
          if (id == "fmt " && data + 16 <= b.length) {
            channels = le16(b, data + 2)
            rate = le32(b, data + 4)
            bits = le16(b, data + 14)
          } else if (id == "data" && channels > 0 && bits == 16 &&
              samples == null) {
            val end = math.min(b.length.toLong, data.toLong + size).toInt
            val n = ((end - data) / 2).max(0)
            val out = new Array[Short](n)
            var i = 0
            while (i < n) {
              out(i) = ((le16(b, data + i * 2) << 16) >> 16).toShort
              i += 1
            }
            samples = out
          }
          val next = data.toLong + size + (size & 1)
          if (next <= off) ok = false else off = next
        }
      }
      if (samples != null && rate > 0) Some(Pcm(rate, channels, samples))
      else None
    }

    /** Deterministic integer audio features over decoded samples:
      * (n_samples, zero crossings with sign = v ≥ 0, peak |v|, and
      * the correlation against a ±1 square wave of period 16 — the
      * integer-exact spectral proxy a pitch/tone gate uses). */
    def features(p: Pcm): (Long, Long, Long, Long) = {
      val s = p.samples
      var zc = 0L; var peak = 0L; var corr = 0L
      var i = 0
      while (i < s.length) {
        val v = s(i).toInt
        if (i > 0 && ((v >= 0) != (s(i - 1) >= 0))) zc += 1
        val a = math.abs(v.toLong)
        if (a > peak) peak = a
        corr += (if (((i >> 3) & 1) == 0) v.toLong else -v.toLong)
        i += 1
      }
      (s.length.toLong, zc, peak, corr)
    }
  }

  /** REAL image decode for uncompressed 24-bit BMP — header parse +
    * per-pixel integer luma, no codec library involved. Emits true
    * dimensions and the average Rec.601 luma ×1000 (the
    * brightness/degenerate-image gate).
    */
  final class BmpCodec extends MediaCodec {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val (digest, len) = metaOf(r)
        val b = r.content
        var width = 0; var height = 0; var luma = -1L
        if (b.length >= 54) {
          val dataOffset = le32(b, 10)
          width = le32(b, 18)
          val rawH = le32(b, 22)
          height = math.abs(rawH) // negative = top-down row order
          val bitCount = le16(b, 28)
          // offsets in Long and dataOffset bounds-checked: a crafted
          // header (negative offset, huge dims) must degrade to "no
          // pixels read", not index out of bounds or overflow Int
          if (bitCount == 24 && width > 0 && height > 0 &&
              dataOffset >= 0 && dataOffset < b.length) {
            val rowBytes = ((width.toLong * 3 + 3) / 4) * 4 // rows pad to 4
            var sum = 0L; var n = 0L
            var y = 0
            var row = dataOffset.toLong
            while (y < height && row + 2 < b.length) {
              var x = 0
              while (x < width && row + x.toLong * 3 + 2 < b.length) {
                val p = (row + x.toLong * 3).toInt
                val bl = b(p) & 0xff
                val g = b(p + 1) & 0xff
                val rd = b(p + 2) & 0xff
                sum += 299L * rd + 587L * g + 114L * bl // Rec.601 ×1000
                n += 1
                x += 1
              }
              y += 1
              row = dataOffset.toLong + y * rowBytes
            }
            if (n > 0) luma = sum / n
          }
        }
        MediaFeatures(r.mediaId, r.mediaType, len, digest,
          width = width, height = height, durationMs = 0L,
          batchSize = batch.size, avgLumaMilli = luma)
      }
  }

  /** REAL image decode for PNG — chunk walk, IDAT inflate via the
    * JDK's zlib (no codec library), per-row unfilter (None/Sub/Up/
    * Average/Paeth), average Rec.601 luma ×1000. Supports ALL
    * non-interlaced 8-bit color types: greyscale (0), RGB (2),
    * palette (3, indices resolved through PLTE), greyscale+alpha
    * (4), RGBA (6); 16-bit and interlaced degrade to
    * dimensions-only. Malformed chunks (including a palette index
    * past PLTE) bail to whatever was parsed — one bad record never
    * hangs or aborts.
    */
  /** The ONE PNG per-row unfilter (spec §9 filter types None/Sub/Up/
    * Average/Paeth), shared by [[PngCodec]] (full-image luma) and
    * [[ImageHash]] (resize + average-hash) so the filter arithmetic —
    * including the Paeth predictor's tie-break order — has a single
    * definition. `raw(rowOff)` is the filter byte; decoded bytes land
    * in `cur`, with `prev` the previous row's decoded bytes.
    */
  private[analytics] object PngFilters {
    def unfilterRow(raw: Array[Byte], rowOff: Int, cur: Array[Byte],
        prev: Array[Byte], bpp: Int, stride: Int): Unit = {
      val filter = raw(rowOff) & 0xff
      var x = 0
      while (x < stride) {
        val rawV = raw(rowOff + 1 + x) & 0xff
        val a = if (x >= bpp) cur(x - bpp) & 0xff else 0
        val up = prev(x) & 0xff
        val c = if (x >= bpp) prev(x - bpp) & 0xff else 0
        val v = filter match {
          case 0 => rawV
          case 1 => (rawV + a) & 0xff
          case 2 => (rawV + up) & 0xff
          case 3 => (rawV + (a + up) / 2) & 0xff
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            val paeth = if (pa <= pb && pa <= pc) a
                        else if (pb <= pc) up else c
            (rawV + paeth) & 0xff
          case _ => rawV
        }
        cur(x) = v.toByte
        x += 1
      }
    }
  }

  /** Perceptual average-hash for images — the multimodal near-dup
    * primitive (the image-side analogue of SimHash on text): decode
    * the luma plane with the REAL PNG machinery (inflate + the shared
    * [[PngFilters]] unfilter), nearest-neighbor resize to 8×8, then
    * one bit per cell — is this cell at-or-above the 64-cell mean —
    * packed as two 32-bit halves (a full 64-bit pack would overflow
    * BIGINT arithmetic in the integer-only oracle). Everything after
    * the decode is exact integer arithmetic: sample index =
    * (y·h div 8)·w + (x·w div 8), threshold compare px·64 ≥ Σpx.
    * Near-dup images then pair by hamming distance on 64 bits —
    * banded like SimHash at scale, never all-pairs.
    *
    * Scope: non-interlaced 8-bit GREYSCALE PNG (what the pipeline's
    * thumbnail normalization emits); anything else returns None
    * rather than a wrong hash.
    */
  object ImageHash {
    import BE.{read32i => be32}

    /** (width, height, hash bits 32..63, hash bits 0..31). */
    def ahashGrey8(b: Array[Byte]): Option[(Int, Int, Long, Long)] = {
      // full 8-byte PNG signature up front: without it, a non-PNG
      // payload whose bytes coincidentally parse as IHDR/IDAT chunks
      // could return a hash instead of refusing — the same dispatch
      // contract as FormatAwareCodec's isPng
      if (b.length < 8 || (b(0) & 0xff) != 0x89 || b(1) != 'P' ||
          b(2) != 'N' || b(3) != 'G' || b(4) != 0x0d || b(5) != 0x0a ||
          b(6) != 0x1a || b(7) != 0x0a) return None
      var width = 0; var height = 0
      var bitDepth = 0; var colorType = -1; var interlaced = true
      val idat = new java.io.ByteArrayOutputStream()
      var off = 8L
      var malformed = false
      while (!malformed && off + 8 <= b.length) {
        val o = off.toInt
        val size = be32(b, o)
        val ctype = new String(b, o + 4, 4, "US-ASCII")
        val data = o + 8
        if (size < 0 || data.toLong + size + 4 > b.length) malformed = true
        else {
          ctype match {
            case "IHDR" if size >= 13 =>
              width = be32(b, data); height = be32(b, data + 4)
              bitDepth = b(data + 8) & 0xff; colorType = b(data + 9) & 0xff
              interlaced = b(data + 12) != 0
            case "IDAT" => idat.write(b, data, size)
            case _ => ()
          }
          off = data.toLong + size + 4
        }
      }
      if (malformed || colorType != 0 || bitDepth != 8 || interlaced ||
          width < 1 || height < 1 || width.toLong * height > 64L * 1024 * 1024)
        return None
      val stride = width
      val rawCap = ((stride.toLong + 1) * height).toInt
      graft.core.PayloadCodec.safeInflate(idat.toByteArray, rawCap).flatMap { raw =>
        if (raw.length < (stride + 1) * height) None
        else {
          val pixels = new Array[Byte](width * height)
          val prev = new Array[Byte](stride)
          val cur = new Array[Byte](stride)
          var y = 0
          while (y < height) {
            PngFilters.unfilterRow(raw, y * (stride + 1), cur, prev, 1, stride)
            System.arraycopy(cur, 0, pixels, y * width, width)
            System.arraycopy(cur, 0, prev, 0, stride)
            y += 1
          }
          // nearest-neighbor 8×8 sample, integer mean, threshold bits
          val sample = new Array[Int](64)
          var sum = 0L
          var j = 0
          while (j < 64) {
            val gy = j / 8; val gx = j % 8
            val sy = gy * height / 8; val sx = gx * width / 8
            val p = pixels(sy * width + sx) & 0xff
            sample(j) = p
            sum += p
            j += 1
          }
          var hi = 0L; var lo = 0L
          j = 0
          while (j < 64) {
            if (sample(j).toLong * 64 >= sum) {
              if (j >= 32) hi |= 1L << (j - 32) else lo |= 1L << j
            }
            j += 1
          }
          Some((width, height, hi, lo))
        }
      }
    }
  }

  final class PngCodec extends MediaCodec {
    import BE.{read32i => be32}

    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val (digest, len) = metaOf(r)
        val b = r.content
        var width = 0; var height = 0; var luma = -1L
        var bitDepth = 0; var colorType = -1
        var plte: Array[Byte] = null
        val idat = new java.io.ByteArrayOutputStream()
        var off = 8L // past the 8-byte signature
        var malformed = false
        while (!malformed && off + 8 <= b.length) {
          val o = off.toInt
          val size = be32(b, o)
          val ctype = new String(b, o + 4, 4, "US-ASCII")
          val data = o + 8
          if (size < 0 || data.toLong + size + 4 > b.length) malformed = true
          else {
            ctype match {
              case "IHDR" if size >= 13 =>
                width = be32(b, data); height = be32(b, data + 4)
                bitDepth = b(data + 8) & 0xff; colorType = b(data + 9) & 0xff
                // interlaced (b[data+12] != 0) → skip pixel decode
                if (b(data + 12) != 0) colorType = -1
              case "IDAT" => idat.write(b, data, size)
              case "PLTE" if size % 3 == 0 && size <= 768 =>
                plte = java.util.Arrays.copyOfRange(b, data, data + size)
              case _ => ()
            }
            off = data.toLong + size + 4 // skip CRC
          }
        }
        val channels = colorType match {
          case 0 => 1 // grey
          case 2 => 3 // rgb
          case 3 => if (plte != null) 1 else 0 // palette index
          case 4 => 2 // grey+alpha
          case 6 => 4 // rgba
          case _ => 0
        }
        if (channels > 0 && bitDepth == 8 && width > 0 && height > 0 &&
            width.toLong * height <= 64L * 1024 * 1024) {
          // a valid non-interlaced 8-bit PNG inflates to exactly
          // (stride+1)×height bytes; cap the inflater there — the
          // generic 10MB zlib-bomb default would reject legitimate
          // large images (2048×2048 RGB is already ~12.6MB raw).
          // Pixel guard above keeps this ≤ ~320MB, within Int range.
          val rawCap = ((width.toLong * channels + 1) * height).toInt
          graft.core.PayloadCodec.safeInflate(idat.toByteArray, rawCap).foreach { raw =>
            val bpp = channels
            val stride = width * bpp
            if (raw.length >= (stride + 1) * height) {
              // unfilter in place over a rolling previous row
              val prev = new Array[Byte](stride)
              val cur = new Array[Byte](stride)
              var sum = 0L
              var badIndex = false
              var y = 0
              while (y < height) {
                PngFilters.unfilterRow(raw, y * (stride + 1), cur, prev,
                  bpp, stride)
                // Rec.601 luma ×1000 per pixel
                var px = 0
                while (px < width) {
                  val base = px * bpp
                  sum += (colorType match {
                    case 0 | 4 => 1000L * (cur(base) & 0xff)
                    case 3 => // palette: resolve the index through PLTE
                      val e = (cur(base) & 0xff) * 3
                      if (e + 2 >= plte.length) { badIndex = true; 0L }
                      else 299L * (plte(e) & 0xff) + 587L * (plte(e + 1) & 0xff) +
                        114L * (plte(e + 2) & 0xff)
                    case _ => // 2 | 6: RGB order
                      299L * (cur(base) & 0xff) + 587L * (cur(base + 1) & 0xff) +
                        114L * (cur(base + 2) & 0xff)
                  })
                  px += 1
                }
                System.arraycopy(cur, 0, prev, 0, stride)
                y += 1
              }
              if (!badIndex) luma = sum / (width.toLong * height)
            }
          }
        }
        MediaFeatures(r.mediaId, r.mediaType, len, digest,
          width = width, height = height, durationMs = 0L,
          batchSize = batch.size, avgLumaMilli = luma)
      }
  }

  /** The ONE ISO-BMFF box walk, shared by [[Mp4Codec]] and
    * [[Mp4Index]] so size/largesize/size-0/sanity handling (and its
    * hardening) lives in a single place. Recursion is bounded: real
    * files nest ~5 deep (`moov/trak/mdia/minf/stbl`), so a crafted
    * container with thousands of nested boxes hits `MaxDepth` and is
    * treated as exhausted rather than overflowing the stack —
    * StackOverflowError is a VirtualMachineError that would sail past
    * the per-record NonFatal fallbacks.
    */
  private[analytics] object BmffWalk {
    import BE.{read32 => be32, read64 => be64}
    private val MaxDepth = 16

    /** Walk boxes in b[from, until); recurse into `containers`, fire
      * `onLeaf(ctype, dataStart, end)` for everything else. Malformed
      * boxes (size < header, truncated largesize, overflow) bail to
      * whatever was parsed.
      */
    def walk(b: Array[Byte], from: Long, until: Long,
        containers: Set[String], depth: Int = 0)(
        onLeaf: (String, Long, Long) => Unit): Unit = {
      if (depth >= MaxDepth) return
      var off = from
      var sane = true
      while (sane && off + 8 <= until) {
        val o = off.toInt
        var size = be32(b, o)
        val ctype = new String(b, o + 4, 4, "US-ASCII")
        var header = 8L
        if (size == 1 && off + 16 <= until) { size = be64(b, o + 8); header = 16 }
        else if (size == 0) size = until - off // box runs to end of enclosure
        val end = off + size
        if (size < header || end > until) sane = false
        else {
          if (containers(ctype)) walk(b, off + header, end, containers, depth + 1)(onLeaf)
          else onLeaf(ctype, off + header, end)
          off = end
        }
      }
    }
  }

  /** REAL container parse for ISO BMFF (MP4/MOV) — box walk, no codec
    * library. `moov/mvhd` yields the true presentation duration
    * (ticks/timescale, version 0 and 1 layouts), `moov/trak/tkhd` the
    * true track dimensions (16.16 fixed point; the video track is the
    * one with nonzero width). Sample data (`mdat`) stays opaque —
    * decoding frames needs codec libraries this environment doesn't
    * ship — so `avgLumaMilli` remains -1.
    */
  final class Mp4Codec extends MediaCodec {
    import BE.{read32 => be32, read64 => be64}

    private final class Parsed {
      var timescale = 0L; var durationTicks = -1L
      var width = 0; var height = 0
    }

    private def walk(b: Array[Byte], p: Parsed): Unit =
      BmffWalk.walk(b, 0L, b.length.toLong, Set("moov", "trak")) {
        (ctype, dataStart, end) =>
          val avail = end - dataStart
          ctype match {
            case "mvhd" if avail >= 4 =>
              val d = dataStart.toInt
              val version = b(d) & 0xff
              if (version == 1 && avail >= 32) {
                p.timescale = be32(b, d + 20)
                p.durationTicks = be64(b, d + 24)
              } else if (version == 0 && avail >= 20) {
                p.timescale = be32(b, d + 12)
                p.durationTicks = be32(b, d + 16)
              }
            case "tkhd" if avail >= 4 =>
              val d = dataStart.toInt
              val version = b(d) & 0xff
              val dimOff = if (version == 1) 88 else 76
              if (avail >= dimOff + 8) {
                val w = (be32(b, d + dimOff) >> 16).toInt     // 16.16 fixed
                val h = (be32(b, d + dimOff + 4) >> 16).toInt
                // several traks (audio has 0×0) — keep the video one
                if (w > 0 && h > 0) { p.width = w; p.height = h }
              }
            case _ => ()
          }
      }

    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val (digest, len) = metaOf(r)
        val p = new Parsed
        walk(r.content, p)
        val durMs =
          if (p.timescale > 0 && p.durationTicks >= 0)
            p.durationTicks * 1000L / p.timescale
          else 0L
        MediaFeatures(r.mediaId, r.mediaType, len, digest,
          width = p.width, height = p.height, durationMs = durMs,
          batchSize = batch.size)
      }
  }

  /** Zig-zag scan order (ITU-T T.81 figure 5): index in scan order →
    * natural row-major index. Shared by [[JpegCodec]] (de-zigzag on
    * decode) and [[JpegBuilder]] (zigzag on encode) — but correctness
    * of the PAIR is pinned against hand-written vectors and a naive
    * reference IDCT in MultimodalSpec, so a transposed table can't
    * hide behind its own inverse.
    */
  private[analytics] val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** REAL JPEG decode for baseline streams — no codec library. The
    * marker walk collects quantization (DQT) and Huffman (DHT)
    * tables, frame geometry (SOF), the restart interval (DRI) and
    * the scan header (SOS); for baseline DCT frames (SOF0) the
    * entropy-coded data is then fully decoded: canonical Huffman
    * (mincode/maxcode/valptr per T.81 F.2.2.3), DC prediction with
    * restart-marker resets, dequantization, de-zigzag, and a
    * separable double-precision IDCT. `avgLumaMilli` is the average
    * of the decoded luma plane over the VISIBLE area (edge-block
    * padding excluded) ×1000 — in JFIF the Y component IS Rec.601
    * luma, so no color conversion is needed (chroma blocks are still
    * entropy-decoded to keep bitstream position, their IDCT is
    * skipped). Progressive (SOF2) is decoded IN FULL — every scan's
    * spectral band and successive-approximation bits accumulate into
    * a coefficient store, then one dequantize+IDCT pass (see
    * decodeProgressive). Other non-baseline frames (lossless,
    * arithmetic-coded) keep the dims-only behavior with luma -1; any
    * malformed entropy stream degrades to dims-only rather than
    * failing the row.
    */
  final class JpegCodec extends MediaCodec {
    import JpegCodec._

    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val (digest, len) = metaOf(r)
        val st = new ParseState
        walkMarkers(r.content, st)
        val luma =
          if (st.canDecode)
            try {
              if (st.progressive) decodeProgressive(r.content, st)
              else decodeScan(r.content, st)
            } catch { case scala.util.control.NonFatal(_) => -1L }
          else -1L
        MediaFeatures(r.mediaId, r.mediaType, len, digest,
          width = st.width, height = st.height, durationMs = 0L,
          batchSize = batch.size, avgLumaMilli = luma)
      }
  }

  private[analytics] object JpegCodec {
    private final class Component {
      var id = 0; var h = 1; var v = 1; var tq = 0
      var dcTbl = 0; var acTbl = 0 // from SOS
      var inScan = false
    }

    /** One progressive scan: the selected components with their
      * per-scan table ids, the spectral band [ss, se], the successive
      * approximation bits (ah = prior point-transform, al = this
      * scan's), the entropy-data offset, and the Huffman tables AS OF
      * this scan (T.81 allows DHT segments between scans to redefine
      * ids, so the decode must use the snapshot, not the final state).
      */
    private final class ScanHeader(
        val sel: Array[(Component, Int, Int)], // (comp, dcTbl, acTbl)
        val ss: Int, val se: Int, val ah: Int, val al: Int,
        val entropyStart: Int,
        val dc: Array[Huff], val ac: Array[Huff],
        val restartInterval: Int)

    private final class ParseState {
      var width = 0; var height = 0
      var baseline = false
      var progressive = false
      var comps: Array[Component] = Array.empty
      val quant = new Array[Array[Int]](4) // zigzag order, per DQT id
      val huffDc = new Array[Huff](4)
      val huffAc = new Array[Huff](4)
      var restartInterval = 0
      var scanComps: Array[Component] = Array.empty
      var entropyStart = -1
      val scans = scala.collection.mutable.ArrayBuffer.empty[ScanHeader]
      def compsOk: Boolean = comps.nonEmpty && comps.forall { c =>
        c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4 && quant(c.tq) != null
      }
      def canDecode: Boolean =
        if (progressive)
          scans.nonEmpty && width > 0 && height > 0 &&
            width.toLong * height <= 64L * 1024 * 1024 && compsOk
        else
          baseline && entropyStart > 0 && width > 0 && height > 0 &&
            width.toLong * height <= 64L * 1024 * 1024 &&
            scanComps.nonEmpty && scanComps.forall { c =>
              c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4 &&
                c.dcTbl <= 3 && c.acTbl <= 3 && // SOS nibbles reach 15
                quant(c.tq) != null && huffDc(c.dcTbl) != null &&
                huffAc(c.acTbl) != null
            }
    }

    /** Canonical Huffman decode tables (T.81 annex C / F.2.2.3). */
    private final class Huff(counts: Array[Int], val symbols: Array[Int]) {
      val minCode = new Array[Int](17)
      val maxCode = Array.fill(17)(-1)
      val valPtr = new Array[Int](17)
      locally {
        var code = 0; var k = 0; var l = 1
        while (l <= 16) {
          if (counts(l) > 0) {
            valPtr(l) = k
            minCode(l) = code
            code += counts(l); k += counts(l)
            maxCode(l) = code - 1
          }
          code <<= 1
          l += 1
        }
      }
      def decode(br: BitReader): Int = {
        var code = 0; var l = 1
        while (l <= 16) {
          code = (code << 1) | br.bit()
          if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
            return symbols(valPtr(l) + code - minCode(l))
          l += 1
        }
        throw new IllegalArgumentException("invalid huffman code")
      }
    }

    /** MSB-first bit reader over entropy-coded data: 0xFF00 byte
      * stuffing is unstuffed, any other marker mid-stream is a
      * protocol error EXCEPT the expected restart markers, which
      * [[restart]] consumes after byte-aligning.
      */
    private final class BitReader(b: Array[Byte], var pos: Int) {
      private var acc = 0; private var n = 0
      def bit(): Int = {
        if (n == 0) {
          if (pos >= b.length)
            throw new IllegalArgumentException("entropy data truncated")
          var byte = b(pos) & 0xff; pos += 1
          if (byte == 0xff) {
            if (pos >= b.length || b(pos) != 0)
              throw new IllegalArgumentException("marker inside scan")
            pos += 1 // stuffed zero: datum really is 0xFF
            byte = 0xff
          }
          acc = byte; n = 8
        }
        n -= 1
        (acc >> n) & 1
      }
      def receive(s: Int): Int = {
        var v = 0; var i = 0
        while (i < s) { v = (v << 1) | bit(); i += 1 }
        v
      }
      /** Byte-align and consume the next restart marker, which must
        * be RST(expected mod 8).
        */
      def restart(expected: Int): Unit = {
        n = 0
        if (pos + 2 > b.length || (b(pos) & 0xff) != 0xff ||
            (b(pos + 1) & 0xff) != 0xd0 + (expected & 7))
          throw new IllegalArgumentException("expected restart marker")
        pos += 2
      }
    }

    /** DC/AC magnitude decode (T.81 F.2.2.1 EXTEND). */
    private def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

    private def isSof(m: Int): Boolean =
      m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

    private def walkMarkers(b: Array[Byte], st: ParseState): Unit = {
      var off = 2 // past SOI
      var done = false
      while (!done && off + 4 <= b.length) {
        if ((b(off) & 0xff) != 0xff) done = true // lost sync
        else {
          val marker = b(off + 1) & 0xff
          if (marker == 0xff) off += 1 // fill byte
          else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
            off += 2 // standalone marker, no length
          } else if (marker == 0xd9) {
            done = true // EOI
          } else {
            val segLen = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
            if (segLen < 2 || off + 2 + segLen > b.length) done = true
            else {
              val data = off + 4; val end = off + 2 + segLen
              var next = end // SOS may move it past the entropy data
              marker match {
                case m if isSof(m) && segLen >= 7 =>
                  st.baseline = m == 0xc0
                  st.progressive = m == 0xc2
                  st.height = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
                  st.width = ((b(off + 7) & 0xff) << 8) | (b(off + 8) & 0xff)
                  val nc = if (segLen >= 8) b(off + 9) & 0xff else 0
                  if (nc >= 1 && nc <= 4 && data + 6 + nc * 3 <= end) {
                    st.comps = Array.fill(nc)(new Component)
                    var i = 0
                    while (i < nc) {
                      val o = off + 10 + i * 3
                      st.comps(i).id = b(o) & 0xff
                      st.comps(i).h = (b(o + 1) & 0xff) >> 4
                      st.comps(i).v = b(o + 1) & 0x0f
                      st.comps(i).tq = b(o + 2) & 0x03
                      i += 1
                    }
                  } else st.baseline = false
                case 0xdb => // DQT: one or more tables per segment
                  var o = data
                  while (o + 1 + 64 <= end) {
                    val pq = (b(o) & 0xff) >> 4; val tq = b(o) & 0x03
                    val step = if (pq == 0) 1 else 2
                    if (o + 1 + 64 * step <= end) {
                      st.quant(tq) = Array.tabulate(64) { k =>
                        if (pq == 0) b(o + 1 + k) & 0xff
                        else ((b(o + 1 + 2 * k) & 0xff) << 8) |
                          (b(o + 2 + 2 * k) & 0xff)
                      }
                    }
                    o += 1 + 64 * step
                  }
                case 0xc4 => // DHT: one or more tables per segment
                  var o = data
                  while (o + 17 <= end) {
                    val cls = (b(o) & 0xff) >> 4; val tid = b(o) & 0x03
                    val counts = new Array[Int](17)
                    var total = 0; var l = 1
                    while (l <= 16) {
                      counts(l) = b(o + l) & 0xff; total += counts(l); l += 1
                    }
                    if (o + 17 + total <= end && total <= 256) {
                      val syms = Array.tabulate(total)(i => b(o + 17 + i) & 0xff)
                      val h = new Huff(counts, syms)
                      if (cls == 0) st.huffDc(tid) = h else st.huffAc(tid) = h
                    }
                    o += 17 + total
                  }
                case 0xdd if segLen >= 4 => // DRI
                  st.restartInterval = ((b(data) & 0xff) << 8) | (b(data + 1) & 0xff)
                case 0xda => // SOS: scan header, then entropy data
                  val ns = b(data) & 0xff
                  if (ns >= 1 && ns <= 4 && data + 1 + ns * 2 + 3 <= end) {
                    val sel = Array.tabulate(ns) { i =>
                      val cid = b(data + 1 + i * 2) & 0xff
                      val tb = b(data + 2 + i * 2) & 0xff
                      st.comps.find(_.id == cid).map { c =>
                        c.dcTbl = tb >> 4; c.acTbl = tb & 0x0f
                        c.inScan = true; (c, tb >> 4, tb & 0x0f)
                      }
                    }
                    if (sel.forall(_.isDefined)) {
                      st.scanComps = sel.map(_.get._1)
                      st.entropyStart = end
                      if (st.progressive) {
                        val ss = b(data + 1 + ns * 2) & 0xff
                        val se = b(data + 2 + ns * 2) & 0xff
                        val ahal = b(data + 3 + ns * 2) & 0xff
                        st.scans += new ScanHeader(sel.map(_.get),
                          ss, se, ahal >> 4, ahal & 0x0f, end,
                          st.huffDc.clone(), st.huffAc.clone(),
                          st.restartInterval)
                      }
                    }
                  }
                  if (st.progressive) {
                    // skip the entropy-coded data to the next true
                    // marker (0xFF + non-zero, non-RST) and keep
                    // walking: later scans refine this one
                    var i = end
                    var found = -1
                    while (found < 0 && i + 1 < b.length) {
                      if ((b(i) & 0xff) == 0xff) {
                        val m2 = b(i + 1) & 0xff
                        if (m2 == 0x00 || (m2 >= 0xd0 && m2 <= 0xd7)) i += 2
                        else if (m2 == 0xff) i += 1 // fill byte
                        else found = i
                      } else i += 1
                    }
                    if (found < 0) done = true else next = found
                  } else {
                    done = true // baseline: first scan only
                  }
                case _ => ()
              }
              off = next
            }
          }
        }
      }
    }

    // IDCT basis: COS(x)(u) = cos((2x+1)·u·π/16), C(0)=1/√2
    private val IdctCos: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16.0))
    private val InvSqrt2 = 1.0 / math.sqrt(2.0)

    /** Separable IDCT of one dequantized block, summing the decoded
      * pixels that fall inside the component's visible area.
      */
    private def idctSumVisible(coef: Array[Int], bx: Int, by: Int,
        cw: Int, ch: Int): Long = {
      val visW = math.min(8, cw - bx * 8)
      val visH = math.min(8, ch - by * 8)
      if (visW <= 0 || visH <= 0) return 0L
      // rows: g(u, y) = Σ_v C(v)·F(u,v)·cos((2y+1)vπ/16)
      val g = new Array[Double](64)
      var u = 0
      while (u < 8) {
        var y = 0
        while (y < 8) {
          var s = 0.0; var v = 0
          while (v < 8) {
            val f = coef(v * 8 + u)
            if (f != 0)
              s += (if (v == 0) InvSqrt2 else 1.0) * f * IdctCos(y)(v)
            v += 1
          }
          g(u * 8 + y) = s
          y += 1
        }
        u += 1
      }
      var sum = 0L
      var yy = 0
      while (yy < visH) {
        var xx = 0
        while (xx < visW) {
          var s = 0.0; var uu = 0
          while (uu < 8) {
            s += (if (uu == 0) InvSqrt2 else 1.0) * g(uu * 8 + yy) * IdctCos(xx)(uu)
            uu += 1
          }
          val px = math.max(0, math.min(255, math.round(s / 4.0).toInt + 128))
          sum += px
          xx += 1
        }
        yy += 1
      }
      sum
    }

    /** Decode one data unit into natural-order dequantized
      * coefficients; returns the new DC predictor.
      */
    private def decodeBlock(br: BitReader, dcH: Huff, acH: Huff,
        pred: Int, qt: Array[Int], coef: Array[Int]): Int = {
      java.util.Arrays.fill(coef, 0)
      val s = dcH.decode(br)
      if (s > 15) throw new IllegalArgumentException("bad DC category")
      val dc = pred + extend(br.receive(s), s)
      coef(0) = dc * qt(0)
      var k = 1
      while (k < 64) {
        val rs = acH.decode(br)
        val run = rs >> 4; val sz = rs & 0x0f
        if (sz == 0) {
          if (run == 15) k += 16 // ZRL: sixteen zeros
          else k = 64 // EOB
        } else {
          k += run
          if (k > 63) throw new IllegalArgumentException("AC index overflow")
          coef(JpegZigzag(k)) = extend(br.receive(sz), sz) * qt(k)
          k += 1
        }
      }
      dc
    }

    /** Full entropy decode of the (single) scan; returns the visible
      * luma-plane average ×1000. The luma component is the FIRST
      * frame component (JFIF: Y precedes Cb/Cr).
      */
    private def decodeScan(b: Array[Byte], st: ParseState): Long = {
      val hMax = st.comps.map(_.h).max
      val vMax = st.comps.map(_.v).max
      val lumaC = st.comps(0)
      val br = new BitReader(b, st.entropyStart)
      val coef = new Array[Int](64)
      val preds = new Array[Int](st.scanComps.length)
      var lumaSum = 0L
      var mcuIdx = 0; var rstIdx = 0

      def maybeRestart(): Unit =
        if (st.restartInterval > 0 && mcuIdx > 0 &&
            mcuIdx % st.restartInterval == 0) {
          br.restart(rstIdx)
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(preds, 0)
        }

      def compDims(c: Component): (Int, Int) =
        (ceilDiv(st.width * c.h, hMax), ceilDiv(st.height * c.v, vMax))

      if (st.scanComps.length == 1) {
        // non-interleaved: one data unit per MCU, raster over the
        // component's own block grid (T.81 A.2.2)
        val c = st.scanComps(0)
        val (cw, ch) = compDims(c)
        val bxs = ceilDiv(cw, 8); val bys = ceilDiv(ch, 8)
        val qt = st.quant(c.tq)
        var by = 0
        while (by < bys) {
          var bx = 0
          while (bx < bxs) {
            maybeRestart()
            preds(0) = decodeBlock(br, st.huffDc(c.dcTbl), st.huffAc(c.acTbl),
              preds(0), qt, coef)
            if (c eq lumaC) lumaSum += idctSumVisible(coef, bx, by, cw, ch)
            mcuIdx += 1
            bx += 1
          }
          by += 1
        }
        if (c eq lumaC) lumaSum * 1000L / (cw.toLong * ch) else -1L
      } else {
        // interleaved: per MCU each component contributes v×h blocks
        val mcusX = ceilDiv(st.width, 8 * hMax)
        val mcusY = ceilDiv(st.height, 8 * vMax)
        val (lw, lh) = compDims(lumaC)
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            var ci = 0
            while (ci < st.scanComps.length) {
              val c = st.scanComps(ci)
              val qt = st.quant(c.tq)
              var i = 0
              while (i < c.v) {
                var j = 0
                while (j < c.h) {
                  preds(ci) = decodeBlock(br, st.huffDc(c.dcTbl),
                    st.huffAc(c.acTbl), preds(ci), qt, coef)
                  if (c eq lumaC)
                    lumaSum += idctSumVisible(coef,
                      mx * c.h + j, my * c.v + i, lw, lh)
                  j += 1
                }
                i += 1
              }
              ci += 1
            }
            mcuIdx += 1
            mx += 1
          }
          my += 1
        }
        if (lumaC.inScan) lumaSum * 1000L / (lw.toLong * lh) else -1L
      }
    }

    /** Full progressive (SOF2) decode of the luma plane: every scan's
      * entropy data is applied to a per-component DCT-coefficient
      * store — DC first/refinement (T.81 G.1.2.1), AC spectral bands
      * with EOB runs and AC successive-approximation refinement
      * (G.1.2.2/G.1.2.3) — then one dequantize + IDCT pass over the
      * finished coefficients, summing the visible luma exactly like
      * the baseline path. Returns avg luma ×1000.
      */
    private def decodeProgressive(b: Array[Byte], st: ParseState): Long = {
      val hMax = st.comps.map(_.h).max
      val vMax = st.comps.map(_.v).max
      val lumaC = st.comps(0)
      val mcusX = ceilDiv(st.width, 8 * hMax)
      val mcusY = ceilDiv(st.height, 8 * vMax)
      // per-component coefficient store over the padded MCU block
      // grid, each block 64 ints in ZIGZAG order (dequantize at the
      // end — progressive scans accumulate raw coefficient bits)
      val gridW = st.comps.map(c => mcusX * c.h)
      val gridH = st.comps.map(c => mcusY * c.v)
      val coefs = st.comps.indices.map(i =>
        new Array[Int](gridW(i) * gridH(i) * 64)).toArray
      val compIdx = st.comps.zipWithIndex.toMap

      def compDims(c: Component): (Int, Int) =
        (ceilDiv(st.width * c.h, hMax), ceilDiv(st.height * c.v, vMax))

      for (sc <- st.scans) {
        val br = new BitReader(b, sc.entropyStart)
        var eobrun = 0
        var mcuIdx = 0; var rstIdx = 0
        val preds = new Array[Int](sc.sel.length)
        def maybeRestart(): Unit =
          if (sc.restartInterval > 0 && mcuIdx > 0 &&
              mcuIdx % sc.restartInterval == 0) {
            br.restart(rstIdx)
            rstIdx = (rstIdx + 1) & 7
            java.util.Arrays.fill(preds, 0)
            eobrun = 0
          }
        if (sc.ss == 0) {
          // DC scan (se must be 0): interleaved over the MCU grid
          // when several components are selected, else raster over
          // the single component's own block grid
          if (sc.se != 0)
            throw new IllegalArgumentException("DC scan with se != 0")
          def dcUnit(ci: Int, base: Int, dcH: Huff): Unit =
            if (sc.ah == 0) {
              val s = dcH.decode(br)
              if (s > 15) throw new IllegalArgumentException("bad DC category")
              preds(ci) += extend(br.receive(s), s)
              coefs(ci)(base) = preds(ci) << sc.al
            } else {
              if (br.bit() == 1) coefs(ci)(base + 0) += (1 << sc.al)
            }
          if (sc.sel.length == 1) {
            val (c, dcT, _) = sc.sel(0)
            val gi = compIdx(c)
            val (cw, ch) = compDims(c)
            val bxs = ceilDiv(cw, 8); val bys = ceilDiv(ch, 8)
            val dcH = if (sc.ah == 0) needDc(sc, dcT) else null
            var by = 0
            while (by < bys) {
              var bx = 0
              while (bx < bxs) {
                maybeRestart()
                dcUnit(0, (by * gridW(gi) + bx) * 64, dcH)
                mcuIdx += 1; bx += 1
              }
              by += 1
            }
          } else {
            var my = 0
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                maybeRestart()
                var ci = 0
                while (ci < sc.sel.length) {
                  val (c, dcT, _) = sc.sel(ci)
                  val gi = compIdx(c)
                  val dcH = if (sc.ah == 0) needDc(sc, dcT) else null
                  var i = 0
                  while (i < c.v) {
                    var j = 0
                    while (j < c.h) {
                      val base =
                        ((my * c.v + i) * gridW(gi) + (mx * c.h + j)) * 64
                      dcUnit(ci, base, dcH)
                      j += 1
                    }
                    i += 1
                  }
                  ci += 1
                }
                mcuIdx += 1; mx += 1
              }
              my += 1
            }
          }
        } else {
          // AC scan: T.81 mandates exactly one component,
          // non-interleaved over the component's own block grid
          if (sc.sel.length != 1)
            throw new IllegalArgumentException("interleaved AC scan")
          val (c, _, acT) = sc.sel(0)
          val gi = compIdx(c)
          val acH = needAc(sc, acT)
          val (cw, ch) = compDims(c)
          val bxs = ceilDiv(cw, 8); val bys = ceilDiv(ch, 8)
          val coef = coefs(gi)
          val p1 = 1 << sc.al
          var by = 0
          while (by < bys) {
            var bx = 0
            while (bx < bxs) {
              maybeRestart()
              val base = (by * gridW(gi) + bx) * 64
              if (sc.ah == 0) {
                // first AC scan of this band at this precision
                if (eobrun > 0) eobrun -= 1
                else {
                  var k = sc.ss
                  var stop = false
                  while (!stop && k <= sc.se) {
                    val rs = acH.decode(br)
                    val r = rs >> 4; val s = rs & 0x0f
                    if (s == 0) {
                      if (r < 15) {
                        eobrun = (1 << r) - 1
                        if (r > 0) eobrun += br.receive(r)
                        stop = true
                      } else k += 16 // ZRL
                    } else {
                      k += r
                      if (k > sc.se)
                        throw new IllegalArgumentException("AC index overflow")
                      coef(base + k) = extend(br.receive(s), s) << sc.al
                      k += 1
                    }
                  }
                }
              } else {
                // refinement (T.81 G.1.2.3): one correction bit per
                // already-nonzero coefficient along the way; run
                // codes position new ±p1 coefficients among the
                // ZERO-HISTORY slots (decrement-then-test, so ZRL
                // skips exactly 16 of them); an EOB code refines the
                // rest of the band and starts an EOB run
                def refineBit(idx: Int): Unit =
                  if (br.bit() == 1 && (coef(idx) & p1) == 0)
                    coef(idx) += (if (coef(idx) >= 0) p1 else -p1)
                var k = sc.ss
                if (eobrun == 0) {
                  var atEob = false
                  while (!atEob && k <= sc.se) {
                    val rs = acH.decode(br)
                    var r = rs >> 4; val s = rs & 0x0f
                    var newval = 0
                    if (s != 0) {
                      if (s != 1)
                        throw new IllegalArgumentException(
                          "bad refinement magnitude")
                      newval = if (br.bit() == 1) p1 else -p1
                    } else if (r != 15) {
                      eobrun = 1 << r
                      if (r > 0) eobrun += br.receive(r)
                      atEob = true // rest of band handled below
                    }
                    if (!atEob) {
                      var hitRun = false
                      while (!hitRun && k <= sc.se) {
                        val idx = base + k
                        if (coef(idx) != 0) refineBit(idx)
                        else { r -= 1; if (r < 0) hitRun = true }
                        if (!hitRun) k += 1
                      }
                      if (newval != 0) {
                        if (k > sc.se)
                          throw new IllegalArgumentException(
                            "refinement run past band end")
                        coef(base + k) = newval
                      }
                      k += 1
                    }
                  }
                }
                if (eobrun > 0) {
                  while (k <= sc.se) {
                    if (coef(base + k) != 0) refineBit(base + k)
                    k += 1
                  }
                  eobrun -= 1
                }
              }
              mcuIdx += 1; bx += 1
            }
            by += 1
          }
        }
      }

      // final pass: dequantize + IDCT the luma component's visible
      // blocks (chroma coefficients were tracked only to keep each
      // scan's bitstream position honest; no color conversion needed)
      val gi = compIdx(lumaC)
      val qt = st.quant(lumaC.tq)
      val (lw, lh) = compDims(lumaC)
      val bxs = ceilDiv(lw, 8); val bys = ceilDiv(lh, 8)
      val natural = new Array[Int](64)
      val coef = coefs(gi)
      var lumaSum = 0L
      var by = 0
      while (by < bys) {
        var bx = 0
        while (bx < bxs) {
          val base = (by * gridW(gi) + bx) * 64
          var k = 0
          while (k < 64) {
            natural(JpegZigzag(k)) = coef(base + k) * qt(k)
            k += 1
          }
          lumaSum += idctSumVisible(natural, bx, by, lw, lh)
          bx += 1
        }
        by += 1
      }
      lumaSum * 1000L / (lw.toLong * lh)
    }

    private def needDc(sc: ScanHeader, t: Int): Huff = {
      val h = if (t <= 3) sc.dc(t) else null
      if (h == null)
        throw new IllegalArgumentException(s"missing DC huffman table $t")
      h
    }

    private def needAc(sc: ScanHeader, t: Int): Huff = {
      val h = if (t <= 3) sc.ac(t) else null
      if (h == null)
        throw new IllegalArgumentException(s"missing AC huffman table $t")
      h
    }

    private def ceilDiv(a: Int, d: Int): Int = (a + d - 1) / d
  }

  /** REAL frame-sample index for ISO BMFF — the sample tables under
    * `moov/trak/mdia/minf/stbl` are pure box arithmetic: `stss` lists
    * the sync (key) samples, `stsc` maps chunks to samples-per-chunk,
    * `stco`/`co64` the chunk byte offsets, `stsz` the sample sizes.
    * Combining them yields the true byte offset of every keyframe —
    * the container-seek a frame-sampling pipeline does before handing
    * the (still opaque) sample bytes to a decoder. No stss box means
    * every sample is a sync sample, per the spec.
    */
  object Mp4Index {
    import BE.{read32 => be32, read64 => be64}

    private final class Tables {
      var stss: Array[Int] = null // sync sample numbers (1-based); null = all
      var stsc: Array[(Long, Long)] = Array.empty // (firstChunk, samplesPerChunk)
      var chunkOffsets: Array[Long] = Array.empty
      var uniformSize = 0L
      var sizes: Array[Long] = null
      var sampleCount = 0
    }

    /** Entry count guarded by the bytes actually present: a crafted
      * count can't force a huge allocation or an OOB read.
      */
    private def entryCount(b: Array[Byte], data: Int, end: Long,
        entryBytes: Int): Int = {
      val declared = be32(b, data + 4)
      val fits = (end - data - 8) / entryBytes
      math.min(declared, fits).toInt.max(0)
    }

    /** Uniform-stsz sample counts consume no table bytes, so the
      * byte-backed `entryCount` guard can't apply; this cap bounds the
      * work a declared count can force instead. 1M samples ≈ 11 hours
      * of 24 fps video — far past any real index, and 2^31 iterations
      * short of the loop a crafted count could otherwise spin.
      */
    private val MaxUniformSamples = 1 << 20

    private def walk(b: Array[Byte], t: Tables): Unit =
      BmffWalk.walk(b, 0L, b.length.toLong,
          Set("moov", "trak", "mdia", "minf", "stbl")) {
        (ctype, dataStart, end) =>
          val data = dataStart.toInt
          ctype match {
            case "stss" if end - data >= 8 =>
              val n = entryCount(b, data, end, 4)
              t.stss = Array.tabulate(n)(i => be32(b, data + 8 + i * 4).toInt)
            case "stsc" if end - data >= 8 =>
              val n = entryCount(b, data, end, 12)
              t.stsc = Array.tabulate(n)(i =>
                (be32(b, data + 8 + i * 12), be32(b, data + 12 + i * 12)))
            case "stco" if end - data >= 8 =>
              val n = entryCount(b, data, end, 4)
              t.chunkOffsets = Array.tabulate(n)(i => be32(b, data + 8 + i * 4))
            case "co64" if end - data >= 8 =>
              val n = entryCount(b, data, end, 8)
              t.chunkOffsets = Array.tabulate(n)(i => be64(b, data + 8 + i * 8))
            case "stsz" if end - data >= 12 =>
              t.uniformSize = be32(b, data + 4)
              t.sampleCount = math.min(be32(b, data + 8),
                if (t.uniformSize == 0) (end - data - 12) / 4
                else MaxUniformSamples.toLong)
                .toInt.max(0)
              if (t.uniformSize == 0)
                t.sizes = Array.tabulate(t.sampleCount)(i =>
                  be32(b, data + 12 + i * 4))
            case _ => ()
          }
      }

    /** (sampleNumber, byteOffset) of every sync sample, in sample
      * order. Empty when the container carries no usable index.
      */
    def syncSampleOffsets(b: Array[Byte]): Seq[(Int, Long)] =
      syncSampleRanges(b).map { case (sample, off, _) => (sample, off) }

    /** Sync samples with their EXACT byte ranges: (sample number,
      * offset, size). The size comes straight from stsz — consumers
      * slicing [off, off+size) stay correct even when trailing boxes
      * (`free`, moov-after-mdat) follow the media data, where
      * "end = next offset or container end" would append foreign
      * bytes to the last sample.
      */
    def syncSampleRanges(b: Array[Byte]): Seq[(Int, Long, Long)] = {
      val t = new Tables
      try walk(b, t)
      catch { case scala.util.control.NonFatal(_) => return Nil }
      if (t.chunkOffsets.isEmpty || t.stsc.isEmpty || t.sampleCount <= 0)
        return Nil
      val syncSet: Int => Boolean =
        if (t.stss == null) _ => true else t.stss.toSet
      val out = Seq.newBuilder[(Int, Long, Long)]
      var sample = 1
      var ci = 0
      while (ci < t.chunkOffsets.length && sample <= t.sampleCount) {
        val chunkNo = ci + 1
        // stsc entries cover chunk runs: the governing entry is the
        // last one whose first_chunk <= this chunk
        var spc = 0L
        var e = 0
        while (e < t.stsc.length && t.stsc(e)._1 <= chunkNo) {
          spc = t.stsc(e)._2; e += 1
        }
        var off = t.chunkOffsets(ci)
        var k = 0L
        while (k < spc && sample <= t.sampleCount) {
          val size = if (t.sizes != null) t.sizes(sample - 1) else t.uniformSize
          if (syncSet(sample)) out += ((sample, off, size))
          off += size
          sample += 1; k += 1
        }
        ci += 1
      }
      out.result()
    }
  }

  /** ISO BMFF ENCODER for the metadata skeleton — ftyp + moov(mvhd +
    * trak(tkhd)), version 0 or 1 layouts. The deterministic-media
    * generator for tests and oracle-checked queries: every field the
    * [[Mp4Codec]] walk reads is placed by explicit offset arithmetic,
    * so a decode match proves the walk against an independently
    * constructed container.
    */
  object Mp4Builder {
    import BE.{write32 => be32, write64 => be64}
    private def box(ctype: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ ctype.getBytes("US-ASCII") ++ payload

    def minimal(timescale: Long, durationTicks: Long, width: Int,
        height: Int, version1: Boolean = false): Array[Byte] = {
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
      val mvhd =
        if (version1)
          box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
            be32(timescale) ++ be64(durationTicks) ++ new Array[Byte](80))
        else
          box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
            be32(timescale) ++ be32(durationTicks) ++ new Array[Byte](80))
      val tkhd =
        if (version1)
          box("tkhd", Array[Byte](1, 0, 0, 7) ++ new Array[Byte](84) ++
            be32(width.toLong << 16) ++ be32(height.toLong << 16))
        else
          box("tkhd", Array[Byte](0, 0, 0, 7) ++ new Array[Byte](72) ++
            be32(width.toLong << 16) ++ be32(height.toLong << 16))
      ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
    }

    /** Container with a full sample index under trak/mdia/minf/stbl:
      * stss (sync samples), stsc (one run: every chunk holds
      * `samplesPerChunk`), stsz (uniform when `uniformSize` > 0, else
      * the explicit `sampleSizes` table) and stco (chunk offsets).
      * Every field [[Mp4Index]] reads is placed by independent offset
      * arithmetic.
      */
    def withSampleIndex(timescale: Long, durationTicks: Long,
        width: Int, height: Int, sampleCount: Int, uniformSize: Long,
        sampleSizes: Seq[Long], samplesPerChunk: Int,
        chunkOffsets: Seq[Long], syncSamples: Seq[Int]): Array[Byte] = {
      val full0 = Array[Byte](0, 0, 0, 0)
      val stss = box("stss", full0 ++ be32(syncSamples.length.toLong) ++
        syncSamples.flatMap(s => be32(s.toLong)).toArray)
      val stsc = box("stsc", full0 ++ be32(1L) ++
        be32(1L) ++ be32(samplesPerChunk.toLong) ++ be32(1L))
      val stsz = box("stsz", full0 ++ be32(uniformSize) ++
        be32(sampleCount.toLong) ++
        (if (uniformSize > 0) Array.emptyByteArray
         else sampleSizes.flatMap(be32).toArray))
      val stco = box("stco", full0 ++ be32(chunkOffsets.length.toLong) ++
        chunkOffsets.flatMap(be32).toArray)
      val stbl = box("stbl", stss ++ stsc ++ stsz ++ stco)
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7) ++ new Array[Byte](72) ++
        be32(width.toLong << 16) ++ be32(height.toLong << 16))
      val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(timescale) ++ be32(durationTicks) ++ new Array[Byte](80))
      val trak = box("trak", tkhd ++ box("mdia", box("minf", stbl)))
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
      ftyp ++ box("moov", mvhd ++ trak)
    }
  }

  /** JPEG ENCODER — both the marker skeleton ([[headerOnly]]) and
    * REAL baseline entropy-coded streams ([[baselineGrey]],
    * [[baseline420]]) built from caller-supplied QUANTIZED
    * coefficient blocks: zigzag, DC differencing with restart
    * resets, run-length AC symbols (ZRL/EOB), canonical Huffman
    * tables generated from the symbols actually used and declared
    * via DHT, 0xFF00 byte stuffing. The deterministic-media
    * generator for [[JpegCodec]] tests and oracle-checked queries;
    * every field the decoder reads is placed by independent
    * arithmetic here.
    */
  object JpegBuilder {
    def headerOnly(width: Int, height: Int,
        progressive: Boolean = false): Array[Byte] = {
      val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16,
        'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
      val sofMarker = if (progressive) 0xc2 else 0xc0
      val sof = Array[Byte](0xff.toByte, sofMarker.toByte, 0, 11, 8,
        ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
        ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
        1, 0x11, 0)
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof ++
        Array[Byte](0xff.toByte, 0xd9.toByte)
    }

    /** Baseline grayscale: one component, one non-interleaved scan,
      * blocks in raster order over the ceil(w/8)×ceil(h/8) grid.
      * `block(bx, by)` returns 64 QUANTIZED coefficients in natural
      * row-major order; `quant` likewise natural order (values
      * 1..255). `restartInterval` > 0 inserts RSTn every that many
      * blocks and resets DC prediction.
      */
    def baselineGrey(width: Int, height: Int, quant: Array[Int],
        block: (Int, Int) => Array[Int],
        restartInterval: Int = 0): Array[Byte] = {
      val bxs = (width + 7) / 8; val bys = (height + 7) / 8
      val blocks = for (by <- 0 until bys; bx <- 0 until bxs)
        yield (0, block(bx, by))
      encode(width, height,
        comps = Seq(CompSpec(id = 1, h = 1, v = 1, tq = 0, tdc = 0, tac = 0)),
        quants = Seq(quant), scanBlocks = blocks, restartInterval)
    }

    /** Like [[baselineGrey]] but with the DC and AC Huffman selections
      * split across table ids (tdc = 0, tac = 1) — a wiring T.81
      * permits per component. Pins the encoder's DHT emission deriving
      * the AC table set from `tac`, not from `tdc`.
      */
    def baselineGreySplitTables(width: Int, height: Int, quant: Array[Int],
        block: (Int, Int) => Array[Int]): Array[Byte] = {
      val bxs = (width + 7) / 8; val bys = (height + 7) / 8
      val blocks = for (by <- 0 until bys; bx <- 0 until bxs)
        yield (0, block(bx, by))
      encode(width, height,
        comps = Seq(CompSpec(id = 1, h = 1, v = 1, tq = 0, tdc = 0, tac = 1)),
        quants = Seq(quant), scanBlocks = blocks, restartInterval = 0)
    }

    /** Baseline 4:2:0 YCbCr: Y sampled 2×2 (quant/huffman table 0),
      * Cb and Cr 1×1 (table 1), one interleaved scan. Y blocks are
      * addressed on the FULL-resolution block grid (including MCU
      * padding blocks when ceil(w/8) or ceil(h/8) is odd); chroma
      * blocks on the half-resolution grid — exactly the geometry the
      * decoder must reconstruct.
      */
    def baseline420(width: Int, height: Int,
        quantY: Array[Int], yBlock: (Int, Int) => Array[Int],
        quantC: Array[Int], cbBlock: (Int, Int) => Array[Int],
        crBlock: (Int, Int) => Array[Int]): Array[Byte] = {
      val mcusX = (width + 15) / 16; val mcusY = (height + 15) / 16
      val blocks = for {
        my <- 0 until mcusY; mx <- 0 until mcusX
        (ci, blk) <- (for (i <- 0 until 2; j <- 0 until 2)
            yield (0, yBlock(mx * 2 + j, my * 2 + i))) ++
          Seq((1, cbBlock(mx, my)), (2, crBlock(mx, my)))
      } yield (ci, blk)
      encode(width, height,
        comps = Seq(
          CompSpec(id = 1, h = 2, v = 2, tq = 0, tdc = 0, tac = 0),
          CompSpec(id = 2, h = 1, v = 1, tq = 1, tdc = 1, tac = 1),
          CompSpec(id = 3, h = 1, v = 1, tq = 1, tdc = 1, tac = 1)),
        quants = Seq(quantY, quantC), scanBlocks = blocks,
        restartInterval = 0)
    }

    /** PROGRESSIVE (SOF2) grayscale encoder: one component, the scan
      * script given as (ss, se, ah, al) tuples — spectral-selection
      * bands and successive-approximation bits, exactly T.81 annex G.
      * DC first scans send diffs of the POINT-TRANSFORMED value
      * (arithmetic >> al), DC refinements one raw bit per block; AC
      * first scans run-length code the toward-zero-shifted band with
      * per-block EOB, AC refinements interleave correction bits with
      * run codes the way G.1.2.3's decoder consumes them (buffered
      * bits flush after the next symbol; ZRL drains at every reached
      * nonzero, guarded by the last-newly-nonzero position so
      * trailing zeros fold into the EOB). Exists so [[JpegCodec]]'s
      * progressive path is testable against the baseline decode of
      * the SAME coefficients — the two must agree bit-exactly.
      */
    def progressiveGrey(width: Int, height: Int, quant: Array[Int],
        block: (Int, Int) => Array[Int],
        script: Seq[(Int, Int, Int, Int)]): Array[Byte] = {
      val bxs = (width + 7) / 8; val bys = (height + 7) / 8
      // zigzag-order quantized coefficients per block, raster order
      val zz = (for (by <- 0 until bys; bx <- 0 until bxs) yield {
        val nat = block(bx, by)
        Array.tabulate(64)(k => nat(JpegZigzag(k)))
      }).toArray

      // AC point transform: divide by 2^al toward zero (G.1.2.2);
      // DC uses plain arithmetic shift (G.1.2.1)
      def towardZero(v: Int, al: Int): Int =
        if (v >= 0) v >> al else -((-v) >> al)

      val out = new java.io.ByteArrayOutputStream()
      def seg(marker: Int, payload: Array[Byte]): Unit = {
        out.write(0xff); out.write(marker)
        val l = payload.length + 2
        out.write((l >> 8) & 0xff); out.write(l & 0xff)
        out.write(payload, 0, payload.length)
      }
      out.write(0xff); out.write(0xd8) // SOI
      seg(0xdb, Array(0.toByte) ++
        Array.tabulate(64)(k => quant(JpegZigzag(k)).toByte))
      seg(0xc2, Array[Byte](8,
        ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
        ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
        1, 1, 0x11, 0))

      for ((ss, se, ah, al) <- script) {
        val isDc = ss == 0
        // one walk over all blocks; pass 1 collects Huffman symbols,
        // pass 2 writes bits — identical traversal both times
        def walkScan(emitSym: (Int, Int, Int) => Unit,
            emitBit: Int => Unit): Unit = {
          var pred = 0
          zz.foreach { blk =>
            if (isDc) {
              if (ah == 0) {
                val v = blk(0) >> al
                val diff = v - pred; pred = v
                val s = category(diff)
                emitSym(s, if (s == 0) 0 else extraBits(diff, s), s)
              } else emitBit((blk(0) >> al) & 1)
            } else if (ah == 0) {
              var r = 0; var k = ss
              while (k <= se) {
                val v = towardZero(blk(k), al)
                if (v == 0) r += 1
                else {
                  while (r > 15) { emitSym(0xf0, 0, 0); r -= 16 }
                  val s = category(v)
                  emitSym((r << 4) | s, extraBits(v, s), s)
                  r = 0
                }
                k += 1
              }
              if (r > 0) emitSym(0x00, 0, 0) // per-block EOB
            } else {
              // refinement: t = |v| at this precision; t>1 = history
              // coefficient (buffer its next bit), t==1 = newly
              // nonzero (run code + sign), t==0 counts into the run
              var eobPos = ss - 1
              var k = ss
              while (k <= se) {
                if (math.abs(towardZero(blk(k), al)) == 1) eobPos = k
                k += 1
              }
              var r = 0
              val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
              def flush(): Unit = { pending.foreach(emitBit); pending.clear() }
              k = ss
              while (k <= se) {
                val cur = towardZero(blk(k), al)
                val t = math.abs(cur)
                if (t == 0) r += 1
                else {
                  while (r > 15 && k <= eobPos) {
                    emitSym(0xf0, 0, 0); r -= 16; flush()
                  }
                  if (t > 1) pending += (t & 1)
                  else {
                    emitSym((r << 4) | 1, 0, 0)
                    emitBit(if (cur > 0) 1 else 0)
                    flush()
                    r = 0
                  }
                }
                k += 1
              }
              if (r > 0 || pending.nonEmpty) { emitSym(0x00, 0, 0); flush() }
            }
          }
        }

        // pass 1: the scan's Huffman alphabet (DC refinements are
        // raw bits only — no table, no DHT)
        val syms = scala.collection.mutable.SortedSet.empty[Int]
        walkScan((s, _, _) => syms += s, _ => ())
        val needHuff = !(isDc && ah != 0)
        val sorted = syms.toArray
        val n = math.max(1, sorted.length)
        val len = 32 - Integer.numberOfLeadingZeros(n)
        val codes = sorted.zipWithIndex.map { case (s, i) => s -> (i, len) }.toMap
        if (needHuff) {
          val counts = new Array[Byte](16)
          counts(len - 1) = sorted.length.toByte
          seg(0xc4, Array((if (isDc) 0x00 else 0x10).toByte) ++
            counts ++ sorted.map(_.toByte))
        }
        seg(0xda, Array[Byte](1, 1, 0x00,
          ss.toByte, se.toByte, ((ah << 4) | al).toByte))

        // pass 2: entropy-coded data
        val bw = new BitWriter(out)
        walkScan(
          (sym, extra, ebits) => {
            val (code, clen) = codes(sym)
            bw.put(code, clen)
            if (ebits > 0) bw.put(extra, ebits)
          },
          bit => bw.put(bit, 1))
        bw.flushOnes()
      }
      out.write(0xff); out.write(0xd9) // EOI
      out.toByteArray
    }

    private final case class CompSpec(
        id: Int, h: Int, v: Int, tq: Int, tdc: Int, tac: Int)

    /** MSB-first bit writer with JPEG byte stuffing (0xFF → 0xFF00)
      * and 1-padding on flush (T.81 F.1.2.3).
      */
    private final class BitWriter(out: java.io.ByteArrayOutputStream) {
      private var acc = 0; private var n = 0
      def put(v: Int, bits: Int): Unit = {
        var i = bits - 1
        while (i >= 0) { putBit((v >> i) & 1); i -= 1 }
      }
      private def putBit(b: Int): Unit = {
        acc = (acc << 1) | b; n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0)
          acc = 0; n = 0
        }
      }
      def flushOnes(): Unit = while (n != 0) putBit(1)
    }

    private def category(v: Int): Int =
      32 - Integer.numberOfLeadingZeros(math.abs(v))

    private def extraBits(v: Int, s: Int): Int =
      if (v >= 0) v else v + (1 << s) - 1

    /** MCUs are `scanBlocks` grouped by component-sequence; a "unit"
      * here is one (scan-component-index, coefficients) pair in scan
      * order. Two passes over the same unit stream: first collects
      * the Huffman symbol alphabets, second writes bits — so the DHT
      * tables declared are exactly the codes used.
      */
    private def encode(width: Int, height: Int, comps: Seq[CompSpec],
        quants: Seq[Array[Int]], scanBlocks: Seq[(Int, Array[Int])],
        restartInterval: Int): Array[Byte] = {
      val unitsPerMcu = comps.map(c => c.h * c.v).sum
      // pass 1: symbol alphabets per (class, table id)
      val dcSyms = Array.fill(2)(scala.collection.mutable.SortedSet.empty[Int])
      val acSyms = Array.fill(2)(scala.collection.mutable.SortedSet.empty[Int])
      def walk(onDc: (Int, Int, Int) => Unit, onAc: (Int, Int, Int, Int) => Unit,
          onRestart: Int => Unit): Unit = {
        val preds = new Array[Int](comps.length)
        var unit = 0; var mcu = 0; var rst = 0
        scanBlocks.foreach { case (ci, blk) =>
          if (unit == 0 && restartInterval > 0 && mcu > 0 &&
              mcu % restartInterval == 0) {
            onRestart(rst); rst = (rst + 1) & 7
            java.util.Arrays.fill(preds, 0)
          }
          val c = comps(ci)
          val diff = blk(0) - preds(ci); preds(ci) = blk(0)
          val s = category(diff)
          onDc(c.tdc, s, if (s == 0) 0 else extraBits(diff, s))
          var k = 1; var run = 0
          while (k < 64) {
            val v = blk(JpegZigzag(k))
            if (v == 0) run += 1
            else {
              while (run >= 16) { onAc(c.tac, 0xf0, 0, 0); run -= 16 }
              val sz = category(v)
              onAc(c.tac, (run << 4) | sz, extraBits(v, sz), sz)
              run = 0
            }
            k += 1
          }
          if (run > 0) onAc(c.tac, 0x00, 0, 0) // EOB
          unit += 1
          if (unit == unitsPerMcu) { unit = 0; mcu += 1 }
        }
      }
      walk((t, s, _) => dcSyms(t) += s,
        (t, sym, _, _) => acSyms(t) += sym, _ => ())

      // canonical uniform-length codes: n symbols at length
      // ceil(log2(n+1)) — Kraft-satisfying and the all-ones code
      // stays unused, as T.81 requires
      def table(syms: Iterable[Int]): (Map[Int, (Int, Int)], Array[Byte]) = {
        val sorted = syms.toArray.sorted
        val n = math.max(1, sorted.length)
        val len = 32 - Integer.numberOfLeadingZeros(n) // ceil(log2(n+1))
        val codes = sorted.zipWithIndex.map { case (s, i) => s -> (i, len) }.toMap
        val counts = new Array[Byte](16)
        counts(len - 1) = sorted.length.toByte
        (codes, counts ++ sorted.map(_.toByte))
      }
      // DC and AC table ids are independent selections (a component
      // may pair tdc=0 with tac=1) — derive each set from its own field
      val dcUsed = comps.map(_.tdc).distinct.sorted
      val acUsed = comps.map(_.tac).distinct.sorted
      val dcTables = dcUsed.map(t => t -> table(dcSyms(t))).toMap
      val acTables = acUsed.map(t => t -> table(acSyms(t))).toMap

      val out = new java.io.ByteArrayOutputStream()
      def seg(marker: Int, payload: Array[Byte]): Unit = {
        out.write(0xff); out.write(marker)
        val l = payload.length + 2
        out.write((l >> 8) & 0xff); out.write(l & 0xff)
        out.write(payload, 0, payload.length)
      }
      out.write(0xff); out.write(0xd8) // SOI
      quants.zipWithIndex.foreach { case (q, id) =>
        seg(0xdb, Array(id.toByte) ++
          Array.tabulate(64)(k => q(JpegZigzag(k)).toByte))
      }
      dcUsed.foreach(t => seg(0xc4, Array((0x00 | t).toByte) ++ dcTables(t)._2))
      acUsed.foreach(t => seg(0xc4, Array((0x10 | t).toByte) ++ acTables(t)._2))
      seg(0xc0, Array[Byte](8,
        ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
        ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
        comps.length.toByte) ++
        comps.flatMap(c => Seq(c.id.toByte,
          ((c.h << 4) | c.v).toByte, c.tq.toByte)))
      if (restartInterval > 0)
        seg(0xdd, Array(((restartInterval >> 8) & 0xff).toByte,
          (restartInterval & 0xff).toByte))
      seg(0xda, Array(comps.length.toByte) ++
        comps.flatMap(c => Seq(c.id.toByte,
          ((c.tdc << 4) | c.tac).toByte)) ++ Array[Byte](0, 63, 0))

      // pass 2: entropy-coded data
      val bw = new BitWriter(out)
      def emit(codes: Map[Int, (Int, Int)], sym: Int, extra: Int,
          ebits: Int): Unit = {
        val (code, len) = codes(sym)
        bw.put(code, len)
        if (ebits > 0) bw.put(extra, ebits)
      }
      walk(
        (t, s, e) => emit(dcTables(t)._1, s, e, s),
        (t, sym, e, sz) => emit(acTables(t)._1, sym, e, sz),
        rst => {
          bw.flushOnes()
          out.write(0xff); out.write(0xd0 + rst)
        })
      bw.flushOnes()
      out.write(0xff); out.write(0xd9) // EOI
      out.toByteArray
    }
  }

  /** PNG ENCODER for 8-bit greyscale — signature, IHDR, filtered
    * scanlines deflated into one IDAT, IEND, all checksummed. The
    * deterministic-media generator for tests and oracle-checked
    * queries: `filterOf(y)` picks the row filter (0..4), so a single
    * image can exercise every unfilter path of [[PngCodec]].
    */
  object PngBuilder {
    import BE.{write32 => be32}
    private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(ctype.getBytes("US-ASCII")); crc.update(data)
      be32(data.length) ++ ctype.getBytes("US-ASCII") ++ data ++
        be32(crc.getValue.toInt)
    }

    /** `pixels` row-major, length = width×height. */
    def grey8(width: Int, height: Int, pixels: Array[Byte],
        filterOf: Int => Int): Array[Byte] = {
      require(pixels.length == width * height, "pixel count mismatch")
      val raw = new Array[Byte]((width + 1) * height)
      var y = 0
      while (y < height) {
        val f = filterOf(y) % 5
        raw(y * (width + 1)) = f.toByte
        var x = 0
        while (x < width) {
          val cur = pixels(y * width + x) & 0xff
          val a = if (x > 0) pixels(y * width + x - 1) & 0xff else 0
          val up = if (y > 0) pixels((y - 1) * width + x) & 0xff else 0
          val c = if (x > 0 && y > 0) pixels((y - 1) * width + x - 1) & 0xff else 0
          val filtered = f match {
            case 0 => cur
            case 1 => (cur - a) & 0xff
            case 2 => (cur - up) & 0xff
            case 3 => (cur - (a + up) / 2) & 0xff
            case 4 =>
              val p = a + up - c
              val pa = math.abs(p - a); val pb = math.abs(p - up)
              val pc = math.abs(p - c)
              val paeth = if (pa <= pb && pa <= pc) a
                          else if (pb <= pc) up else c
              (cur - paeth) & 0xff
          }
          raw(y * (width + 1) + 1 + x) = filtered.toByte
          x += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val ihdr = be32(width) ++ be32(height) ++ Array[Byte](8, 0, 0, 0, 0)
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }
  }

  /** GIF-variant LZW (GIF89a appendix F): variable code width
    * starting at `minCodeSize`+1, clear/end-of-information codes,
    * dictionary capped at 4096 entries, codes packed LSB-first. The
    * decoder follows the standard width rule — bump the read width
    * when the NEXT table slot reaches 2^width (max 12) — and handles
    * the KwKwK self-reference case; the encoder is real LZW whose
    * width tracking SIMULATES the decoder's table growth (the
    * decoder's adds lag the encoder's by one code, which is exactly
    * the off-by-one that breaks naive encoders), so interop holds by
    * construction and round-trips are byte-exact.
    */
  private[analytics] object GifLzw {

    /** LSB-first bit packing: code bits fill bytes low bit first. */
    private final class BitWriter {
      private val out = new java.io.ByteArrayOutputStream()
      private var acc = 0L
      private var nAcc = 0
      def put(code: Int, width: Int): Unit = {
        acc |= (code.toLong & ((1L << width) - 1)) << nAcc
        nAcc += width
        while (nAcc >= 8) {
          out.write((acc & 0xff).toInt); acc >>>= 8; nAcc -= 8
        }
      }
      def result(): Array[Byte] = {
        if (nAcc > 0) { out.write((acc & 0xff).toInt); acc = 0; nAcc = 0 }
        out.toByteArray
      }
    }

    private final class BitReader(b: Array[Byte]) {
      private var pos = 0
      private var acc = 0L
      private var nAcc = 0
      /** Next `width`-bit code, or -1 at end of data. */
      def read(width: Int): Int = {
        while (nAcc < width) {
          if (pos >= b.length) return -1
          acc |= (b(pos) & 0xffL) << nAcc
          pos += 1; nAcc += 8
        }
        val v = (acc & ((1L << width) - 1)).toInt
        acc >>>= width; nAcc -= width
        v
      }
    }

    /** Real LZW compression of `pixels` (palette indices). The width
      * state is the DECODER's: `decNext` counts the entries the
      * decoder will have added after reading each emitted code (one
      * per data code except the first after a clear), and the width
      * bumps when THAT counter fills the current width — not when the
      * encoder's own (one-ahead) table does.
      */
    def encode(pixels: Array[Byte], minCodeSize: Int): Array[Byte] = {
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      val bw = new BitWriter
      var width = minCodeSize + 1
      var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
      var encNext = eoi + 1
      var decNext = eoi + 1
      var firstSinceClear = true
      def emitData(code: Int): Unit = {
        bw.put(code, width)
        if (firstSinceClear) firstSinceClear = false
        else if (decNext < 4096) {
          decNext += 1
          if (decNext == (1 << width) && width < 12) width += 1
        }
      }
      def reset(): Unit = {
        bw.put(clear, width)
        width = minCodeSize + 1
        dict = scala.collection.mutable.HashMap.empty
        encNext = eoi + 1; decNext = eoi + 1; firstSinceClear = true
      }
      reset()
      if (pixels.isEmpty) { bw.put(eoi, width); return bw.result() }
      var cur = pixels(0) & 0xff
      var i = 1
      while (i < pixels.length) {
        val k = pixels(i) & 0xff
        dict.get((cur, k)) match {
          case Some(c) => cur = c
          case None =>
            emitData(cur)
            dict((cur, k)) = encNext; encNext += 1
            cur = k
            if (encNext == 4096) reset()
        }
        i += 1
      }
      emitData(cur)
      bw.put(eoi, width)
      bw.result()
    }

    /** Decode at most `maxPixels` indices (the zip-bomb cap: a frame
      * can never expand past its declared width×height, the same
      * bounded-decompression discipline as the 10 MiB zlib cap).
      * None on any malformed stream — out-of-range code, non-literal
      * first code, or truncation before `maxPixels` indices arrived.
      */
    def decode(data: Array[Byte], minCodeSize: Int, maxPixels: Int): Option[Array[Byte]] = {
      if (minCodeSize < 2 || minCodeSize > 8 || maxPixels <= 0) return None
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      val br = new BitReader(data)
      // initial capacity only — the stream grows on demand, so a
      // large (attacker-declared) pixel count must not preallocate
      val out = new java.io.ByteArrayOutputStream(math.min(maxPixels, 1 << 16))
      var width = minCodeSize + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      var nextCode = eoi + 1
      var prev = -1
      val expandBuf = new Array[Byte](4096)
      def firstByteOf(code: Int): Byte = {
        var c = code
        while (c >= clear) c = prefix(c)
        c.toByte
      }
      /** Expand `code` into `expandBuf` back-to-front; returns start offset. */
      def expand(code: Int): Int = {
        var c = code; var at = expandBuf.length
        while (c >= clear) { at -= 1; expandBuf(at) = suffix(c); c = prefix(c) }
        at -= 1; expandBuf(at) = c.toByte
        at
      }
      while (out.size < maxPixels) {
        val code = br.read(width)
        if (code < 0) return None // truncated before the pixel count arrived
        if (code == clear) {
          width = minCodeSize + 1; nextCode = eoi + 1; prev = -1
        } else if (code == eoi) {
          return if (out.size == maxPixels) Some(out.toByteArray) else None
        } else if (prev < 0) {
          if (code >= clear) return None // first code after clear must be a literal
          out.write(code)
          prev = code
        } else {
          val at =
            if (code < nextCode) expand(code)
            else if (code == nextCode && nextCode < 4096) {
              // KwKwK: the code being defined right now — prev's
              // expansion followed by prev's first byte
              val a = expand(prev)
              System.arraycopy(expandBuf, a, expandBuf, a - 1, expandBuf.length - a)
              expandBuf(expandBuf.length - 1) = firstByteOf(prev)
              a - 1
            } else return None // code past the table: corrupt stream
          out.write(expandBuf, at, math.min(expandBuf.length - at, maxPixels - out.size))
          if (nextCode < 4096) {
            prefix(nextCode) = prev; suffix(nextCode) = expandBuf(at)
            nextCode += 1
            if (nextCode == (1 << width) && width < 12) width += 1
          }
          prev = code
        }
      }
      Some(out.toByteArray)
    }
  }

  /** REAL GIF decode — header + logical screen descriptor, global and
    * local color tables, graphic-control extensions (frame delays),
    * full LZW decompression ([[GifLzw]]), 4-pass de-interlacing, and
    * Rec.601 luma through the active palette. Animated GIFs yield one
    * entry per frame; anything malformed — bad signature, palette
    * index past the table, corrupt LZW, truncated sub-blocks —
    * degrades to the frames parsed so far (and None/stub for frame
    * zero), never a crash. This retires the last mainstream
    * still-image format that is decodable lib-free.
    */
  object Gif {

    /** One decoded frame: `pixels` are palette indices, row-major and
      * already de-interlaced; `palette` is the table the frame
      * resolves through (local if present, else global), 3 bytes per
      * entry.
      */
    final case class Frame(left: Int, top: Int, width: Int, height: Int,
        delayCs: Int, interlaced: Boolean,
        pixels: Array[Byte], palette: Array[Byte])

    def isGif(b: Array[Byte]): Boolean =
      b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

    /** Logical screen (width, height) from the descriptor. */
    def screenDims(b: Array[Byte]): Option[(Int, Int)] =
      if (isGif(b)) Some((le16(b, 6), le16(b, 8))) else None

    /** GIF interlace row order: passes at strides 8/8/4/2 starting at
      * rows 0/4/2/1 — `order(k)` is the DISPLAY row of the k-th row
      * in the stored stream.
      */
    private def interlaceOrder(h: Int): Array[Int] =
      ((0 until h by 8) ++ (4 until h by 8) ++
       (2 until h by 4) ++ (1 until h by 2)).toArray

    private def deinterlace(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](px.length)
      val order = interlaceOrder(h)
      var k = 0
      while (k < h) {
        System.arraycopy(px, k * w, out, order(k) * w, w)
        k += 1
      }
      out
    }

    /** All frames, in stream order, bailing at the first block it
      * cannot decode honestly. `maxFrames` bounds a pathological
      * stream of tiny frames the same way `maxPixels` bounds LZW.
      */
    def frames(b: Array[Byte], maxFrames: Int = 1024): Seq[Frame] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Frame]
      if (!isGif(b)) return out.toSeq
      var pos = 13
      var gct: Array[Byte] = null
      val packed = b(10) & 0xff
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (pos + n * 3 > b.length) return out.toSeq
        gct = java.util.Arrays.copyOfRange(b, pos, pos + n * 3)
        pos += n * 3
      }
      var pendingDelay = 0
      while (pos < b.length && out.size < maxFrames) {
        (b(pos) & 0xff) match {
          case 0x3b => return out.toSeq // trailer
          case 0x21 => // extension
            if (pos + 2 >= b.length) return out.toSeq
            val label = b(pos + 1) & 0xff
            pos += 2
            if (label == 0xf9 && pos + 4 < b.length && (b(pos) & 0xff) >= 4)
              pendingDelay = le16(b, pos + 2)
            pos = skipSubBlocks(b, pos)
            if (pos < 0) return out.toSeq
          case 0x2c => // image descriptor
            if (pos + 10 > b.length) return out.toSeq
            val left = le16(b, pos + 1); val top = le16(b, pos + 3)
            val fw = le16(b, pos + 5); val fh = le16(b, pos + 7)
            val ip = b(pos + 9) & 0xff
            pos += 10
            var pal = gct
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              if (pos + n * 3 > b.length) return out.toSeq
              pal = java.util.Arrays.copyOfRange(b, pos, pos + n * 3)
              pos += n * 3
            }
            if (pos >= b.length || pal == null || fw <= 0 || fh <= 0)
              return out.toSeq
            // pixel-count bound in LONG: 16-bit dims multiply to up to
            // ~4.3e9, overflowing Int — and even a positive product
            // that large is a declared decompression bomb, the same
            // class the 10 MiB zlib cap refuses. 2^26 px ≈ 64 MB of
            // indices, far past any sane GIF.
            val nPix = fw.toLong * fh
            if (nPix > (1L << 26)) return out.toSeq
            val mcs = b(pos) & 0xff; pos += 1
            val (data, next) = collectSubBlocks(b, pos)
            if (next < 0) return out.toSeq
            pos = next
            GifLzw.decode(data, mcs, nPix.toInt) match {
              case Some(px) =>
                val rows = if ((ip & 0x40) != 0) deinterlace(px, fw, fh) else px
                out += Frame(left, top, fw, fh, pendingDelay,
                  (ip & 0x40) != 0, rows, pal)
                pendingDelay = 0
              case None => return out.toSeq
            }
          case _ => return out.toSeq // unknown block type: bail
        }
      }
      out.toSeq
    }

    /** Average Rec.601 luma ×1000 through the frame's palette; -1 on
      * an index past the table (refuse rather than guess).
      */
    def lumaMilliOf(f: Frame): Long = {
      val palN = f.palette.length / 3
      var sum = 0L; var i = 0
      while (i < f.pixels.length) {
        val idx = f.pixels(i) & 0xff
        if (idx >= palN) return -1L
        val r = f.palette(idx * 3) & 0xff
        val g = f.palette(idx * 3 + 1) & 0xff
        val bl = f.palette(idx * 3 + 2) & 0xff
        sum += 299L * r + 587L * g + 114L * bl
        i += 1
      }
      if (f.pixels.isEmpty) -1L else sum / f.pixels.length
    }

    /** Skip sub-blocks (`pos` at the first size byte); returns the
      * offset past the 0 terminator, or -1 on truncation.
      */
    private def skipSubBlocks(b: Array[Byte], pos0: Int): Int = {
      var pos = pos0
      while (pos < b.length) {
        val n = b(pos) & 0xff
        if (n == 0) return pos + 1
        pos += 1 + n
      }
      -1
    }

    private def collectSubBlocks(b: Array[Byte], pos0: Int): (Array[Byte], Int) = {
      val bos = new java.io.ByteArrayOutputStream()
      var pos = pos0
      while (pos < b.length) {
        val n = b(pos) & 0xff
        if (n == 0) return (bos.toByteArray, pos + 1)
        if (pos + 1 + n > b.length) return (bos.toByteArray, -1)
        bos.write(b, pos + 1, n)
        pos += 1 + n
      }
      (bos.toByteArray, -1)
    }
  }

  /** GIF features through the batch-codec interface: dimensions from
    * the logical screen, luma from the FIRST frame, duration = sum of
    * the frame delays (animated GIFs are videos with a palette).
    */
  final class GifCodec extends MediaCodec {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        val (digest, len) = metaOf(r)
        val dims = Gif.screenDims(r.content).getOrElse((0, 0))
        val fs = Gif.frames(r.content)
        MediaFeatures(r.mediaId, r.mediaType, len, digest,
          width = dims._1, height = dims._2,
          durationMs = fs.map(_.delayCs.toLong * 10).sum,
          batchSize = batch.size,
          avgLumaMilli = fs.headOption.map(Gif.lumaMilliOf).getOrElse(-1L))
      }
  }

  /** Test-vector builder: real GIF89a files with a 256-entry
    * greyscale global palette (index i → rgb(i,i,i), so Rec.601 luma
    * of index v is exactly v) and REAL LZW-compressed frames —
    * optionally interlaced, optionally animated with per-frame
    * graphic-control delays.
    */
  object GifBuilder {

    private def le16b(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

    /** Single frame, non-animated. */
    def grey8(width: Int, height: Int, pixels: Array[Byte],
        interlaced: Boolean = false): Array[Byte] =
      animGrey8(width, height, Seq(pixels), Nil, interlaced)

    /** Single frame carrying its OWN color table (no global table) —
      * the local-palette path real GIFs use for per-frame palettes.
      * `palette` is n×3 RGB bytes, n a power of two in [2, 256].
      */
    def localPalette(width: Int, height: Int, pixels: Array[Byte],
        palette: Array[Byte]): Array[Byte] = {
      require(pixels.length == width * height, "pixel count mismatch")
      val n = palette.length / 3
      require(n >= 2 && (n & (n - 1)) == 0 && palette.length % 3 == 0,
        "palette must be a power-of-two entry count")
      val sizeBits = 31 - Integer.numberOfLeadingZeros(n) - 1 // log2(n) - 1
      val mcs = math.max(2, 31 - Integer.numberOfLeadingZeros(n))
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("GIF89a".getBytes("US-ASCII"))
      bos.write(le16b(width)); bos.write(le16b(height))
      bos.write(0x70) // NO global table; 8 bits/channel resolution
      bos.write(0); bos.write(0)
      bos.write(0x2c)
      bos.write(le16b(0)); bos.write(le16b(0))
      bos.write(le16b(width)); bos.write(le16b(height))
      bos.write(0x80 | sizeBits) // local color table flag + size
      bos.write(palette, 0, palette.length)
      bos.write(mcs)
      val lzw = GifLzw.encode(pixels, mcs)
      var off = 0
      while (off < lzw.length) {
        val k = math.min(255, lzw.length - off)
        bos.write(k); bos.write(lzw, off, k)
        off += k
      }
      bos.write(0)
      bos.write(0x3b)
      bos.toByteArray
    }

    /** Animated: one GCE (delay in centiseconds) per frame when
      * `delaysCs` is non-empty; all frames full-screen.
      */
    def animGrey8(width: Int, height: Int, frames: Seq[Array[Byte]],
        delaysCs: Seq[Int], interlaced: Boolean = false): Array[Byte] = {
      require(frames.forall(_.length == width * height), "pixel count mismatch")
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("GIF89a".getBytes("US-ASCII"))
      bos.write(le16b(width)); bos.write(le16b(height))
      bos.write(0xf7) // global table, 8 bits/channel, 256 entries
      bos.write(0); bos.write(0) // background index, aspect
      var i = 0
      while (i < 256) { bos.write(i); bos.write(i); bos.write(i); i += 1 }
      for ((px, fi) <- frames.zipWithIndex) {
        delaysCs.lift(fi).foreach { d =>
          bos.write(0x21); bos.write(0xf9); bos.write(4)
          bos.write(0) // no disposal, no transparency
          bos.write(le16b(d)); bos.write(0); bos.write(0)
        }
        bos.write(0x2c)
        bos.write(le16b(0)); bos.write(le16b(0))
        bos.write(le16b(width)); bos.write(le16b(height))
        bos.write(if (interlaced) 0x40 else 0)
        bos.write(8) // LZW min code size
        val stream =
          if (!interlaced) px
          else { // stored row k = display row order(k)
            val order = ((0 until height by 8) ++ (4 until height by 8) ++
              (2 until height by 4) ++ (1 until height by 2)).toArray
            val p = new Array[Byte](px.length)
            var k = 0
            while (k < height) {
              System.arraycopy(px, order(k) * width, p, k * width, width)
              k += 1
            }
            p
          }
        val lzw = GifLzw.encode(stream, 8)
        var off = 0
        while (off < lzw.length) {
          val n = math.min(255, lzw.length - off)
          bos.write(n); bos.write(lzw, off, n)
          off += n
        }
        bos.write(0)
      }
      bos.write(0x3b)
      bos.toByteArray
    }
  }

  /** Magic-byte dispatch: RIFF/WAVE → real PCM decode, BM → real BMP
    * decode, PNG signature → real PNG decode, ISO-BMFF `ftyp` → real
    * MP4 box parse (true duration + dimensions, frames opaque), JPEG
    * SOI → real marker parse + full entropy decode to dimensions and
    * luma (baseline single-scan or progressive multi-scan), GIF
    * signature → real LZW decode (first-frame luma, animation
    * duration), anything else → the deterministic stub.
    */
  final class FormatAwareCodec(
      fallback: MediaCodec = new DeterministicStubCodec) extends MediaCodec {
    private val wav = new PcmWavCodec
    private val bmp = new BmpCodec
    private val png = new PngCodec
    private val mp4 = new Mp4Codec
    private val jpeg = new JpegCodec
    private val gif = new GifCodec
    private val webp = new Webp.WebpCodec
    private val qoi = new Qoi.QoiCodec
    private def isGif(b: Array[Byte]): Boolean = Gif.isGif(b)
    private def isWav(b: Array[Byte]): Boolean =
      b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    private def isBmp(b: Array[Byte]): Boolean =
      b.length >= 2 && b(0) == 'B' && b(1) == 'M'
    private def isPng(b: Array[Byte]): Boolean =
      b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a
    private def isMp4(b: Array[Byte]): Boolean =
      b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'
    private def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
        (b(2) & 0xff) == 0xff
    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
      // decode per format but return in INPUT order with the full
      // batch size (the vectorized-codec shape groups by format
      // internally; callers see one coherent batch)
      val out = batch.map { r =>
        // one malformed container must cost one stub row, not four
        // task retries and an aborted query
        val f = try {
          if (isWav(r.content)) wav.decodeBatch(Seq(r)).head
          else if (isBmp(r.content)) bmp.decodeBatch(Seq(r)).head
          else if (isPng(r.content)) png.decodeBatch(Seq(r)).head
          else if (isMp4(r.content)) mp4.decodeBatch(Seq(r)).head
          else if (isJpeg(r.content)) jpeg.decodeBatch(Seq(r)).head
          else if (isGif(r.content)) gif.decodeBatch(Seq(r)).head
          else if (Webp.isWebp(r.content)) webp.decodeBatch(Seq(r)).head
          else if (Qoi.isQoi(r.content)) qoi.decodeBatch(Seq(r)).head
          else fallback.decodeBatch(Seq(r)).head
        } catch {
          case scala.util.control.NonFatal(_) =>
            fallback.decodeBatch(Seq(r)).head
        }
        f.copy(batchSize = batch.size)
      }
      out
    }
  }

  /** Motion-JPEG in ISO-BMFF — the one interchange video format whose
    * frames need NO codec library: every sample is a complete JPEG,
    * so the container's sample index gives frame byte ranges and the
    * in-house [[JpegCodec]] decodes ACTUAL video frames. This retires
    * the "video frame decode needs external codecs" boundary for
    * MJPEG; inter-coded codecs (H.264 …) remain the honest stub.
    */
  object Mjpeg {
    import BE.{write32 => be32}

    /** Assemble a playable-shape MJPEG container: the full sample
      * index (all frames sync, one chunk) with the chunk offset
      * pointing just past the header, then one `mdat` holding the
      * concatenated JPEG frames. The header's length is independent
      * of the offset VALUE (a fixed 4-byte field), so building once
      * with a dummy offset measures the real one.
      */
    def container(width: Int, height: Int, timescale: Long,
        durationTicks: Long, frames: Seq[Array[Byte]]): Array[Byte] = {
      val sizes = frames.map(_.length.toLong)
      def hdr(chunkOff: Long) = Mp4Builder.withSampleIndex(
        timescale, durationTicks, width, height,
        sampleCount = frames.length, uniformSize = 0L,
        sampleSizes = sizes, samplesPerChunk = frames.length,
        chunkOffsets = Seq(chunkOff),
        syncSamples = (1 to frames.length).toList)
      val dataOff = hdr(0L).length + 8L // past the mdat box header
      val payload = frames.toArray.flatten
      hdr(dataOff) ++ be32(payload.length + 8L) ++
        "mdat".getBytes("US-ASCII") ++ payload
    }

    /** REAL frame decode: (frame number 1-based, decoded features)
      * for every sync sample. Each frame is sliced [off, off + size)
      * straight from the sample index's stsz sizes — exact even when
      * trailing boxes (`free`, moov-after-mdat) follow the mdat,
      * where inferring the end from the neighbor/container end would
      * append foreign bytes to the last frame.
      */
    def frameFeatures(content: Array[Byte]): Seq[(Int, MediaFeatures)] = {
      val ranges = Mp4Index.syncSampleRanges(content)
      if (ranges.isEmpty) return Nil
      val codec = new JpegCodec
      ranges.flatMap { case (sampleNo, off, size) =>
        val end = off + size
        if (off < 0 || size <= 0 || end > content.length) None
        else {
          val slice = java.util.Arrays.copyOfRange(
            content, off.toInt, end.toInt)
          codec.decodeBatch(Seq(MediaRow(sampleNo.toLong, "image", slice)))
            .headOption.map(f => (sampleNo, f))
        }
      }
    }
  }

  /** Batched feature extraction over an opaque-binary Dataset.
    *
    * Scale design: media rows are repartitioned by id hash so decode
    * cost spreads evenly regardless of upstream layout (a directory
    * scan groups similar sizes together); each partition is processed
    * in fixed-size batches so a vectorized codec gets its preferred
    * shape and memory stays bounded by batch, not partition.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      codec: MediaCodec,
      batchSize: Int = 64,
      partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val repartitioned =
      if (partitions > 0) media.repartition(partitions, col("mediaId"))
      else media
    repartitioned.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(batch => codec.decodeBatch(batch.toSeq))
    }
  }

  /** Metadata-only projection — never touches content bytes beyond
    * length/digest, so Parquet's column pruning skips the payload
    * pages when `content` isn't selected downstream.
    */
  def binaryMeta(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("byte_len", octet_length(col(contentCol)))
      .withColumn("digest", md5(col(contentCol)))

  /** Frame sampling stub for video: pick every k-th "frame offset" —
    * real implementation seeks the container; the partition/batch
    * plumbing is identical.
    */
  def frameOffsets(byteLen: Long, frameBytes: Long, everyK: Int): Seq[Long] =
    (0L until byteLen by frameBytes).grouped(everyK).map(_.head).toSeq
}
