package graft.analytics

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.Multimodal._

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("batched feature extraction: schema, determinism, batch shape") {
    import spark.implicits._
    val media = (0L until 300L).map { i =>
      MediaRow(i, if (i % 3 == 0) "image" else "video",
        s"payload-$i".getBytes ++ Array.fill[Byte]((i % 50).toInt)(i.toByte))
    }.toDS()

    val fx = extractFeatures(media, new DeterministicStubCodec,
      batchSize = 64, partitions = 4).collect()

    assert(fx.length == 300)
    // deterministic: same content → same features across runs
    val fx2 = extractFeatures(media, new DeterministicStubCodec,
      batchSize = 64, partitions = 4).collect()
    assert(fx.sortBy(_.mediaId).map(_.digest).toSeq ==
      fx2.sortBy(_.mediaId).map(_.digest).toSeq)
    // batch shape: no batch exceeds the configured size, and batching
    // actually happens (not row-at-a-time)
    assert(fx.forall(_.batchSize <= 64))
    assert(fx.exists(_.batchSize > 1))
    // stub semantics: images have no duration, video duration scales
    assert(fx.filter(_.mediaType == "image").forall(_.durationMs == 0))
    assert(fx.filter(_.mediaType == "video").forall(f => f.durationMs == f.byteLen * 10))
  }

  // --- real-format byte builders (no codec libs: pure arithmetic) ---

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Canonical 44-byte-header mono 16-bit PCM WAV. */
  private def wavBytes(rate: Int, samples: Seq[Int]): Array[Byte] = {
    val data = samples.flatMap(le16).toArray
    "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(rate) ++
      le32(rate * 2) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
  }

  /** Uncompressed 24-bit BMP; pixels in (r,g,b), row 0 = bottom. */
  private def bmpBytes(width: Int, height: Int,
      pixels: Seq[(Int, Int, Int)]): Array[Byte] = {
    val rowBytes = ((width * 3 + 3) / 4) * 4
    val data = new Array[Byte](rowBytes * height)
    pixels.zipWithIndex.foreach { case ((r, g, b), i) =>
      val (x, y) = (i % width, i / width)
      val o = y * rowBytes + x * 3
      data(o) = b.toByte; data(o + 1) = g.toByte; data(o + 2) = r.toByte
    }
    "BM".getBytes ++ le32(54 + data.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(data.length) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0) ++ data
  }

  test("real decode: PCM WAV and 24-bit BMP parse without codec libs") {
    import spark.implicits._
    // 8000 samples at 8 kHz alternating ±16384: exactly 1 s long,
    // mean-square energy (16384/32768)² = 0.25 → 250 milli
    val wav = wavBytes(8000,
      (0 until 8000).map(i => if (i % 2 == 0) 16384 else -16384))
    // 2×2 BMP, two white + two black pixels → average luma 127500
    val bmp = bmpBytes(2, 2,
      Seq((255, 255, 255), (0, 0, 0), (0, 0, 0), (255, 255, 255)))
    val jpegish = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 1, 2, 3)

    val media = Seq(
      MediaRow(1L, "audio", wav),
      MediaRow(2L, "image", bmp),
      MediaRow(3L, "image", jpegish)).toDS()
    val fx = extractFeatures(media, new FormatAwareCodec, batchSize = 8)
      .collect().sortBy(_.mediaId)

    val audio = fx(0)
    assert(audio.sampleRate == 8000 && audio.channels == 1)
    assert(audio.durationMs == 1000L)
    assert(audio.energyMilli == 250L)
    val image = fx(1)
    assert(image.width == 2 && image.height == 2)
    assert(image.avgLumaMilli == 127500L)
    // a lib-dependent format falls back to the deterministic stub
    val other = fx(2)
    assert(other.avgLumaMilli == -1L && other.energyMilli == -1L)
    assert(other.byteLen == jpegish.length)
  }

  test("malformed containers degrade to stub features, never hang or abort") {
    import spark.implicits._
    // WAV with a negative data-chunk size: the chunk walk must bail,
    // not spin the task forever
    val evilWav = {
      val good = wavBytes(8000, Seq(100, -100, 100, -100))
      // find the "data" chunk and corrupt its size to -8
      val idx = good.indexOfSlice("data".getBytes)
      good.patch(idx + 4, le32(-8), 4)
    }
    // BMP with a negative pixel-data offset and absurd dims: must not
    // throw ArrayIndexOutOfBounds
    val evilBmp = {
      val good = bmpBytes(2, 2, Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)))
      good.patch(10, le32(-100), 4) // dataOffset = -100
        .patch(18, le32(Int.MaxValue), 4) // width overflow bait
    }
    val media = Seq(
      MediaRow(1L, "audio", evilWav),
      MediaRow(2L, "image", evilBmp)).toDS()
    val fx = extractFeatures(media, new FormatAwareCodec, batchSize = 8)
      .collect().sortBy(_.mediaId)
    // both rows come back (no exception, no hang); the WAV keeps its
    // fmt-derived metadata but reads no frames, the BMP reads no pixels
    assert(fx.length == 2)
    assert(fx(0).sampleRate == 8000 && fx(0).durationMs == 0L)
    assert(fx(1).avgLumaMilli == -1L)
  }

  test("long-clip WAV energy does not overflow the accumulator scaling") {
    // 150 s of full-scale 44.1 kHz mono: sumSq ≈ 7.1e15, the old
    // sumSq*1000 pre-scaling would wrap past Long.MaxValue
    val n = 44100 * 150
    val samples = new Array[Byte](n * 2)
    var i = 0
    while (i < n) { // -32768 full-scale: le16 = 0x00 0x80
      samples(i * 2) = 0x00; samples(i * 2 + 1) = 0x80.toByte; i += 1
    }
    val wav = "RIFF".getBytes ++ le32(36 + samples.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(44100) ++
      le32(44100 * 2) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(samples.length) ++ samples
    val fx = new PcmWavCodec()
      .decodeBatch(Seq(MediaRow(1L, "audio", wav))).head
    assert(fx.energyMilli == 1000L) // (-32768/32768)² = 1.0 exactly
    assert(fx.durationMs == 150000L)
  }

  test("binaryMeta computes length and digest without decoding") {
    import spark.implicits._
    val df = Seq(("a", "hello"), ("b", "wörld")).toDF("id", "text")
      .withColumn("content",
        org.apache.spark.sql.functions.encode(
          org.apache.spark.sql.functions.col("text"), "UTF-8"))
    val meta = binaryMeta(df, "content").collect()
    val byId = meta.map(r => r.getAs[String]("id") ->
      (r.getAs[Int]("byte_len"), r.getAs[String]("digest"))).toMap
    assert(byId("a")._1 == 5)
    assert(byId("b")._1 == 6) // ö is 2 bytes in UTF-8
    assert(byId("a")._2 == "5d41402abc4b2a76b9719d911017c592")
  }

  test("frame sampling offsets") {
    assert(frameOffsets(100, 10, 3) == Seq(0L, 30L, 60L, 90L))
    assert(frameOffsets(5, 10, 2) == Seq(0L))
  }
}
