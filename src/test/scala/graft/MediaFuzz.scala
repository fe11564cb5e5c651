package graft
import graft.analytics.Multimodal
import graft.analytics.Multimodal._

/** Direct-path fuzz soak over every lib-free decoder (test scope, not
  * shipped). FormatAwareCodec swallows NonFatal per row, so a crashy
  * decoder still "works" through the dispatcher — this harness calls
  * each decoder DIRECTLY, where a throw is a finding (the GIF
  * dimension-bomb fix came from the GIF arm of exactly this soak).
  *
  * Usage: Test/runMain graft.MediaFuzz [iterations]
  */
object MediaFuzz {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(20000)
    val rnd = new scala.util.Random(987)
    // seed corpus: one valid instance per format
    val wavSeed = {
      val n = 64
      val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + n * 2); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
      bb.putInt(8000); bb.putInt(16000); bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(n * 2)
      (0 until n).foreach(i => bb.putShort((i * 1000).toShort))
      bb.array()
    }
    val pngSeed = PngBuilder.grey8(6, 5,
      Array.tabulate(30)(i => (i * 8).toByte), y => y % 5)
    val jpgSeed = JpegBuilder.baselineGrey(10, 9, Array.fill(64)(8),
      (bx, by) => { val a = new Array[Int](64); a(0) = bx + by; a })
    val mp4Seed = Mjpeg.container(10, 9, 1000L, 2000L,
      Seq(jpgSeed, jpgSeed))
    val bmpSeed = {
      // minimal 24-bit BMP via the same layout BmpCodec reads
      val w = 4; val h = 3; val row = ((w * 3 + 3) / 4) * 4
      val b = java.nio.ByteBuffer.allocate(54 + row * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + row * h).putInt(0)
      b.putInt(54).putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.array()
    }
    val seeds = Seq[(String, Array[Byte], Array[Byte] => Unit)](
      ("wav", wavSeed, b => new PcmWavCodec().decodeBatch(Seq(MediaRow(1, "audio", b)))),
      ("bmp", bmpSeed, b => new BmpCodec().decodeBatch(Seq(MediaRow(1, "image", b)))),
      ("png", pngSeed, b => new PngCodec().decodeBatch(Seq(MediaRow(1, "image", b)))),
      ("ahash", pngSeed, b => ImageHash.ahashGrey8(b)),
      ("mp4", mp4Seed, b => new Mp4Codec().decodeBatch(Seq(MediaRow(1, "video", b)))),
      ("mjpeg", mp4Seed, b => Mjpeg.frameFeatures(b)),
      ("jpeg", jpgSeed, b => new JpegCodec().decodeBatch(Seq(MediaRow(1, "image", b)))),
      // strict entry: IllegalArgumentException IS the rejection
      // contract; anything else escaping is a finding. Four seeds so
      // corruption reaches every stream shape: LZ77 runs, the
      // predictor transform chain, the color cache, and bundled
      // color-indexing
      ("webp", graft.analytics.Webp.Builder.grey8(8, 6,
          Array.tabulate(48)(i => (i * 7).toByte), withRuns = true),
        b => try graft.analytics.Webp.decodeStrict(b)
          catch { case _: IllegalArgumentException => () }),
      ("webp-pred", graft.analytics.Webp.Builder.grey8Predicted(7, 5,
          Array.tabulate(35)(i => (i * 11).toByte), mode = 12),
        b => try graft.analytics.Webp.decodeStrict(b)
          catch { case _: IllegalArgumentException => () }),
      ("webp-cache", graft.analytics.Webp.Builder.grey8Cached(8, 8,
          Array.tabulate(64)(i => ((i % 5) * 40).toByte)),
        b => try graft.analytics.Webp.decodeStrict(b)
          catch { case _: IllegalArgumentException => () }),
      ("webp-idx", graft.analytics.Webp.Builder.grey8Indexed(9, 6,
          Array.tabulate(54)(i => (i % 4).toByte),
          Array(10, 80, 150, 220)),
        b => try graft.analytics.Webp.decodeStrict(b)
          catch { case _: IllegalArgumentException => () }))
    var n = 0
    while (n < iters) {
      val (tag, seed, run) = seeds(rnd.nextInt(seeds.length))
      val mut =
        if (rnd.nextBoolean()) java.util.Arrays.copyOfRange(seed, 0, 1 + rnd.nextInt(seed.length))
        else seed.clone()
      (0 until rnd.nextInt(9)).foreach { _ =>
        if (mut.nonEmpty) mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte }
      try run(mut)
      catch {
        case e: Throwable =>
          println(s"[media-fuzz] CRASH in $tag after $n: $e")
          e.getStackTrace.take(4).foreach(f => println(s"  at $f"))
          sys.exit(1)
      }
      n += 1
    }
    println(s"[media-fuzz] $n corrupted inputs across ${seeds.length} direct decoder paths, zero exceptions")
  }
}
