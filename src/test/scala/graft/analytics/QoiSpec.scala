package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

/** QOI codec contract: hand-built op vectors decode to the exact
  * pixels the spec mandates, the greedy encoder round-trips and
  * really exercises every op family on the query's pixel pattern,
  * and decodeStrict rejects (IllegalArgumentException, never any
  * other throw) malformed streams — truncations, dimension bombs,
  * run overshoot, bad end markers.
  */
class QoiSpec extends AnyFunSuite {

  private def header(w: Int, h: Int, ch: Int = 3): Array[Byte] =
    Array[Byte]('q', 'o', 'i', 'f',
      (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
      (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
      ch.toByte, 0)

  private val endMarker = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)

  private def grey(v: Int): Int = 0xff000000 | (v << 16) | (v << 8) | v

  test("hand-built vector: RGB, RUN, DIFF, LUMA, INDEX ops decode per spec") {
    // 8 pixels: RGB(10,20,30); RUN(2); DIFF(+1,+1,+1) -> (11,21,31);
    // LUMA dg=20, dr-dg=-3, db-dg=5 -> (28,41,56); RGB(10,20,30)
    // would be INDEX — write the index position instead; RUN(1);
    // DIFF(-2,-2,-2) -> (8,18,28)
    val idxPos = (10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64
    val ops = Array[Byte](
      0xfe.toByte, 10, 20, 30,
      (0xc0 | 1).toByte, // run of 2
      (0x40 | (3 << 4) | (3 << 2) | 3).toByte, // diff +1,+1,+1
      (0x80 | (20 + 32)).toByte, (((-3 + 8) << 4) | (5 + 8)).toByte,
      idxPos.toByte, // back to (10,20,30)
      0xc0.toByte, // run of 1
      0x40.toByte) // diff -2,-2,-2
    val img = Qoi.decodeStrict(header(8, 1) ++ ops ++ endMarker)
    def px(r: Int, g: Int, b: Int) =
      0xff000000 | (r << 16) | (g << 8) | b
    assert(img.width == 8 && img.height == 1)
    assert(img.rgba.toSeq == Seq(
      px(10, 20, 30), px(10, 20, 30), px(10, 20, 30),
      px(11, 21, 31), px(28, 41, 56),
      px(10, 20, 30), px(10, 20, 30), px(8, 18, 28)))
  }

  test("deltas wrap mod 256 and RGBA updates alpha") {
    // start pixel defaults (0,0,0,255); DIFF(-2,-2,-2) wraps to
    // (254,254,254); RGBA sets alpha
    val ops = Array[Byte](0x40.toByte, 0xff.toByte, 1, 2, 3, 77)
    val img = Qoi.decodeStrict(header(2, 1, ch = 4) ++ ops ++ endMarker)
    assert(img.rgba(0) == (0xff000000 | (254 << 16) | (254 << 8) | 254))
    assert(img.rgba(1) == ((77 << 24) | (1 << 16) | (2 << 8) | 3))
  }

  test("encoder round-trips and hits every targeted op family on the query pattern") {
    // the mm_qoi_luma pixel formula, largest dims (w=8, h=6)
    val id = 4L
    val w = 8; val h = 6
    val px = Array.tabulate(w * h) { i =>
      ((id * 37 + (i / 5) * 29 +
        (if (i % 5 == 2 || i % 5 == 3) 100 else 0)) % 256).toInt
    }
    val (bytes, stats) = Qoi.encodeWithStats(w, h, px.map(grey))
    assert(Qoi.isQoi(bytes))
    val img = Qoi.decodeStrict(bytes)
    assert(img.rgba.toSeq == px.map(grey).toSeq, "round trip changed pixels")
    for (op <- Seq("run", "luma", "rgb", "index"))
      assert(stats(op) > 0, s"pattern no longer exercises $op: $stats")
    // DIFF family: +1 steps
    val (b2, s2) = Qoi.encodeWithStats(4, 1,
      Array(10, 11, 12, 13).map(grey))
    assert(s2("diff") == 3, s"expected 3 diff ops: $s2")
    assert(Qoi.decodeStrict(b2).rgba.toSeq == Seq(10, 11, 12, 13).map(grey))
  }

  test("a 62-pixel run splits at the spec's maximum run length") {
    val px = Array.fill(100)(grey(42))
    val (bytes, stats) = Qoi.encodeWithStats(100, 1, px)
    assert(stats("run") >= 2, "100 identical pixels must need >1 run op")
    assert(Qoi.decodeStrict(bytes).rgba.forall(_ == grey(42)))
  }

  test("decodeStrict rejects malformed streams with IllegalArgumentException only") {
    val good = Qoi.Builder.grey8(6, 4,
      Array.tabulate(24)(i => (i * 11 % 256).toByte))
    Qoi.decodeStrict(good) // sanity
    def rejects(b: Array[Byte], what: String): Unit =
      assertThrows[IllegalArgumentException](Qoi.decodeStrict(b))
    rejects(good.take(10), "short header")
    rejects(good.take(good.length - 9), "truncated ops")
    rejects(good.dropRight(1) :+ 9.toByte, "bad end marker")
    rejects(good :+ 0.toByte, "trailing bytes")
    val bomb = good.clone()
    bomb(4) = 0x7f; bomb(8) = 0x7f // ~2^30 x 2^30 pixels
    rejects(bomb, "dimension bomb")
    val zero = good.clone(); zero(4) = 0; zero(5) = 0; zero(6) = 0; zero(7) = 0
    rejects(zero, "zero width")
    // run past pixel count: 2x1 image, run of 10
    rejects(header(2, 1) ++ Array[Byte](0xfe.toByte, 1, 2, 3,
      (0xc0 | 9).toByte) ++ endMarker, "run overshoot")
    // 20k-corruption soak: every outcome is decode-or-reject, nothing
    // else ever escapes
    val rnd = new scala.util.Random(0x901L)
    (0 until 20000).foreach { _ =>
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      try Qoi.decodeStrict(mut)
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("FormatAwareCodec dispatches qoif magic to the real decoder") {
    val w = 5; val h = 3
    val px = Array.tabulate(w * h)(i => (i * 17 % 256).toByte)
    val feats = new Multimodal.FormatAwareCodec()
      .decodeBatch(Seq(Multimodal.MediaRow(9L, "image",
        Qoi.Builder.grey8(w, h, px))))
    assert(feats.head.width == w && feats.head.height == h)
    assert(feats.head.avgLumaMilli ==
      px.map(_ & 0xff).map(_.toLong).sum * 1000 / (w * h))
  }
}
