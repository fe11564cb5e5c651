package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** VP8L decode against the builder's real bitstreams: exact pixel
  * round-trips through both prefix-code kinds (fixed 8-bit literals
  * and the 9-bit + LZ77 tree), the subtract-green inverse, run
  * backrefs, and the container walk — plus rejection of the
  * malformed shapes the decoder must refuse rather than mis-decode.
  */
class WebpSpec extends AnyFunSuite {

  private def greys(d: Webp.Decoded): Array[Int] = d.argb.map { p =>
    val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
    assert(r == g && g == b && (p >>> 24) == 255,
      f"non-grey/translucent pixel $p%08x")
    g
  }

  test("literal mode round-trips every pixel value exactly") {
    val w = 16; val h = 16
    val px = Array.tabulate(w * h)(i => i.toByte) // all 256 values
    val d = Webp.decode(Webp.Builder.grey8(w, h, px)).get
    assert(d.width == w && d.height == h)
    assert(greys(d).toSeq == px.map(_ & 0xff).toSeq)
  }

  test("run mode round-trips exactly, through real LZ77 backrefs") {
    val w = 32; val h = 16
    // plateaus force the length symbols incl. the extra-bit one,
    // with literals interleaved; large enough that the backrefs beat
    // the run-mode tree's bigger header
    val px = Array.tabulate(w * h)(i => ((i / 6) * 37 % 256).toByte)
    val d = Webp.decode(Webp.Builder.grey8(w, h, px, withRuns = true)).get
    assert(greys(d).toSeq == px.map(_ & 0xff).toSeq)
    // the run stream must actually be smaller than the literal one
    // (proof the backrefs are really in the bits, not just accepted)
    assert(Webp.Builder.grey8(w, h, px, withRuns = true).length <
      Webp.Builder.grey8(w, h, px).length)
  }

  test("property: arbitrary images round-trip in both modes") {
    val gen = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 24)
      runs <- Gen.oneOf(true, false)
      px <- Gen.listOfN(w * h, Gen.choose(0, 255))
    } yield (w, h, runs, px.map(_.toByte).toArray)
    val prop = Prop.forAll(gen) { case (w, h, runs, px) =>
      val d = Webp.decode(Webp.Builder.grey8(w, h, px, withRuns = runs))
      d.exists(dd => dd.width == w && dd.height == h &&
        greys(dd).toSeq == px.map(_ & 0xff).toSeq)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: all 14 predictor modes round-trip through real transform streams") {
    val gen = for {
      w <- Gen.choose(1, 20)
      h <- Gen.choose(1, 20)
      mode <- Gen.choose(0, 13)
      px <- Gen.listOfN(w * h, Gen.choose(0, 255))
    } yield (w, h, mode, px.map(_.toByte).toArray)
    val prop = Prop.forAll(gen) { case (w, h, mode, px) =>
      val d = Webp.decode(Webp.Builder.grey8Predicted(w, h, px, mode))
      d.exists(dd => greys(dd).toSeq == px.map(_ & 0xff).toSeq)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("predictor semantics pinned at the spec's two sharp edges") {
    // top-right at the rightmost column wraps to the CURRENT row's
    // leftmost pixel (mode 3 = TR): img laid out 2×2, predicting
    // (1,1) must read img(1*2+0), not the top pixel
    val img = Array(0xff000000 | 0x010101, 0xff000000 | 0x050505,
      0xff000000 | 0x090909, 0)
    assert(Webp.predictAt(img, 2, 1, 1, 3) == img(2),
      "TR at the right edge must wrap to the row's leftmost pixel")
    // Select tie (pL == pT) goes to TOP per the spec's strict <
    val l = 0xff000000 | (10 << 8)
    val t = 0xff000000 | (20 << 8)
    val tl = 0xff000000 | (15 << 8) // equidistant: |pred-L| == |pred-T|
    val img2 = Array(tl, t, l, 0)
    assert(Webp.predictAt(img2, 2, 1, 1, 11) == t,
      "Select must return TOP on a Manhattan-distance tie")
  }

  test("property: the color cache round-trips and actually compresses repeats") {
    val gen = for {
      w <- Gen.choose(2, 24)
      h <- Gen.choose(2, 24)
      bits <- Gen.oneOf(1, 2, 4, 6)
      // few distinct values → dense cache hits
      px <- Gen.listOfN(w * h, Gen.choose(0, 7).map(v => (v * 31).toByte))
    } yield (w, h, bits, px.toArray)
    val prop = Prop.forAll(gen) { case (w, h, bits, px) =>
      val d = Webp.decode(Webp.Builder.grey8Cached(w, h, px, bits))
      d.exists(dd => greys(dd).toSeq == px.map(_ & 0xff).toSeq)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
    // on a highly repetitive image the cache-hit symbols must beat
    // the 8-bit literal stream despite the bigger tree header
    val w = 32; val h = 32
    val rep = Array.tabulate(w * h)(i => ((i % 4) * 50).toByte)
    assert(Webp.Builder.grey8Cached(w, h, rep, 4).length <
      Webp.Builder.grey8(w, h, rep).length,
      "cache hits must be real bit savings, not just accepted syntax")
  }

  test("property: color-indexed images round-trip through every bundling width") {
    val gen = for {
      nCol <- Gen.oneOf(1, 2, 3, 4, 9, 16, 20) // widthBits 3,3,2,2,1,1,0
      w <- Gen.choose(1, 21)
      h <- Gen.choose(1, 12)
      pal <- Gen.listOfN(nCol, Gen.choose(0, 255))
      idx <- Gen.listOfN(w * h, Gen.choose(0, nCol - 1))
    } yield (w, h, pal.toArray, idx.map(_.toByte).toArray)
    val prop = Prop.forAll(gen) { case (w, h, pal, idx) =>
      val d = Webp.decode(Webp.Builder.grey8Indexed(w, h, idx, pal))
      d.exists { dd =>
        dd.width == w && dd.height == h &&
          greys(dd).toSeq == idx.map(i => pal(i & 0xff) & 0xff).toSeq
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("malformed input is refused, never mis-decoded") {
    val good = Webp.Builder.grey8(4, 4, Array.fill(16)(7.toByte))
    // truncations at every byte boundary must return None, not throw
    for (cut <- 0 until good.length)
      assert(Webp.decode(good.take(cut)).isEmpty || cut >= good.length - 1,
        s"truncation at $cut must not decode")
    // a dimension bomb is refused before allocation
    val bomb = {
      val b = good.clone()
      // VP8L payload starts at byte 20 (RIFF 12 + chunk header 8);
      // bytes after the 0x2f signature carry 14+14 bits of dims
      b(21) = 0xff.toByte; b(22) = 0xff.toByte; b(23) = 0xff.toByte
      b(24) = 0xff.toByte
      b
    }
    assert(Webp.decode(bomb).isEmpty)
    // wrong container fourCC falls through
    assert(Webp.decode("RIFFxxxxWAVE".getBytes("ISO-8859-1")).isEmpty)
  }

  test("luma of a constant grey image is exactly 1000x its value") {
    val d = Webp.decode(Webp.Builder.grey8(5, 3,
      Array.fill(15)(137.toByte))).get
    assert(Webp.lumaMilliOf(d) == 137000L)
  }
}
