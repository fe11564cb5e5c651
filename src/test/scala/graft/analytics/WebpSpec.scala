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
