package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

/** Sample-level WAV contract: Wav.decode returns the exact PCM
  * samples (sign extension included), features compute the documented
  * integers on hand-checkable vectors, and malformed streams return
  * None rather than throwing.
  */
class WavFeaturesSpec extends AnyFunSuite {

  private def wav(rate: Int, samples: Seq[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)
    bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  test("decode returns exact sign-extended samples") {
    val p = Multimodal.Wav.decode(wav(8000, Seq(0, 100, -100, 32767, -32768)))
      .getOrElse(fail("decode failed"))
    assert(p.rate == 8000 && p.channels == 1)
    assert(p.samples.toSeq == Seq[Short](0, 100, -100, 32767, -32768))
  }

  test("features: zero crossings, peak, square correlation on a hand vector") {
    // samples: + + - - + - (sign runs: ++|--|+|-) -> 3 crossings;
    // peak = 32768 (the asymmetric extreme); square wave period 16
    // means all first 8 samples weigh +1
    val s = Seq(5, 7, -3, -32768, 9, -2)
    val p = Multimodal.Wav.decode(wav(8000, s)).get
    val (n, zc, peak, corr) = Multimodal.Wav.features(p)
    assert(n == 6 && zc == 3 && peak == 32768)
    assert(corr == s.sum) // all within the first +1 half-period
    // a vector crossing the period boundary: sample 8..15 weigh -1
    val s2 = (0 until 16).map(_ => 10)
    val (_, _, _, corr2) = Multimodal.Wav.features(
      Multimodal.Wav.decode(wav(8000, s2)).get)
    assert(corr2 == 0, "equal halves of a period must cancel")
  }

  test("malformed streams: None, never a throw") {
    assert(Multimodal.Wav.decode(Array[Byte](1, 2, 3)).isEmpty)
    val good = wav(8000, Seq(1, 2, 3))
    val badMagic = good.clone(); badMagic(9) = 'X'
    assert(Multimodal.Wav.decode(badMagic).isEmpty)
    // data chunk but no fmt before it: no sample contract
    val noFmt = good.clone()
    noFmt(12) = 'j'; noFmt(13) = 'u'; noFmt(14) = 'n'; noFmt(15) = 'k'
    assert(Multimodal.Wav.decode(noFmt).isEmpty)
    // negative declared chunk size bails instead of walking backwards
    val negSize = good.clone(); negSize(16 + 3) = 0x80.toByte
    assert(Multimodal.Wav.decode(negSize).isEmpty)
    // truncated data chunk still yields the samples that fit
    val p = Multimodal.Wav.decode(good.dropRight(2)).get
    assert(p.samples.toSeq == Seq[Short](1, 2))
  }
}
