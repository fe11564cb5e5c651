package graft
import graft.analytics.Multimodal
object GifFuzz {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(1234)
    var decoded = 0L; var refused = 0L
    val base = (0 until 40).map { i =>
      val w = 3 + i % 9; val h = 2 + i % 7
      val px = Array.tabulate(w * h)(j => ((i * 31 + j * 7) % 256).toByte)
      if (i % 3 == 0) Multimodal.GifBuilder.grey8(w, h, px, interlaced = i % 6 == 0)
      else Multimodal.GifBuilder.animGrey8(w, h,
        (0 until 2).map(f => Array.tabulate(w * h)(j => ((f * 50 + j) % 256).toByte)),
        Seq(3, 4))
    }
    var n = 0
    while (n < 20000) {
      val src = base(rnd.nextInt(base.length))
      val mut = src.clone()
      rnd.nextInt(4) match {
        case 0 => // random byte flips (1-8)
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte }
        case 1 => // truncate anywhere
          val cut = java.util.Arrays.copyOfRange(mut, 0, 1 + rnd.nextInt(mut.length))
          val fs = Multimodal.Gif.frames(cut)
          if (fs.nonEmpty) decoded += 1 else refused += 1
          n += 1
        case 2 => // splice random garbage into the middle
          val at = rnd.nextInt(mut.length)
          System.arraycopy(Array.fill[Byte](math.min(16, mut.length - at))(rnd.nextInt(256).toByte),
            0, mut, at, math.min(16, mut.length - at))
        case 3 => // corrupt the LZW region specifically (past header+palette)
          val start = math.min(mut.length - 1, 13 + 768)
          (0 until 4).foreach { _ =>
            val at = start + rnd.nextInt(math.max(1, mut.length - start))
            mut(at) = rnd.nextInt(256).toByte }
      }
      val fs = Multimodal.Gif.frames(mut)
      fs.foreach(f => Multimodal.Gif.lumaMilliOf(f))
      if (fs.nonEmpty) decoded += 1 else refused += 1
      // also push through the codec interface (dims/duration paths)
      new Multimodal.GifCodec().decodeBatch(Seq(Multimodal.MediaRow(n.toLong, "image", mut)))
      n += 1
    }
    println(s"[gif-fuzz] $n inputs, decoded-some=$decoded refused=$refused, zero exceptions")
  }
}
