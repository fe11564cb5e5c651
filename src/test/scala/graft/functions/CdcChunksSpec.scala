package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking: boundary rule, edge cases, and the
  * property the technique exists for — an edit perturbs only the
  * chunks overlapping it, unlike fixed-width chunking where one
  * insertion shifts every downstream chunk. The DuckDB oracle for
  * `dd_cdc_dupfrac` pins the arithmetic cross-engine; these tests pin
  * the expression's local semantics and its plan placement.
  */
class CdcChunksSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def chunksOf(s: String, w: Int = 8, div: Long = 64L): Seq[String] = {
    val a = CdcChunks.chunks(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), w, div)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  /** Straight-line reference: full H recompute at every position. */
  private def referenceChunks(s: String, w: Int, div: Long): Seq[String] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    val bpos = (w to n).filter { i =>
      val h = (0 until w).map(j => cps(i - 1 - j) *
        BigInt(31).pow(j)).sum
      h % div == 0
    }
    val bounds = (0 +: bpos :+ n).distinct
    bounds.zip(bounds.tail).map { case (a, b) =>
      new String(cps, a, b - a)
    }.filter(_.nonEmpty)
  }

  test("rolling hash boundaries match the straight-line recompute") {
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val s = (0 until 30 + rnd.nextInt(400))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      assert(chunksOf(s) == referenceChunks(s, 8, 64L))
      assert(chunksOf(s).mkString == s, "chunks must concatenate back to the input")
    }
  }

  test("edges: empty, shorter than the window, multibyte codepoints") {
    assert(chunksOf("") == Seq.empty)
    assert(chunksOf("abc") == Seq("abc")) // no window fits: one chunk
    val zh = "中文内容去重分块中文内容去重分块与内容定义边界"
    assert(chunksOf(zh) == referenceChunks(zh, 8, 64L))
    assert(chunksOf(zh).mkString == zh)
    // astral-plane codepoints (surrogate pairs in the JVM): chunk
    // boundaries and reassembly must count CODEPOINTS, not UTF-16
    // units — a charAt-based walk would split surrogate pairs
    val emoji = "data 😀 with 🚀 astral 🍕 codepoints repeated " * 4
    assert(chunksOf(emoji) == referenceChunks(emoji, 8, 64L))
    assert(chunksOf(emoji).mkString == emoji)
  }

  test("an insertion only perturbs chunks overlapping the edit point") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = base.substring(0, 10) + "XYZ" + base.substring(10)
    val cb = chunksOf(base)
    val ce = chunksOf(edited)
    // everything after the first boundary past the edit is untouched:
    // the shared suffix of the two chunk SEQUENCES covers almost all
    // of the text (fixed-width chunking would share nothing)
    val sharedSuffix = cb.reverse.zip(ce.reverse).takeWhile { case (a, b) => a == b }
    val sharedChars = sharedSuffix.map(_._1.length).sum
    assert(sharedChars > base.length / 2,
      s"CDC must preserve chunks after the edit: only $sharedChars of ${base.length} chars shared")
  }

  test("the expression runs inside whole-stage codegen in a DataFrame plan") {
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog " * 10)
      .toDF("text")
      .select(explode(ColumnBridge.column(CdcChunks(
        ColumnBridge.expression(col("text"))))).as("chunk"))
    val plan = df.queryExecution.executedPlan.toString()
    // the "*(1)" prefix is the whole-stage-codegen stage marker
    assert(plan.contains("*(1) Generate explode(cdc_chunks"),
      s"cdc_chunks must not break codegen:\n$plan")
    assert(df.collect().map(_.getString(0)).mkString ==
      "the quick brown fox jumps over the lazy dog " * 10)
  }
}
