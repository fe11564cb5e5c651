package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** BPE trainer semantics on a corpus built to have a known merge
  * order — the DuckDB oracle pins cross-engine arithmetic on the real
  * testdata; this pins the ALGORITHM: frequency-weighted pair counts,
  * the deterministic tie-break, and the greedy non-overlapping merge
  * application ('z z z' merges left-to-right to 'zz z', never 'z zz').
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpusDir(docs: Seq[String]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bpe").toString
    docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "test", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("merge order follows weighted counts; application is greedy left-to-right") {
    // 'zzz' x4: pair (z,z) counts 2 per instance = 8 — the round-1 winner.
    // Greedy: 'z z z' -> 'zz z' (the overlapping second (z,z) cannot fire).
    // Round 2's best is then (zz,z) with count 4; 'ab' x3 contributes
    // (a,b)=3 which wins round 3; (w,x)=2 wins round 4.
    val dir = corpusDir(Seq("zzz zzz ab wx", "zzz zzz ab wx", "ab"))
    val learned = SparkEntry.queries("tx_bpe_train")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
    val winners = learned.filter(_._2 == 1).sortBy(_._1)
    assert(winners.map(w => (w._3, w._4, w._5)).toSeq ==
      Seq(("z", "z", 8L), ("zz", "z", 4L), ("a", "b", 3L), ("w", "x", 2L)),
      s"unexpected merge order: ${winners.mkString(", ")}")

    // encode side: 'zzz' is one token after round 2, 'ab' one after
    // round 3, 'wx' one after round 4 — doc 0 has 4 words, 4 tokens,
    // 10 word-chars
    val enc = SparkEntry.queries("tx_bpe_encode")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(enc(0L) == ((4L, 4L, 400L)), s"doc 0 encoded as ${enc(0L)}")
    assert(enc(2L) == ((1L, 1L, 500L)), s"doc 2 encoded as ${enc(2L)}")
  }

  test("a 4-run word fully collapses: runs of the merged pair merge to fixpoint") {
    // 'zzzz' freq 4 → (z,z) = 12 wins round 1 and the run-collapsing
    // merge must yield [zz, zz] (a single replace pass would leave
    // [zz, z, z], making round 2's winner (zz,z) instead of (zz,zz))
    val dir = corpusDir(Seq("zzzz zzzz ab wx", "zzzz ab wx", "zzzz"))
    val learned = SparkEntry.queries("tx_bpe_train")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
    val winners = learned.filter(_._2 == 1).sortBy(_._1)
    assert(winners.map(w => (w._3, w._4, w._5)).toSeq ==
      Seq(("z", "z", 12L), ("zz", "zz", 4L), ("a", "b", 2L), ("w", "x", 2L)),
      s"run must collapse to fixpoint: ${winners.mkString(", ")}")
    // after round 2, 'zzzz' is ONE token: doc 2 = 1 word / 1 token /
    // 4 chars → 250 tokens per 1000 word-chars
    val enc = SparkEntry.queries("tx_bpe_encode")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(enc(2L) == ((1L, 1L, 250L)), s"doc 2 encoded as ${enc(2L)}")
  }

  test("tie-break is lexicographic on (left, right) at equal counts") {
    // (b,c) and (a,d) both count 2; (a,d) < (b,c) lexicographically
    val dir = corpusDir(Seq("xbc ybc", "adq adr"))
    val first = SparkEntry.queries("tx_bpe_train")(spark, dir)
      .filter("round = 1 AND rank = 1").collect()(0)
    assert((first.getString(2), first.getString(3)) == (("a", "d")),
      s"tie must break lexicographically, got ${first.getString(2)},${first.getString(3)}")
  }
}
