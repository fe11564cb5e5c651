package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL contract pins beyond what cross-engine bit-parity can show:
  * rho is really the leading-zero rank (hand-computed hashes), the
  * merge property holds for an arbitrary split of the input, and the
  * estimate actually tracks the exact count within the m=64 error
  * envelope at both testdata regimes.
  */
class SketchQueriesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private def regMap(src: org.apache.spark.sql.DataFrame) =
    SketchQueries.registersOf(src, "g").collect()
      .map(r => r.getInt(1) -> r.getInt(2)).toMap

  test("rho equals hand-computed leading-zero rank of the md5 suffix") {
    import spark.implicits._
    val ids = Seq(7L, 42L, 123456789L)
    val got = SketchQueries.registersOf(
      ids.map(i => ("g", i)).toDF("g", "user_id"), "g")
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    val want = ids.map { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val (bucket, sfx) = ((h % 64).toInt, h / 64)
      bucket -> (if (sfx == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(sfx)))
    }.groupBy(_._1).map { case (b, vs) => b -> vs.map(_._2).max }
    assert(got == want, s"got $got want $want")
  }

  test("register merge (max per bucket) equals registers of the union") {
    import spark.implicits._
    val a = (0L until 300L).map(("g", _)).toDF("g", "user_id")
    val b = (200L until 700L).map(("g", _)).toDF("g", "user_id")
    val merged = (regMap(a).toSeq ++ regMap(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(merged == regMap(a.unionByName(b)),
      "max-merge of part registers diverged from whole-input registers")
  }

  test("CMS point estimates dominate exact counts and are tight for heavy keys") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = SketchQueries.queries("q_cms_heavy")(spark, d).collect()
      assert(rows.length == 10, s"$d: expected 10 heavy hitters")
      rows.foreach { r =>
        val (exact, est) = (r.getLong(1), r.getLong(2))
        // one-sided error: CMS never under-counts
        assert(est >= exact, s"$d: CMS under-counted $r")
        // ε = e/w ≈ 2.1% of stream length per the (ε,δ) guarantee;
        // allow the full bound (n ≤ 10·events here, loose but honest)
        val n = rows.map(_.getLong(1)).sum * 10
        assert(est - exact <= math.max(4, n / 37),
          s"$d: CMS error beyond the e/w envelope: $r")
      }
    }
  }

  test("KMV: below-k sets are exact; above-k estimates stay in the k=32 envelope") {
    // a hand-built corpus with both sets smaller than k — the sketch
    // IS the set, the guard branch must return the exact counts
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kmv").toString
    (0L until 20L).map(i => (i,
        "t", if (i % 2 == 0) "en" else "de", "s",
        if (i < 8) 500L else 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val small = SketchQueries.queries("q_kmv_intersect")(spark, dir)
      .collect().head
    assert(small.getLong(0) == 8 && small.getLong(1) == 10 &&
           small.getLong(2) == 4, s"hand corpus misread: $small")
    assert(small.getDouble(3) == 8.0 && small.getDouble(4) == 10.0 &&
           small.getDouble(5) == 4.0, s"below-k branch not exact: $small")
    // sf0.01: all three sets exceed k — estimates, not copies, and
    // within a generous 1/sqrt(k-1) * 4 envelope
    val big = SketchQueries.queries("q_kmv_intersect")(
      spark, "/root/testdata/sf0.01").collect().head
    for ((e, x) <- Seq(big.getDouble(3) -> big.getLong(0),
                       big.getDouble(4) -> big.getLong(1),
                       big.getDouble(5) -> big.getLong(2))) {
      assert(math.abs(e - x) <= 0.75 * x + 2,
        s"KMV estimate $e vs exact $x out of envelope: $big")
    }
    assert(big.getDouble(3) != big.getLong(0).toDouble,
      "above-k path suspiciously returned the exact count")
  }

  test("source-KMV matrix: disjoint pairs are provably 0; overlaps stay in envelope") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = SketchQueries.queries("dd_source_kmv")(spark, d).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (exact, est) = (r.getLong(2), r.getLong(3))
        // soundness: sources sharing NO shingle have both=0 in every
        // union sketch — a zero exact Jaccard can never be estimated
        // nonzero (the property that makes the sketch safe as a
        // contamination pre-filter)
        if (exact == 0) assert(est == 0, s"$d: phantom overlap $r")
        // k=64 noise envelope, ~4 sigma absolute
        assert(math.abs(est - exact) <= 650, s"$d: out of envelope $r")
      }
      assert(rows.exists(_.getLong(3) > 0), s"$d: all-zero matrix pins nothing")
    }
  }

  test("CMS inner product dominates the true join cardinality") {
    val r = SketchQueries.queries("q_cms_join_card")(
      spark, "/root/testdata/sf0.01").collect().head
    val (truth, est) = (r.getLong(0), r.getLong(1))
    assert(truth > 0, "degenerate zero-cardinality join proves nothing")
    assert(est >= truth, s"inner-product estimate $est under true $truth")
    assert(est <= truth * 3, s"estimate $est implausibly loose vs $truth")
  }

  test("estimates track exact counts within the m=64 error envelope") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = SketchQueries.queries("q_hll_users")(spark, d).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (exact, est) = (r.getLong(1), r.getDouble(2))
        // 1.04/sqrt(64) = 13% stderr; allow 4 sigma
        assert(math.abs(est - exact) <= 0.52 * exact + 2,
          s"$d ${r.getString(0)}: est $est vs exact $exact out of envelope")
      }
    }
  }
}
