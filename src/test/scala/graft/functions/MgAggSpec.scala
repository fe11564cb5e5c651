package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries summary's two regimes, pinned:
  *   - EXACT below capacity: the imperative aggregate must equal the
  *     relational per-key counts element for element, merged across
  *     forced partial buffers (the regime every DuckDB oracle runs in);
  *   - ε-bounded above capacity: for every key, summary ≤ exact and
  *     exact − summary ≤ N/(cap+1), hence every key with exact >
  *     N/(cap+1) is PRESENT — the classic MG guarantee, which must
  *     hold under any partition/merge order (we force several).
  * Plus the canonical arithmetic itself on the pure map algebra.
  */
class MgAggSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // skewed synthetic keys: key j appears ~N/(j+1) times (zipf-ish),
  // deterministic
  private def zipfKeys(n: Int, keys: Int): Seq[Long] =
    (0 until n).map(i => ((i * 2654435761L) % 1000003L % keys).toLong) ++
      (0 until n / 4).map(_ => 7L) // one heavy key on top

  test("pure algebra: exact below cap, canonical reduce above") {
    val m = MgSummary.empty
    Seq(1L, 2L, 1L, 3L, 1L, 2L).foreach(MgSummary.add(m, _, 1L, cap = 8))
    assert(m.toMap == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    // overflow: cap 2, insert a 4th distinct key → threshold is the
    // 3rd largest under (count desc, key asc); survivors strictly above
    val o = MgSummary.empty
    Seq(1L, 1L, 1L, 2L, 2L, 3L).foreach(MgSummary.add(o, _, 1L, cap = 2))
    // counts now 1→3, 2→2, 3→1 at the moment 3 arrives; t = 1
    assert(o.toMap == Map(1L -> 2L, 2L -> 1L))
    // kthLargest: ties break by key asc — the canonical order
    val t = MgSummary.empty
    Seq(5L -> 4L, 9L -> 4L, 2L -> 4L).foreach { case (k, c) =>
      t.update(k, c) }
    assert(MgSummary.kthLargest(t, 2) == 4L)
    assert(MgSummary.sorted(t).map(_._1) == Seq(2L, 5L, 9L))
  }

  test("exact regime: aggregate equals relational counts across forced merges") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = zipfKeys(5000, 40).toDF("k").repartition(7)
    val got = df.agg(expr("mg_summary(k)").as("mg"))
      .select(expr("inline(mg)"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.groupBy(col("k")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "below-capacity summary must be the exact counts")
  }

  test("overflow regime: MG bounds hold under any partition order") {
    import spark.implicits._
    val n = 20000
    val keys = 3000 // ≫ cap → overflow regime
    val cap = 64
    val exact = zipfKeys(n, keys).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val total = exact.values.sum
    for (parts <- Seq(1, 5, 13)) {
      val df = zipfKeys(n, keys).toDF("k").repartition(parts)
      val agg = ColumnBridge.column(
        MgSummaryAgg(ColumnBridge.expression(col("k")), cap = cap)
          .toAggregateExpression()).as("mg")
      val got = df.agg(agg).select(expr("inline(mg)"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size <= cap, s"summary exceeded cap: ${got.size}")
      val eps = total.toDouble / (cap + 1)
      got.foreach { case (k, c) =>
        assert(c <= exact(k), s"overcount on $k: $c > ${exact(k)}")
        assert(exact(k) - c <= eps,
          s"undercount beyond N/(cap+1) on $k: ${exact(k)} - $c > $eps")
      }
      exact.filter(_._2 > eps).keys.foreach { k =>
        assert(got.contains(k), s"guaranteed-heavy key $k missing")
      }
    }
  }

  test("merge of two summaries preserves the bounds (mergeInto)") {
    val cap = 32
    val a = MgSummary.empty
    val b = MgSummary.empty
    val xs = zipfKeys(8000, 700)
    val (l, r) = xs.splitAt(xs.size / 3)
    l.foreach(MgSummary.add(a, _, 1L, cap))
    r.foreach(MgSummary.add(b, _, 1L, cap))
    MgSummary.mergeInto(a, b, cap)
    val exact = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val eps = xs.size.toDouble / (cap + 1)
    assert(a.size <= cap)
    a.foreach { case (k, c) =>
      assert(c <= exact(k) && exact(k) - c <= eps)
    }
    exact.filter(_._2 > eps).keys.foreach(k => assert(a.contains(k)))
  }
}
