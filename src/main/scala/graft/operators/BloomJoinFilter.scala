package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime bloom filter for joins — sideways information passing, the
  * classic 100 TB join optimization: when a selective predicate cuts
  * the dimension side down, build a bloom over the surviving join
  * keys and pre-filter the FACT side before its shuffle, so ~never-
  * matching rows die at the scan instead of crossing the wire into
  * the join. The exact join still runs after the filter, so bloom
  * false positives cost only bytes, never correctness — a query's
  * result (and its oracle hash) is identical with or without the
  * filter, which is what makes the optimization safely droppable.
  *
  * Mechanics kept deliberately engine-native:
  *   - the bit positions are computed DISTRIBUTED with the pack-wide
  *     md5 convention (same arithmetic as the CMS rows and the file
  *     index's per-file blooms), and only the ≤ m distinct set bits
  *     cross to the driver — a control-plane read;
  *   - the membership test is a plain Column over a packed
  *     array<long> LITERAL (element_at + shiftleft + bitwise-and),
  *     so it stays inside whole-stage codegen on the fact scan's
  *     pipeline — no UDF, no custom expression, no broadcast join
  *     below the real join.
  *
  * Sizing: m bits serve ~m/10 keys at k=2 with a low false-positive
  * rate; a saturated bloom is conservative (keeps everything), never
  * wrong. The literal is m/64 longs — 8 KiB at m=65536 — embedded in
  * the plan like any literal.
  */
object BloomJoinFilter {

  /** The r-th bit position: the r-th 8-hex-char slice of ONE md5 of
    * the key — a single hash invocation serves all k probes (the fact
    * side evaluates this per row per probe; md5 dominates, so one
    * digest instead of k halves the scan-side cost at k = 2). Runtime-
    * only bits — no oracle ever replays them, because the exact join
    * after the filter makes them invisible to results. */
  private def bitExpr(keySql: String, r: Int, m: Int): String =
    s"cast(conv(substring(md5(cast($keySql as string))," +
      s" ${1 + 8 * r}, 8),16,10) as bigint) % $m"

  /** The packed m-bit bloom of `key` over `dim`'s rows: distributed
    * bit computation, ≤ m distinct bits collected, driver packs. */
  def build(dim: DataFrame, key: Column, m: Int, hashes: Int): Array[Long] = {
    require(m % 64 == 0, "m must pack into longs")
    require(hashes >= 1 && hashes <= 4, "an md5 yields four 8-hex slices")
    val bits = dim.select(key.as("__bjf_key"))
      .filter(col("__bjf_key").isNotNull)
      .select((0 until hashes).map(r =>
        expr(bitExpr("__bjf_key", r, m)).as(s"b$r")): _*)
      .select(explode(array((0 until hashes).map(r => col(s"b$r")): _*))
        .as("bit"))
      .distinct().collect().map(_.getLong(0))
    val packed = new Array[Long](m / 64)
    bits.foreach(b => packed((b / 64).toInt) |= 1L << (b % 64))
    packed
  }

  /** Membership test column: true iff ALL k bit positions of the
    * named key column are set in `packed`. NULL keys test false (they
    * never equi-join anyway).
    *
    * The md5 digest is bound ONCE per row via a single-element
    * `transform` lambda (SQL has no scalar `let`; a lambda argument is
    * the one place Catalyst guarantees a named subexpression is
    * evaluated exactly once), then every probe slices that bound
    * value — a plain per-probe `expr` would embed the digest twice per
    * probe (element index and shift amount) and rely on codegen
    * subexpression elimination to avoid up to 2k md5 evaluations per
    * row. Higher-order functions sit outside whole-stage codegen, but
    * md5 dominates the per-row cost by an order of magnitude, so one
    * guaranteed digest beats k codegen'd ones. */
  def mightContain(keyCol: String, packed: Array[Long], m: Int,
      hashes: Int): Column = {
    val bitsLit = lit(packed)
    val probeBits = flatten(transform(
      array(md5(col(keyCol).cast("string"))),
      dg => transform(sequence(lit(0), lit(hashes - 1)), r =>
        conv(dg.substr(lit(1) + r * 8, lit(8)), 16, 10)
          .cast("long") % m)))
    aggregate(probeBits, lit(true), (acc, bit) =>
      acc && (element_at(bitsLit, floor(bit / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (bit % 64).cast("int"))) =!= 0))
  }
}
