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
  *   - the bit positions are computed DISTRIBUTED, and only the ≤ m
  *     distinct set bits cross to the driver — a control-plane read;
  *   - the membership test is a plain Column over a packed
  *     array<long> LITERAL (element_at + shift + bitwise-and) built
  *     entirely from codegen-native expressions, so the probe runs
  *     INSIDE the fact scan's whole-stage-codegen span — no UDF, no
  *     custom expression, no broadcast join below the real join.
  *
  * The bit hash is seeded `xxhash64(key, r)` (r17 optimization
  * round). These bits are runtime-only — no oracle ever replays them,
  * because the exact join after the filter makes them invisible to
  * results — so the hash needs no cross-engine convention, and
  * xxhash64 evaluates on the key's NATIVE type with no string cast,
  * no hex parse, and no per-row allocation. The previous md5-slice
  * convention forced the probe through a higher-order-function
  * binding (SQL has no scalar `let`), and higher-order functions sit
  * OUTSIDE whole-stage codegen: the fact filter ran interpreted, at
  * ~10 µs/row the dominant cost of the whole query (measured r17:
  * the probe stage's task time dropped ~6× moving to codegen'd
  * xxhash64 probes).
  *
  * Sizing: m bits serve ~m/10 keys at k=2 with a low false-positive
  * rate; a saturated bloom is conservative (keeps everything), never
  * wrong. The literal is m/64 longs — 8 KiB at m=65536 — embedded in
  * the plan like any literal.
  */
object BloomJoinFilter {

  /** The r-th bit position of one key column: pmod(xxhash64(key, r), m).
    * Seeding by r makes the k probes independent; xxhash64 hashes the
    * key's native representation (no string cast). Runtime-only bits —
    * see the class doc. */
  private def bitCol(key: Column, r: Int, m: Int): Column =
    pmod(xxhash64(key, lit(r)), lit(m.toLong))

  /** The packed m-bit bloom of `key` over `dim`'s rows: distributed
    * bit computation, ≤ m distinct bits collected, driver packs. */
  def build(dim: DataFrame, key: Column, m: Int, hashes: Int): Array[Long] = {
    require(m % 64 == 0, "m must pack into longs")
    require(hashes >= 1, "need at least one probe")
    val bits = dim.select(key.as("__bjf_key"))
      .filter(col("__bjf_key").isNotNull)
      .select((0 until hashes).map(r =>
        bitCol(col("__bjf_key"), r, m).as(s"b$r")): _*)
      .select(explode(array((0 until hashes).map(r => col(s"b$r")): _*))
        .as("bit"))
      .distinct().collect().map(_.getLong(0))
    val packed = new Array[Long](m / 64)
    bits.foreach(b => packed((b / 64).toInt) |= 1L << (b % 64))
    packed
  }

  /** Membership test column: true iff ALL k bit positions of the
    * named key column are set in `packed`. NULL keys test false
    * explicitly (xxhash64, unlike md5-of-cast, maps NULL to the seed
    * rather than NULL — and NULL keys never equi-join anyway).
    *
    * Every sub-expression here (xxhash64, pmod, shiftright,
    * bitwise-and, element_at on an array literal) is whole-stage-
    * codegen-friendly, so the probe fuses into the scan's generated
    * loop. xxhash64 evaluates twice per probe (element index and
    * shift amount) — at ~tens of ns per call that is far cheaper
    * than the interpreted-mode evaluation a guaranteed-once binding
    * (higher-order function) would force on the whole filter. */
  def mightContain(keyCol: String, packed: Array[Long], m: Int,
      hashes: Int): Column = {
    val bitsLit = lit(packed)
    def probe(r: Int): Column = {
      val b = bitCol(col(keyCol), r, m)
      element_at(bitsLit, (shiftright(b, 6) + 1).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          b.bitwiseAND(lit(63L)).cast("int"))) =!= lit(0L)
    }
    (0 until hashes).map(probe)
      .foldLeft(col(keyCol).isNotNull)(_ && _)
  }
}
