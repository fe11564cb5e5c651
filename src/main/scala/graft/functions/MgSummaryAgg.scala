package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitter summary as pure map algebra — shared by
  * the Catalyst aggregate below and the streaming twin
  * ([[graft.streaming.StreamingHeavyHitters]]), so both paths run the
  * SAME canonical arithmetic.
  *
  * The summary is a (key → count) map with at most `cap` entries:
  *   - while distinct keys fit, counts are EXACT (update is +1, merge
  *     is pointwise sum) — the regime every oracle runs in, which is
  *     what makes the DuckDB gate a real recompute-from-exact-counts
  *     check;
  *   - past `cap`, the classic MG reduction applies: subtract the
  *     (cap+1)-st largest count — largest under the CANONICAL
  *     (count desc, key asc) total order, so ties decrement
  *     identically everywhere — from every entry and drop the
  *     non-positive ones. At most `cap` entries survive (only counts
  *     STRICTLY above the threshold do).
  *
  * Guarantees (Misra–Gries 1982; merge rule per Agarwal et al. 2013,
  * "Mergeability of Summaries" — public literature): for every key,
  * summary(x) ≤ exact(x), exact(x) − summary(x) ≤ N/(cap+1) under any
  * update/merge tree, and hence every key with exact(x) > N/(cap+1)
  * is present. Pinned in MgAggSpec's overflow-regime cases.
  */
object MgSummary {

  /** Default capacity: comfortably above the test corpora's distinct
    * keys per group (exact regime — deterministic oracle hashes) while
    * bounding the buffer at ≤ 128 KiB; at 100 TB the same constant
    * gives the ε = 1/(cap+1) frequency guarantee. */
  val Cap = 8192

  /** The final heavy-hitter cut: k entries with guaranteed-lower-bound
    * counts, via the one-shot rule (threshold = (k+1)-st largest
    * count; keys strictly above it survive — ≤ k of them by
    * definition, no tie-break needed for the SET). */
  val K = 16

  type Summary = scala.collection.mutable.HashMap[Long, Long]

  def empty: Summary = scala.collection.mutable.HashMap.empty[Long, Long]

  /** Add `n` occurrences of `key`, reducing if the map outgrew cap. */
  def add(m: Summary, key: Long, n: Long, cap: Int): Unit = {
    m.update(key, m.getOrElse(key, 0L) + n)
    if (m.size > cap) reduce(m, cap)
  }

  /** Pointwise-sum `b` into `a`, then reduce — the MG merge. */
  def mergeInto(a: Summary, b: Summary, cap: Int): Unit = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > cap) reduce(a, cap)
  }

  /** Subtract the (cap+1)-st largest count (canonical order) from
    * every entry; keep strictly positive remainders. */
  def reduce(m: Summary, cap: Int): Unit = {
    if (m.size <= cap) return
    val t = kthLargest(m, cap + 1)
    m.filterInPlace((_, c) => c - t > 0)
    m.mapValuesInPlace((_, c) => c - t)
  }

  /** The j-th largest count under (count desc, key asc); 0 when the
    * map holds fewer than j entries. Ties in count make the key
    * tie-break irrelevant for the RETURNED value, so this selects on
    * the count multiset alone — never a full sort: the overflow hot
    * path (size = cap+1 on every add past capacity) is a plain O(cap)
    * min scan, and the merge path (size up to 2·cap) is an in-place
    * quickselect — O(cap) expected vs the former O(cap log cap) sort
    * per over-capacity add, a throughput cliff in exactly the 100 TB
    * regime the sketch exists for. */
  def kthLargest(m: Summary, j: Int): Long =
    if (m.size < j) 0L
    else if (m.size == j) { // j-th largest of j values = the minimum
      var mn = Long.MaxValue
      m.foreach { case (_, c) => if (c < mn) mn = c }
      mn
    } else {
      val a = new Array[Long](m.size)
      var i = 0
      m.foreach { case (_, c) => a(i) = c; i += 1 }
      quickselectAsc(a, a.length - j) // j-th largest = (n−j)-th ascending
    }

  /** In-place deterministic quickselect: the value that would sit at
    * ascending index `k` after a full sort. Median-of-three pivot;
    * falls back to nothing fancier because counts are near-uniform
    * after MG reductions. */
  private def quickselectAsc(a: Array[Long], k: Int): Long = {
    var lo = 0
    var hi = a.length - 1
    while (lo < hi) {
      val mid = lo + (hi - lo) / 2
      // median-of-three pivot, deterministic
      val p = math.max(math.min(a(lo), a(mid)),
        math.min(math.max(a(lo), a(mid)), a(hi)))
      var i = lo
      var j = hi
      while (i <= j) {
        while (a(i) < p) i += 1
        while (a(j) > p) j -= 1
        if (i <= j) {
          val t = a(i); a(i) = a(j); a(j) = t
          i += 1; j -= 1
        }
      }
      if (k <= j) hi = j
      else if (k >= i) lo = i
      else return a(k)
    }
    a(k)
  }

  /** Canonical render: (key, count) pairs sorted count desc, key asc. */
  def sorted(m: Summary): Seq[(Long, Long)] =
    m.toSeq.sortBy { case (k, c) => (-c, k) }
}

/** `mg_summary(key)` — the heavy-hitter member of the engine's
  * imperative-aggregate trio-turned-quartet next to
  * [[HllRegistersAgg]], [[CmsCountersAgg]] and [[KmvBottomKAgg]]: the
  * aggregation buffer IS the Misra–Gries summary (≤ cap entries, ≤
  * 128 KiB serialized), update folds one key, merge is the canonical
  * MG pointwise-sum-then-reduce, and the result is the summary as an
  * array of (k, c) structs in (count desc, key asc) order — ready for
  * `inline()` into rows. Exact below capacity (the oracle regime),
  * ε = 1/(cap+1) above it (the 100 TB regime, bound pinned in
  * MgAggSpec).
  */
case class MgSummaryAgg(
    child: Expression,
    cap: Int = MgSummary.Cap,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary.Summary]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): MgSummary.Summary =
    MgSummary.empty

  override def update(buf: MgSummary.Summary,
      input: InternalRow): MgSummary.Summary = {
    val v = child.eval(input)
    if (v != null) MgSummary.add(buf, v.asInstanceOf[Long], 1L, cap)
    buf
  }

  override def merge(a: MgSummary.Summary,
      b: MgSummary.Summary): MgSummary.Summary = {
    MgSummary.mergeInto(a, b, cap)
    a
  }

  override def eval(buf: MgSummary.Summary): Any =
    new GenericArrayData(MgSummary.sorted(buf).map { case (k, c) =>
      new GenericInternalRow(Array[Any](k, c))
    }.toArray[Any])

  override def serialize(buf: MgSummary.Summary): Array[Byte] = {
    // canonical order so a serialized buffer is bit-stable for a
    // given summary (useful for replay-identical appends downstream)
    val bb = java.nio.ByteBuffer.allocate(16 * buf.size)
    MgSummary.sorted(buf).foreach { case (k, c) =>
      bb.putLong(k); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgSummary.Summary = {
    val buf = MgSummary.empty
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.update(bb.getLong(), bb.getLong())
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"mg_summary needs a BIGINT key, got ${child.dataType}")

  override def withNewMutableAggBufferOffset(o: Int): MgSummaryAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgSummaryAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MgSummaryAgg =
    copy(child = c)
  override def prettyName: String = "mg_summary"
}
