package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass bottom-k (KMV / theta-style) sketch aggregation — the
  * custom Catalyst aggregate form of [[graft.queries.SketchQueries]]'
  * relational KMV, completing the imperative-twin trio next to
  * [[HllRegistersAgg]] and [[CmsCountersAgg]]: the aggregation buffer
  * IS the sketch (≤ k sorted distinct hashes, ≤ 8k bytes per group),
  * update inserts one hash if it beats the current k-th minimum,
  * merge is a sorted dedup-merge truncated to k, and the result is
  * the ascending bottom-k array — exactly what
  * `groupBy(h).orderBy(h).limit(k)` produces relationally, so the
  * two paths must agree element for element (pinned in KmvAggSpec
  * and cross-checked by the `q_kmv_agg` oracle).
  *
  * KMV is over DISTINCT hashes, so update and merge both dedup —
  * re-inserting a present hash is a no-op, which also makes the
  * aggregate replay-safe. The k-th minimum estimates the distinct
  * count as (k−1)·2⁶⁰/h₍ₖ₎ (Bar-Yossef et al. 2002); below k the
  * buffer holds the EXACT distinct set.
  *
  * Input: the engine's 60-bit md5-prefix hash (a LONG — the hash
  * itself stays in codegen'd SQL; only the bottom-k fold is
  * imperative).
  */
case class KmvBottomKAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  private def K = KmvBottomKAgg.K

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < K) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > K) buf.pollLast() }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    while (a.size > K) a.pollLast()
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_bottomk needs a BIGINT hash, got ${child.dataType}")

  override def withNewMutableAggBufferOffset(o: Int): KmvBottomKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvBottomKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvBottomKAgg =
    copy(child = c)
  override def prettyName: String = "kmv_bottomk"
}

object KmvBottomKAgg {
  /** THE k — the single definition the imperative buffer, the
    * relational twin, and the DuckDB oracle all derive from
    * (SketchQueries.KmvK aliases it); three hardcoded copies would
    * silently desync on the next tuning change. */
  val K = 32
}
