package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `es_topk(key, w)` — one-pass weighted sample WITHOUT replacement:
  * the imperative form of `dd_weighted_sample`'s relational pipeline,
  * removing its O(Σw) EXPLODE (`AnalyticsQueries`): instead of
  * materializing one row per unit weight and shuffling them into a
  * group-by, each input row computes its Efraimidis–Spirakis priority
  * in a tight local loop and folds it into a ≤ k-entry buffer — the
  * [[KmvBottomKAgg]] bounded-buffer pattern with the order reversed
  * (top-k by priority desc instead of bottom-k by hash asc).
  *
  * The priority is the SAME integer identity as the relational twin,
  * bit for bit: the ES key u^(1/w) is equal in distribution to the
  * max of w iid uniforms (Efraimidis–Spirakis 2006, public
  * literature), so priority = max over the key's w unit copies of
  * the engine's 60-bit md5-prefix hash of "key:i" — no pow/ln, no
  * RNG state, and the DuckDB oracle replays it exactly. The md5 work
  * is still O(Σw) arithmetic, but it runs IN PLACE per row: no Σw-row
  * materialization, no exchange wider than the ≤ k·partitions buffer
  * merge — the difference between a sampling pass and a full corpus
  * reshuffle at 100 TB.
  *
  * Result: array of (k, w, priority) structs in (priority desc, key
  * asc) order — `inline()` plus a ≤ k-row window gives the ranked
  * sample. Ties are impossible in practice (60-bit hashes) but the
  * canonical order makes even a collision deterministic.
  */
case class EsTopKAgg(
    left: Expression,
    right: Expression,
    k: Int = EsTopKAgg.K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[EsTopKAgg.Buffer]
  with BinaryLike[Expression] {

  override def createAggregationBuffer(): EsTopKAgg.Buffer =
    EsTopKAgg.empty

  override def update(buf: EsTopKAgg.Buffer,
      input: InternalRow): EsTopKAgg.Buffer = {
    val kv = left.eval(input)
    val wv = right.eval(input)
    if (kv != null && wv != null)
      EsTopKAgg.add(buf, kv.asInstanceOf[Long],
        math.max(1L, wv.asInstanceOf[Long]), k)
    buf
  }

  override def merge(a: EsTopKAgg.Buffer,
      b: EsTopKAgg.Buffer): EsTopKAgg.Buffer = {
    b.foreach(e => EsTopKAgg.insert(a, e, k))
    a
  }

  override def eval(buf: EsTopKAgg.Buffer): Any =
    new GenericArrayData(buf.toArray.map { e =>
      new GenericInternalRow(Array[Any](e._2, e._3, e._1))
    }.toArray[Any])

  override def serialize(buf: EsTopKAgg.Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24 * buf.size)
    buf.foreach { case (p, key, w) =>
      bb.putLong(p); bb.putLong(key); bb.putLong(w)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): EsTopKAgg.Buffer = {
    val buf = EsTopKAgg.empty
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 24)
      EsTopKAgg.insert(buf, (bb.getLong(), bb.getLong(), bb.getLong()), k)
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("w", LongType, nullable = false),
      StructField("priority", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"es_topk needs (BIGINT key, BIGINT weight), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def withNewMutableAggBufferOffset(o: Int): EsTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EsTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EsTopKAgg =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "es_topk"
}

object EsTopKAgg {

  /** Sample size — matches the relational demo's cut. */
  val K = 32

  /** (priority, key, w) entries, first = best under the canonical
    * (priority desc, key asc) order. */
  type Buffer = scala.collection.mutable.TreeSet[(Long, Long, Long)]

  private val ord: Ordering[(Long, Long, Long)] =
    Ordering.by { case (p, key, _) => (-p, key) }

  def empty: Buffer =
    scala.collection.mutable.TreeSet.empty[(Long, Long, Long)](ord)

  /** The engine's 60-bit hash — the first 15 hex chars of
    * md5("key:i"), identical to the SQL
    * `conv(substring(md5(concat(key, ':', i)),1,15),16,10)`:
    * 7 whole bytes plus the high nibble of the eighth. */
  private def copyHash(md: java.security.MessageDigest, key: Long,
      i: Long): Long = {
    md.reset()
    val d = md.digest(s"$key:$i".getBytes("UTF-8"))
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Fold one (key, w) row: priority = max of the w copy hashes,
    * computed locally, then a bounded top-k insert. */
  def add(buf: Buffer, key: Long, w: Long, k: Int): Unit = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var best = Long.MinValue
    var i = 0L
    while (i < w) {
      val h = copyHash(md, key, i)
      if (h > best) best = h
      i += 1
    }
    insert(buf, (best, key, w), k)
  }

  /** Insert keeping only the k best under (priority desc, key asc). */
  def insert(buf: Buffer, e: (Long, Long, Long), k: Int): Unit = {
    if (buf.size < k) { buf.add(e); () }
    else if (ord.lt(e, buf.last)) {
      buf.add(e)
      if (buf.size > k) { buf.remove(buf.last); () }
    }
  }
}
