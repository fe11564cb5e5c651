package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass Count-Min counter aggregation — the custom Catalyst
  * aggregate twin of [[HllRegistersAgg]] for the frequency sketch: the
  * aggregation buffer IS the d×w counter table (512 longs per group),
  * update bumps one counter per hash row, merge is elementwise sum,
  * and the result is the flattened counter array. Per group ONE 4 KiB
  * buffer flows through partial/final aggregation instead of d·w
  * (r, j, c) rows through a shuffle — the shipping form of
  * [[graft.queries.SketchQueries.cmsOf]]'s relational build.
  *
  * Input: the d per-row column indices j_r as an ARRAY<BIGINT>,
  * computed in codegen'd SQL with the engine's md5-prefix convention
  * (`('0x'||substr(md5(r:u),1,8)) % w` per row r) — only the counter
  * fold is imperative, so the hash arithmetic stays identical to the
  * relational path and the two must agree counter for counter (pinned
  * in CmsAggSpec and cross-checked by the `q_cms_agg` oracle).
  * Entirely integer, like everything CMS in this engine.
  */
case class CmsCountersAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val D = 4
  private val W = 128

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val js = v.asInstanceOf[ArrayData]
      require(js.numElements() == D,
        s"cms_counters needs $D column indices, got ${js.numElements()}")
      var r = 0
      while (r < D) {
        val j = js.getLong(r).toInt
        buf(r * W + j) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(D * W * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](D * W)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_counters needs ARRAY<BIGINT> column indices, got $other")
    }

  override def withNewMutableAggBufferOffset(o: Int): CmsCountersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsCountersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsCountersAgg =
    copy(child = c)
  override def prettyName: String = "cms_counters"
}
