package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass HyperLogLog register aggregation — the custom Catalyst
  * aggregate form of [[graft.queries.SketchQueries]]' relational HLL:
  * the aggregation buffer IS the sketch (64 bytes per group), update
  * folds one hash into one register, merge is bytewise max, and the
  * result is the dense register array. This is how a sketch ships at
  * 100 TB: one 64-byte buffer per group flows through the partial/
  * final aggregation instead of 64 (group, bucket, rho) rows through
  * a shuffle — and the buffer is the exact artifact the store logs.
  *
  * Input: the engine's 60-bit md5-prefix hash (a LONG; computing the
  * hash stays in codegen'd SQL — only the register fold is
  * imperative). bucket = h mod 64, suffix = h div 64 (54 bits),
  * rho = leading zeros of the suffix + 1 ∈ [1, 55] — identical to the
  * relational builder, so the two paths must agree register for
  * register (pinned in HllAggSpec and cross-checked by the
  * `q_hll_agg` oracle).
  */
case class HllRegistersAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val M = 64
  private val W = 54

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h % M).toInt
      val sfx = h / M
      val rho =
        if (sfx == 0L) W + 1
        else W + 1 - (64 - java.lang.Long.numberOfLeadingZeros(sfx))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hll_registers needs a BIGINT hash, got ${child.dataType}")

  override def withNewMutableAggBufferOffset(o: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllRegistersAgg =
    copy(child = c)
  override def prettyName: String = "hll_registers"
}
