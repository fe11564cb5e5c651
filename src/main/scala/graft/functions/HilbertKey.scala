package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D cell — the data-clustering
  * alternative to the Morton (Z-order) key: both map the plane onto a
  * quadrant-recursive 1-D order, but the Hilbert walk never jumps
  * (consecutive indices are always edge-adjacent cells), so a
  * contiguous index range covers a more compact region and range
  * predicates prune more files at equal file count. The trade is
  * compute: Morton is bit interleaving, Hilbert needs the
  * rotate-and-accumulate walk below — per ROW at write time only,
  * amortized over every pruned read.
  *
  * `hilbert_key(x, y)` with x, y in [0, 256) returns the index in
  * [0, 65536) of the cell on the order-8 curve. The walk is the
  * classic xy→d loop (public knowledge — Wikipedia "Hilbert curve",
  * Hamilton & Rau-Chaplin 2008): per level, fold the quadrant into
  * the accumulator and un-rotate the coordinates into the
  * sub-quadrant's frame. Codegen'd: the loop runs inside whole-stage
  * codegen via the static walker, no boxing, no UDF.
  */
case class HilbertKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"hilbert_key expects integral args, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertKey.xy2d(asLong(left, l), asLong(right, r))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.HilbertKey.xy2d((long) $l, (long) $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_key"
}

object HilbertKey {
  /** Grid side: 2^8 cells per dimension — matches the layout's 8-bit
    * per-dimension codes. */
  val N = 256

  /** (x, y) → distance along the order-8 Hilbert curve. Inputs clamp
    * to the grid (the layout already clamps codes to [0, 255]; the
    * clamp here makes the walker total). */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = math.min(math.max(xIn, 0L), (N - 1).toLong)
    var y = math.min(math.max(yIn, 0L), (N - 1).toLong)
    var d = 0L
    var s = N / 2L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve's frame is canonical
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** The inverse walk (d → (x, y)) — spec-only: the
    * bijection/continuity pins drive it against [[xy2d]]. */
  def d2xy(dIn: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = dIn
    var s = 1L
    while (s < N) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }
}
