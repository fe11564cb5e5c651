package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two array<float|double> columns,
  * accumulating in double — a codegen'd Catalyst expression, so the
  * similarity-search hot loop stays inside whole-stage codegen with
  * no per-element boxing (the `functions.aggregate`/`zip_with`
  * equivalent allocates a lambda frame per element; a Scala UDF
  * additionally serializes the whole array per row).
  *
  * Null elements contribute 0; length mismatch uses the common
  * prefix. Returns null only if either side is null.
  */
case class VectorDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"vector_dot expects array<float|double> args, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = math.min(la.numElements(), ra.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!la.isNullAt(i) && !ra.isNullAt(i)) {
        val x = if (lf) la.getFloat(i).toDouble else la.getDouble(i)
        val y = if (rf) ra.getFloat(i).toDouble else ra.getDouble(i)
        acc += x * y
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getL = if (elemIsFloat(left)) s"(double) $l.getFloat($i)"
                 else s"$l.getDouble($i)"
      val getR = if (elemIsFloat(right)) s"(double) $r.getFloat($i)"
                 else s"$r.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$l.isNullAt($i) && !$r.isNullAt($i)) {
         |    $acc += $getL * $getR;
         |  }
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

/** Exact integer dot product over two array<long|int> columns,
  * accumulating in long — the determinism-critical twin of
  * VectorDotProduct. Integer addition is associative, so the result
  * is independent of accumulation order: a quantized-embedding dot
  * computed here is bit-identical to ANY other engine's sum over the
  * same integers (the float variant differs from an unordered SUM in
  * the last ulp, which `round(x, 4)` can amplify into a flipped rank
  * at a boundary). Callers bound magnitudes so no overflow occurs
  * (|q| ≤ 1e6, dims ≤ 64 → |dot| ≤ 6.4e13 « 2^63).
  *
  * Null elements contribute 0; length mismatch uses the common
  * prefix. Returns null only if either side is null.
  */
case class VectorDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == LongType || t == IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"vector_dot_long expects array<long|int> args, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemIsInt(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = math.min(la.numElements(), ra.numElements())
    val li = elemIsInt(left); val ri = elemIsInt(right)
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!la.isNullAt(i) && !ra.isNullAt(i)) {
        val x = if (li) la.getInt(i).toLong else la.getLong(i)
        val y = if (ri) ra.getInt(i).toLong else ra.getLong(i)
        acc += x * y
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getL = if (elemIsInt(left)) s"(long) $l.getInt($i)"
                 else s"$l.getLong($i)"
      val getR = if (elemIsInt(right)) s"(long) $r.getInt($i)"
                 else s"$r.getLong($i)"
      s"""
         |final int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$l.isNullAt($i) && !$r.isNullAt($i)) {
         |    $acc += $getL * $getR;
         |  }
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot_long"
}

/** Session registration for the engine's native functions; after
  * `GraftFunctions.register(spark)`, `expr("vector_dot(a, b)")` and
  * SQL both resolve to the codegen'd expression.
  */
object GraftFunctions {

  /** Shared builder (also used by GraftExtensions) with a proper
    * arity error instead of an index exception at plan time.
    */
  val vectorDotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => VectorDotProduct(a, b)
    case exprs => throw new IllegalArgumentException(
      s"vector_dot requires exactly 2 arguments, got ${exprs.size}")
  }

  val vectorDotLongBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => VectorDotLong(a, b)
    case exprs => throw new IllegalArgumentException(
      s"vector_dot_long requires exactly 2 arguments, got ${exprs.size}")
  }

  val hllRegistersBuilder: Seq[Expression] => Expression = {
    case Seq(h) => HllRegistersAgg(h)
    case exprs => throw new IllegalArgumentException(
      s"hll_registers requires exactly 1 argument, got ${exprs.size}")
  }

  val cmsCountersBuilder: Seq[Expression] => Expression = {
    case Seq(js) => CmsCountersAgg(js)
    case exprs => throw new IllegalArgumentException(
      s"cms_counters requires exactly 1 argument, got ${exprs.size}")
  }

  val kmvBottomKBuilder: Seq[Expression] => Expression = {
    case Seq(h) => KmvBottomKAgg(h)
    case exprs => throw new IllegalArgumentException(
      s"kmv_bottomk requires exactly 1 argument, got ${exprs.size}")
  }

  val mgSummaryBuilder: Seq[Expression] => Expression = {
    case Seq(k) => MgSummaryAgg(k)
    case exprs => throw new IllegalArgumentException(
      s"mg_summary requires exactly 1 argument, got ${exprs.size}")
  }

  val esTopKBuilder: Seq[Expression] => Expression = {
    case Seq(k, w) => EsTopKAgg(k, w)
    case exprs => throw new IllegalArgumentException(
      s"es_topk requires exactly 2 arguments, got ${exprs.size}")
  }

  val hilbertKeyBuilder: Seq[Expression] => Expression = {
    case Seq(x, y) => HilbertKey(x, y)
    case exprs => throw new IllegalArgumentException(
      s"hilbert_key requires exactly 2 arguments, got ${exprs.size}")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", vectorDotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot_long", vectorDotLongBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_registers", hllRegistersBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_counters", cmsCountersBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_bottomk", kmvBottomKBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_summary", mgSummaryBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "es_topk", esTopKBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_key", hilbertKeyBuilder, "built-in")
  }
}
