package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{AstarteValueType, Bson, BsonBinary}

/** `bson_decode_typed(bson)` — typed extraction of the BSON `{v: _}`
  * value envelope into the sparse storage column for one declared
  * Astarte type, as a native Catalyst expression (SURVEY §4's
  * `bson_decode` candidate, write-sink side). One expression class
  * instantiated per type replaces the former battery of ~20 Scala
  * UDFs: no closure serialization, no Catalyst↔Scala row conversion,
  * and the decode stays inside whole-stage codegen.
  *
  * Null on: null/undecodable bytes, missing `v`, or a value that
  * doesn't coerce to the target type — the same "silently sparse"
  * contract the reference's typed column landing has
  * (`database_test_helper.exs:135-208`: one populated column per
  * value type, null elsewhere).
  *
  * Coercions mirror the reference's BSON number widening: int widens
  * to double/long, BSON datetimes land as epoch-millis LONGs. Array
  * forms drop non-coercible elements (the sparse-column contract
  * applied element-wise).
  */
final case class BsonDecodeTyped(child: Expression, astarteType: AstarteValueType)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bson_decode_typed: expected BINARY input, got ${other.simpleString}")
  }
  override def dataType: DataType = BsonDecodeTyped.outputType(astarteType)
  override def nullable: Boolean = true
  override def prettyName: String = "bson_decode_typed"

  override def nullSafeEval(input: Any): Any =
    BsonDecodeTyped.decode(input.asInstanceOf[Array[Byte]], astarteType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("astarteType", astarteType,
      classOf[AstarteValueType].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = CodeGenerator.boxedType(dataType)
      s"""
         |Object dec = graft.functions.BsonDecodeTyped.decode($c, $tRef);
         |if (dec == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ($boxed) dec; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BsonDecodeTyped =
    copy(child = newChild)
}

/** `bson_decode_leaf(bson, leaf)` — typed extraction of ONE leaf of
  * an object-aggregation payload `{v: {leaf: value, ...}}`, per the
  * leaf's declared mapping type: the write-side decode for the
  * dynamic `<iface>_v<major>` object tables (one typed parquet
  * column per leaf; reference object landing
  * `database_test_helper.exs:256-328`). Same coercion/null contract
  * as [[BsonDecodeTyped]], except a plain longinteger leaf does not
  * absorb BSON datetimes — a leaf's type is declared, not inferred.
  */
final case class BsonDecodeLeaf(
    bson: Expression, leaf: Expression, astarteType: AstarteValueType)
    extends BinaryExpression {

  override def left: Expression = bson
  override def right: Expression = leaf
  override def checkInputDataTypes(): TypeCheckResult =
    (bson.dataType, leaf.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bson_decode_leaf: expected (BINARY, STRING) inputs, got $other")
    }
  override def dataType: DataType = BsonDecodeTyped.outputType(astarteType)
  override def nullable: Boolean = true
  override def prettyName: String = "bson_decode_leaf"

  override def nullSafeEval(b: Any, l: Any): Any =
    BsonDecodeTyped.decodeLeaf(b.asInstanceOf[Array[Byte]],
      l.asInstanceOf[UTF8String], astarteType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("astarteType", astarteType,
      classOf[AstarteValueType].getName)
    nullSafeCodeGen(ctx, ev, (b, l) => {
      val boxed = CodeGenerator.boxedType(dataType)
      s"""
         |Object dec = graft.functions.BsonDecodeTyped.decodeLeaf($b, $l, $tRef);
         |if (dec == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ($boxed) dec; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BsonDecodeLeaf =
    copy(bson = newLeft, leaf = newRight)
}

object BsonDecodeTyped {
  import AstarteValueType._

  /** Storage column type per Astarte type. Datetimes are epoch-millis
    * LONGs in the store (the reference's `datetime_value` lands a
    * timestamp; millis keep it timezone-free). Numeric/boolean array
    * elements can't be null (non-coercible elements are dropped);
    * string/binary elements keep Spark's reference-type nullability
    * so the parquet schema is byte-identical to the former UDFs'.
    */
  def outputType(t: AstarteValueType): DataType = t match {
    case ADouble => DoubleType
    case AInteger => IntegerType
    case ALongInteger => LongType
    case AString => StringType
    case ABoolean => BooleanType
    case ABinaryBlob => BinaryType
    case ADateTime => LongType
    case ADoubleArray => ArrayType(DoubleType, containsNull = false)
    case AIntegerArray => ArrayType(IntegerType, containsNull = false)
    case ALongIntegerArray => ArrayType(LongType, containsNull = false)
    case AStringArray => ArrayType(StringType, containsNull = true)
    case ABooleanArray => ArrayType(BooleanType, containsNull = false)
    case ABinaryBlobArray => ArrayType(BinaryType, containsNull = true)
    case ADateTimeArray => ArrayType(LongType, containsNull = false)
  }

  /** Static decode entry for codegen: `{v: _}` → Catalyst-internal
    * value of `outputType(t)`, or null.
    */
  def decode(bson: Array[Byte], t: AstarteValueType): Any =
    Bson.decode(bson).flatMap(_.get("v")) match {
      case Some(v) => convert(t, v, leafMode = false)
      case None => null
    }

  /** Static decode entry for codegen: `{v: {leaf: _}}` → the leaf's
    * value as Catalyst-internal `outputType(t)`, or null.
    */
  def decodeLeaf(bson: Array[Byte], leaf: UTF8String, t: AstarteValueType): Any = {
    val name = leaf.toString
    Bson.decode(bson).flatMap(_.get("v")) match {
      case Some(m: collection.Map[_, _]) =>
        m.collectFirst { case (k, v) if String.valueOf(k) == name => v } match {
          case Some(v) => convert(t, v, leafMode = true)
          case None => null
        }
      case _ => null
    }
  }

  private def convert(t: AstarteValueType, v: Any, leafMode: Boolean): Any =
    if (t.isArray) v match {
      case xs: Seq[_] =>
        val elem = AstarteValueType.elementOf(t).get
        new GenericArrayData(
          xs.iterator.map(scalar(elem, _, leafMode)).filter(_ != null).toArray[Any])
      case _ => null
    }
    else scalar(t, v, leafMode)

  /** One scalar coercion; null when the BSON value doesn't fit the
    * declared type. `leafMode` switches off the envelope battery's
    * instant-as-longinteger leniency (object leaves have declared
    * types; only datetime leaves absorb instants).
    */
  private def scalar(t: AstarteValueType, v: Any, leafMode: Boolean): Any = t match {
    case ADouble => v match {
      case d: Double => java.lang.Double.valueOf(d)
      case i: Int => java.lang.Double.valueOf(i.toDouble)
      case l: Long => java.lang.Double.valueOf(l.toDouble)
      case _ => null
    }
    case AInteger => v match {
      case i: Int => java.lang.Integer.valueOf(i)
      case _ => null
    }
    case ALongInteger => v match {
      case l: Long => java.lang.Long.valueOf(l)
      case i: Int => java.lang.Long.valueOf(i.toLong)
      case inst: java.time.Instant if !leafMode => java.lang.Long.valueOf(inst.toEpochMilli)
      case _ => null
    }
    case AString => v match {
      case s: String => UTF8String.fromString(s)
      case _ => null
    }
    case ABoolean => v match {
      case b: Boolean => java.lang.Boolean.valueOf(b)
      case _ => null
    }
    case ABinaryBlob => v match {
      case BsonBinary(_, bytes) => bytes
      case bytes: Array[Byte] => bytes
      case _ => null
    }
    case ADateTime => v match {
      case inst: java.time.Instant => java.lang.Long.valueOf(inst.toEpochMilli)
      case l: Long => java.lang.Long.valueOf(l)
      case i: Int => java.lang.Long.valueOf(i.toLong)
      case _ => null
    }
    case other =>
      throw new IllegalArgumentException(s"not a scalar type: $other")
  }
}
