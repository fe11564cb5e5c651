package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core._
import graft.streaming.Registry

/** The precomputed stateless prefix of the ingest pipeline for one
  * message: decode → endpoint resolve → validate → trigger prematch
  * (SURVEY §3.1 steps 2-5, §4's named custom-expression candidates
  * `bson_decode` / `endpoint_resolve` / `value_match`, here fused into
  * one struct-producing expression so the BSON document is decoded
  * exactly once). Everything that does NOT need per-device session
  * state is computed here, columnar, inside whole-stage codegen,
  * BEFORE the keyed shuffle — the stateful fold then consumes the
  * precomputed fields and only keeps the session bookkeeping
  * (reference `impl.ex:462-638` split at the same seam).
  *
  * `err` codes: 0 = valid data value; 1..6 = the handleData error
  * precedence (invalid_path, interface_loading_failed,
  * cannot_write_on_server_owned_interface, mapping_not_found,
  * undecodable_bson_payload, unexpected_value_type); -1 = not a data
  * message (lifecycle/control — stateful, handled entirely in-fold);
  * -2 = recompute in-fold (unmaskable registry, e.g. >64 triggers).
  *
  * `regFp` is the fingerprint of the registry the row was computed
  * against. The fold compares it with ITS registry (which streaming
  * re-reads per micro-batch and may overlay with per-device volatile
  * triggers) and falls back to the full row-at-a-time path on any
  * mismatch — live registry updates keep exact ST2/ST3 semantics while
  * the steady state runs columnar.
  */
final case class IngestPre(
    err: Int,
    mappingIdx: Int,
    isUnset: Boolean,
    valueTsMs: Long,
    canonical: Array[Byte], // BSON {v: value}, byte-identical to the fold's encode
    trigMask: Long,         // bit i = registry.triggers(i) matches this data event
    regFp: Long)

object IngestPre {
  val ErrNotData = -1
  val ErrRecompute = -2
  val ErrOk = 0

  /** Error-code → reference error string (handleData's precedence). */
  def errName(code: Int): String = code match {
    case 1 => "invalid_path"
    case 2 => "interface_loading_failed"
    case 3 => "cannot_write_on_server_owned_interface"
    case 4 => "mapping_not_found"
    case 5 => "undecodable_bson_payload"
    case 6 => "unexpected_value_type"
    case other => s"precompute_error_$other"
  }

  val schema: StructType = StructType(Seq(
    StructField("err", IntegerType, nullable = false),
    StructField("mappingIdx", IntegerType, nullable = false),
    StructField("isUnset", BooleanType, nullable = false),
    StructField("valueTsMs", LongType, nullable = false),
    StructField("canonical", BinaryType, nullable = true),
    StructField("trigMask", LongType, nullable = false),
    StructField("regFp", LongType, nullable = false)))
}

/** Registry-derived lookup structures shared by the expression and the
  * fold. Fingerprints are a 64-bit MD5 digest of a CANONICAL
  * rendering (maps sorted by key, sequences in order, byte arrays in
  * hex) — structural, stable across JVMs/serialization, and with a
  * 2^-64 accidental-collision bound: a 32-bit hashCode colliding
  * between an old and a new registry would let a stale precompute
  * row index the wrong mapping list with no error raised.
  */
object RegistryMeta {
  // single-entry identity memo: providers hand out the same Registry
  // instance until it is updated, so per-group PreContext builds in
  // streaming don't re-digest an unchanged registry
  @volatile private var lastFp: (Registry, Long) = null

  def fingerprintOf(r: Registry): Long = {
    val c = lastFp
    if (c != null && (c._1 eq r)) return c._2
    def v(x: Any): String = x match {
      case null => "∅"
      case a: Array[Byte] => a.map("%02x".format(_)).mkString
      case a: Array[_] => a.map(v).mkString("[", ",", "]")
      case s: Seq[_] => s.map(v).mkString("[", ",", "]")
      case other => other.toString
    }
    val sb = new StringBuilder
    r.interfaces.toSeq.sortBy(_._1).foreach { case (k, d) =>
      sb.append(k).append('=').append(d).append(';')
    }
    r.mappings.toSeq.sortBy(_._1).foreach { case (k, ms) =>
      sb.append(k).append('=').append(ms.mkString(",")).append(';')
    }
    r.triggers.foreach { t =>
      sb.append(t.triggerId).append('|').append(t.eventType).append('|')
        .append(t.scope).append('|').append(t.pathPattern).append('|')
        .append(t.valueOp).append('|').append(v(t.knownValue)).append('|')
        .append(t.targets.mkString(",")).append('|').append(t.volatile)
        .append(';')
    }
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes("UTF-8"))
    val h0 = java.nio.ByteBuffer.wrap(md).getLong
    val h = if (h0 == 0L) 1L else h0
    lastFp = (r, h)
    h
  }

  /** Triggers with their registry index, grouped by event type — the
    * fold-side decoder for [[IngestPre.trigMask]]. Built once per
    * partition (batch) or per group (stream), not per message.
    */
  def triggerIndex(r: Registry): Map[graft.triggers.TriggerEventType, Seq[(graft.triggers.Trigger, Int)]] =
    r.triggers.zipWithIndex.groupBy(_._1.eventType)
}

/** `bson_encode_v(value)` — canonical BSON `{v: value}` envelope
  * encoding as a codegen'd expression: the columnar twin of the
  * decoder's canonical re-encode, for building device payloads
  * declaratively (benchmark/backfill input adapters, test vectors)
  * without a row-at-a-time lambda. Byte-identical to
  * `Bson.encode(Seq("v" -> value))` by construction (same encoder).
  */
case class BsonEncodeV(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bson_encode_v"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType | IntegerType | LongType | StringType | BooleanType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bson_encode_v: unsupported input type ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = BsonEncodeV.encode(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BsonEncodeV.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): BsonEncodeV =
    copy(child = newChild)
}

object BsonEncodeV {
  /** Catalyst-native value → BSON {v: _} bytes (static for codegen). */
  def encode(v: Any): Array[Byte] = {
    val scalaV: Any = v match {
      case u: UTF8String => u.toString
      case other => other
    }
    Bson.encode(Seq("v" -> scalaV))
  }
}

/** `ingest_precompute(msgType, iface, path, payload)` —
  * codegen'd Catalyst expression computing [[IngestPre]]. The
  * registry is pulled through `registrySource` ON EVERY ROW (an `eq`
  * check makes the steady state one pointer compare): a streaming
  * query built over a mutable provider picks a registry update up on
  * the rows that follow it, so the columnar fast path RETURNS after
  * an ST2/ST3 update instead of fingerprint-failing for the rest of
  * the query's lifetime. Rows computed against the old registry are
  * still caught by the fold's fingerprint check, exactly as before.
  */
case class IngestPrecompute(
    registrySource: () => Registry,
    msgType: Expression,
    iface: Expression,
    path: Expression,
    payload: Expression) extends Expression {

  override def children: Seq[Expression] =
    Seq(msgType, iface, path, payload)

  override def dataType: DataType = IngestPre.schema
  override def nullable: Boolean = false
  override def prettyName: String = "ingest_precompute"

  /** Registry-derived evaluation state, rebuilt only when the source
    * hands out a NEW registry instance. The volatile single-slot
    * cache is race-safe (worst case: two threads rebuild the same
    * immutable Meta once).
    */
  private final class Meta(val registry: Registry) {
    val fp: Long = RegistryMeta.fingerprintOf(registry)
    val maskable: Boolean = registry.triggers.size <= 64
    val triggerArr = registry.triggers.toArray
  }
  @transient @volatile private var cachedMeta: Meta = null
  private def meta(): Meta = {
    val r = registrySource()
    val c = cachedMeta
    if (c != null && (c.registry eq r)) c
    else { val m = new Meta(r); cachedMeta = m; m }
  }

  @transient private lazy val dataUtf8 = UTF8String.fromString("data")

  private def row(fp: Long, err: Int, mappingIdx: Int = -1,
      isUnset: Boolean = false, valueTsMs: Long = -1L,
      canonical: Array[Byte] = null, trigMask: Long = 0L): InternalRow =
    new GenericInternalRow(Array[Any](
      err, mappingIdx, isUnset, valueTsMs, canonical, trigMask, fp))

  /** The whole stateless prefix, mirroring handleData's exact error
    * precedence (DeviceProcessor.handleData). Public so codegen can
    * call it; takes raw Catalyst-native values.
    */
  def compute(mt: UTF8String, ifc: UTF8String, p: UTF8String,
      pl: Array[Byte]): InternalRow = {
    import IngestPre._
    val m = meta()
    val registry = m.registry
    val fp = m.fp
    if (mt == null || !mt.equals(dataUtf8)) return row(fp, ErrNotData)
    if (!m.maskable) return row(fp, ErrRecompute)
    val pathS = if (p == null) null else p.toString
    if (pathS == null || !PathMatcher.isValidPath(pathS)) return row(fp, 1)
    val ifaceS = if (ifc == null) null else ifc.toString
    registry.descriptor(ifaceS) match {
      case None => row(fp, 2)
      case Some(desc) if desc.ownership == Ownership.Server => row(fp, 3)
      case Some(desc) =>
        val mappings = registry.mappingsOf(ifaceS)
        val idx = mappings.indexWhere(m => desc.aggregation match {
          case Aggregation.Individual => PathMatcher.matches(m.endpoint, pathS)
          case Aggregation.Object => PathMatcher.matchesParentLevel(m.endpoint, pathS)
        })
        if (idx < 0) return row(fp, 4)
        val mapping = mappings(idx)
        PayloadCodec.decodePayload(pl) match {
          case None => row(fp, 5)
          case Some(decoded) =>
            val value = decoded.value
            if (value != null &&
                !graft.streaming.TypeChecker.validates(value, mapping, desc, registry))
              return row(fp, 6)
            var mask = 0L
            var i = 0
            while (i < m.triggerArr.length) {
              if (m.triggerArr(i).matchesDataEvent(ifaceS, desc.major, pathS, value))
                mask |= 1L << i
              i += 1
            }
            if (value == null)
              row(fp, ErrOk, idx, isUnset = true, trigMask = mask)
            else {
              // receptionMs isn't known here (it's trivial arithmetic
              // the fold does); explicit-timestamp values carry their
              // own ts, others get Long.MinValue = "use receptionMs"
              val ts = decoded.timestamp
                .filter(_ => mapping.explicitTimestamp)
                .map(_.toEpochMilli).getOrElse(Long.MinValue)
              row(fp, ErrOk, idx, valueTsMs = ts,
                canonical = Bson.encode(Seq("v" -> value)), trigMask = mask)
            }
        }
    }
  }

  override def eval(input: InternalRow): Any = compute(
    msgType.eval(input).asInstanceOf[UTF8String],
    iface.eval(input).asInstanceOf[UTF8String],
    path.eval(input).asInstanceOf[UTF8String],
    payload.eval(input).asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ingestPrecompute", this,
      classOf[IngestPrecompute].getName)
    val mt = msgType.genCode(ctx)
    val ifc = iface.genCode(ctx)
    val p = path.genCode(ctx)
    val pl = payload.genCode(ctx)
    val resultCode =
      code"""
        |${mt.code}
        |${ifc.code}
        |${p.code}
        |${pl.code}
        |InternalRow ${ev.value} = $ref.compute(
        |  ${mt.isNull} ? null : ${mt.value},
        |  ${ifc.isNull} ? null : ${ifc.value},
        |  ${p.isNull} ? null : ${p.value},
        |  ${pl.isNull} ? null : ${pl.value});
        |""".stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IngestPrecompute =
    copy(msgType = newChildren(0), iface = newChildren(1),
      path = newChildren(2), payload = newChildren(3))
}

object IngestPrecompute {
  /** Fixed-registry construction (batch mode, tests). */
  def apply(registry: Registry, msgType: Expression, iface: Expression,
      path: Expression, payload: Expression): IngestPrecompute =
    IngestPrecompute(() => registry, msgType, iface, path, payload)
}
