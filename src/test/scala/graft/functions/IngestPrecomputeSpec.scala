package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.AstarteValueType._
import graft.streaming._
import graft.triggers._

/** The columnar ingest prefix must be OBSERVATIONALLY IDENTICAL to the
  * row-at-a-time reference path: same effects, same order within a
  * device, same error strings, for every message class — plus the plan
  * must actually carry the codegen'd expression (the whole point).
  */
class IngestPrecomputeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val props = InterfaceDescriptor("com.test.Props", 1, 0,
    InterfaceType.Properties, Ownership.Device, Aggregation.Individual)
  private val stream = InterfaceDescriptor("com.test.Stream", 1, 0,
    InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)
  private val obj = InterfaceDescriptor("com.test.Obj", 1, 0,
    InterfaceType.Datastream, Ownership.Device, Aggregation.Object)
  private val serverIf = InterfaceDescriptor("com.test.Server", 1, 0,
    InterfaceType.Properties, Ownership.Server, Aggregation.Individual)

  private val registry = Registry(
    Map(props.name -> props, stream.name -> stream, obj.name -> obj,
      serverIf.name -> serverIf),
    Map(
      props.name -> Seq(
        Mapping(props.name, 1, "/mode", AString, allowUnset = true),
        Mapping(props.name, 1, "/limit", ALongInteger)),
      stream.name -> Seq(
        Mapping(stream.name, 1, "/%{i}/value", ADouble, expirySeconds = 60),
        Mapping(stream.name, 1, "/%{i}/flag", ABoolean)),
      obj.name -> Seq(
        Mapping(obj.name, 1, "/s", AString),
        Mapping(obj.name, 1, "/d", ADouble)),
      serverIf.name -> Seq(Mapping(serverIf.name, 1, "/cfg", AString))),
    Seq(
      Trigger("t-any", TriggerEventType.IncomingData,
        TriggerScope.AnyInterface, None, MatchOperator.Any, null, List("a")),
      Trigger("t-gt", TriggerEventType.IncomingData,
        TriggerScope.OnInterface(stream.name, 1), Some("/%{i}/value"),
        MatchOperator.GreaterThan, 10.0, List("b")),
      Trigger("t-chg", TriggerEventType.ValueChange,
        TriggerScope.OnInterface(props.name, 1), None,
        MatchOperator.Any, null, List("c")),
      Trigger("t-rm", TriggerEventType.PathRemoved,
        TriggerScope.OnInterface(props.name, 1), None,
        MatchOperator.Any, null, List("d")),
      Trigger("t-conn", TriggerEventType.DeviceConnected,
        TriggerScope.AnyDevice, None, MatchOperator.Any, null, List("e"))))

  private val t0 = 15216455705950000L
  private def env(dev: String, msgType: String, iface: String, path: String,
      payload: Array[Byte], off: Long): Envelope =
    Envelope("r", dev, msgType, iface, path, payload,
      t0 + off * 10000, "10.0.0.1", off)

  /** A batch touching every message class and every precompute branch. */
  private def mixedBatch: Seq[Envelope] = Seq(
    env("devA", "connection", null, null, Array.emptyByteArray, 1),
    env("devA", "introspection", null, null,
      s"${props.name}:1:0;${stream.name}:1:0".getBytes, 2),
    env("devA", "data", props.name, "/mode",
      Bson.encode(Seq("v" -> "eco")), 3),
    env("devA", "data", props.name, "/mode",
      Bson.encode(Seq("v" -> "max")), 4), // value_change fires
    env("devA", "data", props.name, "/mode", Array.emptyByteArray, 5), // unset
    env("devA", "data", stream.name, "/7/value",
      Bson.encode(Seq("v" -> 42.5)), 6), // retention + GT trigger
    env("devA", "data", stream.name, "/7/flag",
      Bson.encode(Seq("v" -> true)), 7),
    env("devA", "data", obj.name, "/",
      Bson.encode(Seq("v" -> scala.collection.immutable.ListMap(
        "d" -> 1.5, "s" -> "x"))), 8), // object aggregate
    // error branches, in handleData precedence order
    env("devA", "data", stream.name, "/bad//path", Bson.encode(Seq("v" -> 1.0)), 9),
    env("devA", "data", "com.test.Unknown", "/x", Bson.encode(Seq("v" -> 1.0)), 10),
    env("devA", "data", serverIf.name, "/cfg", Bson.encode(Seq("v" -> "x")), 11),
    env("devA", "data", stream.name, "/nope", Bson.encode(Seq("v" -> 1.0)), 12),
    env("devA", "data", stream.name, "/7/value", Array(1, 2, 3), 13), // bad BSON
    env("devA", "data", stream.name, "/7/value",
      Bson.encode(Seq("v" -> "wrong-type")), 14),
    env("devA", "disconnection", null, null, Array.emptyByteArray, 15),
    // a second device interleaved, out of order
    env("devB", "data", stream.name, "/1/value",
      Bson.encode(Seq("v" -> 5.0)), 17),
    env("devB", "data", stream.name, "/1/value",
      Bson.encode(Seq("v" -> 99.0)), 16))

  /** Reference result: fold each device's sorted slice through the
    * row-at-a-time processMessage (exactly what processBatch did
    * before the columnar prefix existed).
    */
  private def referenceEffects(msgs: Seq[Envelope]): Seq[EffectRow] =
    msgs.groupBy(e => (e.realm, e.deviceId)).toSeq.flatMap { case (key, es) =>
      val ordered = es.sortBy(e => (e.receptionDecimicros, e.offset))
      var state = DeviceSessionState.empty
      val out = Seq.newBuilder[EffectRow]
      ordered.foreach { e =>
        val (s2, fx) = DeviceProcessor.processMessage(state, e, registry)
        state = s2
        out ++= fx
      }
      val (ms, sub) = graft.core.PayloadCodec.splitReceptionTimestamp(
        ordered.last.receptionDecimicros)
      out += DeviceProcessor.statsFlush(state, key._1, key._2, ms, sub)
      out.result()
    }

  private def canon(fx: Seq[EffectRow]): Seq[String] =
    fx.map { e =>
      e.copy(valueBson = null, prevBson = null).toString +
        "|v=" + Option(e.valueBson).map(_.mkString(",")).getOrElse("-") +
        "|p=" + Option(e.prevBson).map(_.mkString(",")).getOrElse("-")
    }.sorted

  test("processBatch with the columnar prefix equals the row-at-a-time reference") {
    import spark.implicits._
    val fast = DeviceStateMachine.processBatch(mixedBatch.toDS(), registry).collect()
    assert(canon(fast.toSeq) == canon(referenceEffects(mixedBatch)))
    // sanity: the scenario really exercised the interesting branches
    val kinds = fast.map(_.kind).toSet
    assert(kinds.contains("property_upsert") && kinds.contains("property_unset") &&
      kinds.contains("datastream_append") && kinds.contains("object_append") &&
      kinds.contains("event") && kinds.contains("error"))
    val errs = fast.filter(_.kind == "error").map(_.detail).toSet
    assert(errs == Set("invalid_path", "interface_loading_failed",
      "cannot_write_on_server_owned_interface", "mapping_not_found",
      "undecodable_bson_payload", "unexpected_value_type"))
    val targets = fast.filter(_.kind == "event").map(_.target).toSet
    assert(targets.contains("b") && targets.contains("c") &&
      targets.contains("d") && targets.contains("e"))
  }

  test("the ingest prefix is the codegen'd precompute expression, pre-shuffle") {
    import spark.implicits._
    // the fold consumes the physical rows directly (toRdd), so the
    // effects Dataset's own plan is an RDD scan — the precompute
    // lives in the UPSTREAM stage it executes; pin that plan.
    // RDD-backed input: a LocalRelation would be constant-folded by
    // ConvertToLocalRelation (via the expression's interpreted eval),
    // hiding the plan shape real sources (parquet/broker) produce.
    val pre = DeviceStateMachine.precomputed(
      spark.createDataset(spark.sparkContext.parallelize(mixedBatch, 2)), registry)
    val plan = pre.queryExecution.executedPlan.toString()
    assert(plan.contains("ingest_precompute"),
      s"precompute expression missing from plan:\n$plan")
    // and it runs inside a whole-stage-codegen span ("*(n)" prefix on
    // the Project that computes it), not as an interpreted fallback
    val projLine = plan.linesIterator
      .find(_.contains("ingest_precompute")).getOrElse("")
    assert(projLine.contains("*("),
      s"precompute project not codegen'd: $projLine")
  }

  test("unmaskable registry (>64 triggers) falls back to the full path, same results") {
    import spark.implicits._
    // 64 filler triggers that never match + the real ones: the
    // prematch bitmask can't represent them, so every data row gets
    // ErrRecompute and the fold must take the row-at-a-time path
    val filler = (1 to 64).map(i =>
      Trigger(s"f$i", TriggerEventType.IncomingData,
        TriggerScope.OnInterface("com.filler.None", 1), None,
        MatchOperator.Any, null, List(s"t$i")))
    val wide = registry.copy(triggers = registry.triggers ++ filler)
    val fast = DeviceStateMachine.processBatch(mixedBatch.toDS(), wide).collect()
    val ref = mixedBatch.groupBy(e => (e.realm, e.deviceId)).toSeq.flatMap {
      case (key, es) =>
        val ordered = es.sortBy(e => (e.receptionDecimicros, e.offset))
        var state = DeviceSessionState.empty
        val out = Seq.newBuilder[EffectRow]
        ordered.foreach { e =>
          val (s2, fx) = DeviceProcessor.processMessage(state, e, wide)
          state = s2; out ++= fx
        }
        val (ms, sub) = graft.core.PayloadCodec.splitReceptionTimestamp(
          ordered.last.receptionDecimicros)
        out += DeviceProcessor.statsFlush(state, key._1, key._2, ms, sub)
        out.result()
    }
    assert(canon(fast.toSeq) == canon(ref))
    // sanity: the fallback really is the fallback (mask capacity)
    assert(wide.triggers.size > 64)
  }

  test("expression interpreted eval matches codegen (struct contract)") {
    // exercise eval() directly — the non-codegen fallback used by
    // e.g. ConstantFolding must agree with the codegen'd path
    val e = IngestPrecompute(registry,
      org.apache.spark.sql.catalyst.expressions.Literal.create("data",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal.create(stream.name,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal.create("/7/value",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Bson.encode(Seq("v" -> 42.5)), org.apache.spark.sql.types.BinaryType))
    val row = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getInt(0) == IngestPre.ErrOk)
    assert(row.getInt(1) == 0) // first mapping of the stream iface
    assert(!row.getBoolean(2))
    assert(row.getLong(3) == Long.MinValue) // no explicit ts → reception
    assert(java.util.Arrays.equals(row.getBinary(4), Bson.encode(Seq("v" -> 42.5))))
    // t-any (bit 0) and t-gt (bit 1) match; 42.5 > 10
    assert((row.getLong(5) & 3L) == 3L)
    assert(row.getLong(6) == RegistryMeta.fingerprintOf(registry))
  }

  test("live registry swap: the expression follows its source, fp flips") {
    // the streaming shape — the expression holds the PROVIDER, so an
    // ST2/ST3 update returns the fast path instead of permanently
    // fingerprint-failing every subsequent row
    val holder = new java.util.concurrent.atomic.AtomicReference(registry)
    def lit(s: String) =
      org.apache.spark.sql.catalyst.expressions.Literal.create(s,
        org.apache.spark.sql.types.StringType)
    val e = IngestPrecompute(() => holder.get(), lit("data"),
      lit(stream.name), lit("/7/value"),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Bson.encode(Seq("v" -> 42.5)), org.apache.spark.sql.types.BinaryType))
    val before = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(before.getLong(6) == RegistryMeta.fingerprintOf(registry))
    val updated = registry.copy(triggers = registry.triggers.take(1))
    holder.set(updated)
    val after = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(after.getInt(0) == IngestPre.ErrOk) // still the fast path
    assert(after.getLong(6) == RegistryMeta.fingerprintOf(updated))
    assert(after.getLong(6) != before.getLong(6))
    // mask now sized to the shrunk trigger list: only bit 0 possible
    assert((after.getLong(5) & ~1L) == 0L)
  }

  test("fingerprints are canonical: equal registries digest equal, any field change flips it") {
    val twin = registry.copy() // structurally equal, different instance
    assert(RegistryMeta.fingerprintOf(registry) ==
      RegistryMeta.fingerprintOf(twin))
    val bumped = registry.copy(triggers = registry.triggers.reverse)
    if (registry.triggers.size > 1)
      assert(RegistryMeta.fingerprintOf(registry) !=
        RegistryMeta.fingerprintOf(bumped))
  }
}
