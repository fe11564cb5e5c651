package graft.streaming

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, struct}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.PayloadCodec
import graft.functions.{IngestPre, IngestPrecompute}

/** Spark drivers for [[DeviceProcessor]]: the per-device keyed state
  * machine (SURVEY §2.8 ST1).
  *
  * The ingest plan has two stages split at the state boundary:
  *
  *  1. a COLUMNAR stateless prefix — decode → endpoint resolve →
  *     validate → trigger prematch as the codegen'd
  *     [[graft.functions.IngestPrecompute]] expression, fused into
  *     whole-stage codegen with the source scan, BEFORE the keyed
  *     shuffle;
  *  2. the stateful per-device fold (session counters, properties
  *     cache, introspection) consuming the precomputed columns.
  *
  * Batch mode exploits the split fully: `repartition(device)` +
  * `sortWithinPartitions(device, reception, offset)` makes Spark's
  * UnsafeRow radix sort restore per-device FIFO — the fold then
  * STREAMS each device's run without buffering or object-side
  * sorting. Streaming keeps `flatMapGroupsWithState` (the state
  * store requires the keyed grouping) but consumes the same
  * precomputed columns; a registry fingerprint guards every row, so
  * live registry/trigger updates (ST2/ST3) fall back to full
  * row-at-a-time processing instead of using a stale precompute.
  *
  * Scale design: the only shuffle is the keyed exchange; per-key
  * processing is O(messages) with state in the state store. Message
  * order within a key follows (receptionDecimicros, offset) — the
  * FIFO the reference's MessageTracker enforced.
  */
object DeviceStateMachine {

  type DeviceKey = (String, String) // (realm, deviceId)

  /** Registry access for long-running streams. `current()` is
    * consulted inside the state function on every group, so updates
    * (new interfaces, volatile trigger installs) reach in-flight
    * queries without a restart — the reference's 10-minute cache
    * refresh (ST2/ST3).
    *
    * [[MutableRegistryProvider]] covers single-JVM (local[N])
    * deployments; on a multi-executor cluster back `current()` with a
    * periodically re-read file/table + per-executor TTL cache.
    */
  trait RegistryProvider extends Serializable {
    def current(): Registry
    /** Device-scoped view: volatile triggers live in a device's
      * session in the reference, so providers that carry RPC installs
      * (RpcControlPlane) overlay them only for that device's groups.
      * Default: the global registry.
      */
    def current(realm: String, deviceId: String): Registry = current()
  }

  final case class StaticRegistryProvider(registry: Registry) extends RegistryProvider {
    override def current(): Registry = registry
  }

  final class MutableRegistryProvider(initial: Registry) extends RegistryProvider {
    private val ref = new java.util.concurrent.atomic.AtomicReference(initial)
    def update(r: Registry): Unit = ref.set(r)
    override def current(): Registry = ref.get()
  }

  /** Attach the columnar stateless prefix: one `ingest_precompute`
    * struct column per message, computed inside whole-stage codegen
    * before any shuffle.
    */
  private[graft] def precomputed(
      ds: Dataset[Envelope],
      source: () => Registry): Dataset[(Envelope, IngestPre)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val df = ds.toDF()
    def e(name: String) =
      org.apache.spark.sql.graft.ColumnBridge.expression(df(name))
    val pre: Column = org.apache.spark.sql.graft.ColumnBridge.column(
      IngestPrecompute(source, e("msgType"), e("iface"), e("path"), e("payload")))
    df.select(struct(df.columns.map(df(_)): _*).as("_1"), pre.as("_2"))
      .as[(Envelope, IngestPre)]
  }

  private[graft] def precomputed(
      ds: Dataset[Envelope], registry: Registry): Dataset[(Envelope, IngestPre)] =
    precomputed(ds, () => registry)

  private def sortedFoldPre(
      key: DeviceKey,
      msgs: Iterator[(Envelope, IngestPre)],
      initial: DeviceSessionState,
      registry: Registry,
      ctx: DeviceProcessor.PreContext): (DeviceSessionState, Iterator[EffectRow]) = {
    // Buffers ONE device's slice of ONE micro-batch — memory is
    // bounded by the source's per-trigger cap (maxOffsetsPerTrigger /
    // maxFilesPerTrigger, the AMQP prefetch analogue), not by stream
    // length. A pathological hot device is limited to its share of
    // that cap; size the cap so cap × avg message ≪ executor memory.
    val ordered = msgs.toSeq.sortBy(t => (t._1.receptionDecimicros, t._1.offset))
    var state = initial
    val out = Seq.newBuilder[EffectRow]
    ordered.foreach { case (env, pre) =>
      val (s2, effects) = DeviceProcessor.processMessagePre(state, env, pre, registry, ctx)
      state = s2
      out ++= effects
    }
    // End-of-slice stats patch (ST8 write side): keeps the stored
    // devices dimension current between disconnects, so a cold
    // restart bootstraps exact counters. Same (reception, submillis)
    // as the slice's last message; content-identical to a disconnect
    // flush at the same point, so the fold order is immaterial.
    ordered.lastOption.foreach { case (last, _) =>
      val (ms, sub) = PayloadCodec.splitReceptionTimestamp(last.receptionDecimicros)
      out += DeviceProcessor.statsFlush(state, key._1, key._2, ms, sub)
    }
    (state, out.result().iterator)
  }

  /** Batch ingest: columnar prefix, then one fold per device over its
    * ALREADY-SORTED run — `repartition` + `sortWithinPartitions`
    * replaces groupByKey's hash-grouping + per-group object sort, so
    * rows stay in Tungsten form through the exchange and the sort.
    * Deterministic given (receptionDecimicros, offset) ordering.
    *
    * `initialStates` seeds per-device session state — the reference's
    * ST8 "load stats from DB on first occurrence" (`impl.ex:50-87`):
    * pass the stored totals/introspection for known devices; unknown
    * devices start empty.
    */
  def processBatch(
      ds: Dataset[Envelope], registry: Registry,
      initialStates: Map[DeviceKey, DeviceSessionState] = Map.empty): Dataset[EffectRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    // explicit partition count: REPARTITION_BY_COL without one lets
    // AQE coalesce a small exchange down to ~1 partition, serializing
    // the fold on one core — the keyed fold wants cluster parallelism
    val sorted = precomputed(ds, registry)
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("_1.realm"), col("_1.deviceId"))
      .sortWithinPartitions(col("_1.realm"), col("_1.deviceId"),
        col("_1.receptionDecimicros"), col("_1.offset"))
    // Fold over the physical InternalRows: the tuple Encoder's
    // deserializer (reflective nested-struct navigation, ~40% of the
    // post-shuffle cost measured at sf0.1) is replaced by direct
    // ordinal access; each message is materialized exactly once.
    val envOrd = Envelope.fieldNames
    val expected = Seq("_1", "_2")
    require(sorted.schema.fieldNames.sameElements(expected) &&
      sorted.schema(0).dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.sameElements(envOrd),
      "ingest fold ordinals out of sync with Envelope schema")
    val effects = sorted.queryExecution.toRdd.mapPartitions { rows =>
      // the registry here is the SAME object the precompute ran with
      // (one processBatch call) — the fingerprint matches by
      // construction; PreContext still carries it for uniformity
      val ctx = DeviceProcessor.PreContext.of(registry)
      new FoldIterator(rows, registry, ctx, initialStates)
    }
    spark.createDataset(effects)
  }

  /** Per-partition streaming fold over sorted (device, reception,
    * offset) InternalRows. Buffers one DEVICE's effects at a time
    * (not the partition, not the message slice) — strictly less
    * memory than the groupByKey shape it replaces. Rows are consumed
    * via [[readMsg]] before the iterator advances, because the
    * upstream sorter reuses its row buffer.
    */
  private final class FoldIterator(
      rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      registry: Registry,
      ctx: DeviceProcessor.PreContext,
      initialStates: Map[DeviceKey, DeviceSessionState]) extends Iterator[EffectRow] {

    private def readMsg(r: org.apache.spark.sql.catalyst.InternalRow): (Envelope, IngestPre) = {
      val e = r.getStruct(0, 9)
      val p = r.getStruct(1, 7)
      def str(i: Int): String = {
        val u = e.getUTF8String(i); if (u == null) null else u.toString
      }
      (Envelope(str(0), str(1), str(2), str(3), str(4),
        if (e.isNullAt(5)) null else e.getBinary(5),
        e.getLong(6), str(7), e.getLong(8)),
        IngestPre(p.getInt(0), p.getInt(1), p.getBoolean(2), p.getLong(3),
          if (p.isNullAt(4)) null else p.getBinary(4), p.getLong(5), p.getLong(6)))
    }

    private var lookahead: (Envelope, IngestPre) =
      if (rows.hasNext) readMsg(rows.next()) else null
    private var pending: Iterator[EffectRow] = Iterator.empty

    override def hasNext: Boolean = pending.hasNext || lookahead != null

    override def next(): EffectRow = {
      if (!pending.hasNext) foldNextDevice()
      pending.next()
    }

    private def foldNextDevice(): Unit = {
      val key = (lookahead._1.realm, lookahead._1.deviceId)
      var state = initialStates.getOrElse(key, DeviceSessionState.empty)
      val out = Seq.newBuilder[EffectRow]
      var last: Envelope = null
      while (lookahead != null &&
          lookahead._1.realm == key._1 && lookahead._1.deviceId == key._2) {
        val (env, pre) = lookahead
        // FIFO correctness depends on the partition-local sort
        // upstream; if an optimizer change ever eliminates it, fail
        // loudly rather than fold out of order
        if (last != null &&
            (env.receptionDecimicros < last.receptionDecimicros ||
              (env.receptionDecimicros == last.receptionDecimicros &&
                env.offset < last.offset)))
          throw new IllegalStateException(
            s"ingest fold saw unsorted input for device ${key._2}")
        val (s2, fx) =
          DeviceProcessor.processMessagePre(state, env, pre, registry, ctx)
        state = s2
        out ++= fx
        last = env
        lookahead = if (rows.hasNext) readMsg(rows.next()) else null
      }
      val (ms, sub) = PayloadCodec.splitReceptionTimestamp(last.receptionDecimicros)
      out += DeviceProcessor.statsFlush(state, key._1, key._2, ms, sub)
      pending = out.result().iterator
    }
  }

  /** Streaming ingest: state persists in the state store across
    * micro-batches; the registry is re-read from the provider on
    * every group invocation AND by the precompute expression itself
    * (it holds the provider, not a snapshot), so registry/trigger
    * updates reach the running query and the columnar fast path
    * resumes with the new registry — only rows precomputed before an
    * update fail the fingerprint check and take the full path.
    */
  def processStream(
      ds: Dataset[Envelope], provider: RegistryProvider): Dataset[EffectRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    precomputed(ds, () => provider.current())
      .groupByKey(t => (t._1.realm, t._1.deviceId))
      .flatMapGroupsWithState[DeviceSessionState, EffectRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: DeviceKey, msgs: Iterator[(Envelope, IngestPre)], gs: GroupState[DeviceSessionState]) =>
          val initial = gs.getOption.getOrElse(DeviceSessionState.empty)
          val registry = provider.current(key._1, key._2)
          val (finalState, out) = sortedFoldPre(key, msgs, initial,
            registry, DeviceProcessor.PreContext.of(registry))
          gs.update(finalState)
          out
      }
  }

  def processStream(ds: Dataset[Envelope], registry: Registry): Dataset[EffectRow] =
    processStream(ds, StaticRegistryProvider(registry))

  /** Streaming ingest with bootstrap state (ST8 init-from-store):
    * first occurrence of a key starts from `initialStates` instead of
    * empty — the migration path when the state store starts cold but
    * the device table already has totals.
    */
  def processStreamWithInit(
      ds: Dataset[Envelope], provider: RegistryProvider,
      initialStates: Dataset[(DeviceKey, DeviceSessionState)]): Dataset[EffectRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    precomputed(ds, () => provider.current())
      .groupByKey(t => (t._1.realm, t._1.deviceId))
      .flatMapGroupsWithState[DeviceSessionState, EffectRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout,
        initialStates.groupByKey(_._1).mapValues(_._2)) {
        (key: DeviceKey, msgs: Iterator[(Envelope, IngestPre)], gs: GroupState[DeviceSessionState]) =>
          val initial = gs.getOption.getOrElse(DeviceSessionState.empty)
          val registry = provider.current(key._1, key._2)
          val (finalState, out) = sortedFoldPre(key, msgs, initial,
            registry, DeviceProcessor.PreContext.of(registry))
          gs.update(finalState)
          out
      }
  }

  def processStreamWithInit(
      ds: Dataset[Envelope], registry: Registry,
      initialStates: Dataset[(DeviceKey, DeviceSessionState)]): Dataset[EffectRow] =
    processStreamWithInit(ds, StaticRegistryProvider(registry), initialStates)
}
