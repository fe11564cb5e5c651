package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.PayloadCodec

/** Spark drivers for [[DeviceProcessor]]: the per-device keyed state
  * machine (SURVEY §2.8 ST1) as
  * `groupByKey((realm, device)).flatMapGroupsWithState`.
  *
  * Scale design: the only shuffle is the keyed grouping; per-key
  * processing is O(messages) with state in the state store. Message
  * order within a key follows (receptionDecimicros, offset) — the
  * FIFO the reference's MessageTracker enforced — restored by an
  * explicit sort inside each group, so redelivery/batch boundaries
  * can't reorder a device's stream.
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

  private def sortedFold(
      key: DeviceKey,
      msgs: Iterator[Envelope],
      initial: DeviceSessionState,
      registry: Registry): (DeviceSessionState, Iterator[EffectRow]) = {
    // Buffers ONE device's slice of ONE micro-batch — memory is
    // bounded by the source's per-trigger cap (maxOffsetsPerTrigger /
    // maxFilesPerTrigger, the AMQP prefetch analogue), not by stream
    // length. A pathological hot device is limited to its share of
    // that cap; size the cap so cap × avg message ≪ executor memory.
    val ordered = msgs.toSeq.sortBy(e => (e.receptionDecimicros, e.offset))
    var state = initial
    val out = Seq.newBuilder[EffectRow]
    ordered.foreach { env =>
      val (s2, effects) = DeviceProcessor.processMessage(state, env, registry)
      state = s2
      out ++= effects
    }
    // End-of-slice stats patch (ST8 write side): keeps the stored
    // devices dimension current between disconnects, so a cold
    // restart bootstraps exact counters. Same (reception, submillis)
    // as the slice's last message; content-identical to a disconnect
    // flush at the same point, so the fold order is immaterial.
    ordered.lastOption.foreach { last =>
      val (ms, sub) = PayloadCodec.splitReceptionTimestamp(last.receptionDecimicros)
      out += DeviceProcessor.statsFlush(state, key._1, key._2, ms, sub)
    }
    (state, out.result().iterator)
  }

  /** Batch ingest: one fold per device over the whole Dataset.
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
    ds.groupByKey(e => (e.realm, e.deviceId))
      .flatMapGroups { (key: DeviceKey, msgs: Iterator[Envelope]) =>
        val init = initialStates.getOrElse(key, DeviceSessionState.empty)
        sortedFold(key, msgs, init, registry)._2
      }
  }

  /** Streaming ingest: state persists in the state store across
    * micro-batches; the registry is re-read from the provider on
    * every group invocation, so registry/trigger updates reach the
    * running query.
    */
  def processStream(
      ds: Dataset[Envelope], provider: RegistryProvider): Dataset[EffectRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(e => (e.realm, e.deviceId))
      .flatMapGroupsWithState[DeviceSessionState, EffectRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: DeviceKey, msgs: Iterator[Envelope], gs: GroupState[DeviceSessionState]) =>
          val initial = gs.getOption.getOrElse(DeviceSessionState.empty)
          val (finalState, out) = sortedFold(key, msgs, initial,
            provider.current(key._1, key._2))
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
    ds.groupByKey(e => (e.realm, e.deviceId))
      .flatMapGroupsWithState[DeviceSessionState, EffectRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout,
        initialStates.groupByKey(_._1).mapValues(_._2)) {
        (key: DeviceKey, msgs: Iterator[Envelope], gs: GroupState[DeviceSessionState]) =>
          val initial = gs.getOption.getOrElse(DeviceSessionState.empty)
          val (finalState, out) = sortedFold(key, msgs, initial,
            provider.current(key._1, key._2))
          gs.update(finalState)
          out
      }
  }

  def processStreamWithInit(
      ds: Dataset[Envelope], registry: Registry,
      initialStates: Dataset[(DeviceKey, DeviceSessionState)]): Dataset[EffectRow] =
    processStreamWithInit(ds, StaticRegistryProvider(registry), initialStates)
}
