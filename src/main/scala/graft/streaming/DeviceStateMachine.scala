package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  private def sortedFold(
      key: DeviceKey,
      msgs: Iterator[Envelope],
      initial: DeviceSessionState,
      registry: Registry): (DeviceSessionState, Iterator[EffectRow]) = {
    val ordered = msgs.toSeq.sortBy(e => (e.receptionDecimicros, e.offset))
    var state = initial
    val out = Seq.newBuilder[EffectRow]
    ordered.foreach { env =>
      val (s2, effects) = DeviceProcessor.processMessage(state, env, registry)
      state = s2
      out ++= effects
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
    * micro-batches; registry is re-broadcast per batch (the Spark
    * replacement for the reference's 10-min metadata caches).
    */
  def processStream(
      ds: Dataset[Envelope], registry: Registry): Dataset[EffectRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(e => (e.realm, e.deviceId))
      .flatMapGroupsWithState[DeviceSessionState, EffectRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: DeviceKey, msgs: Iterator[Envelope], gs: GroupState[DeviceSessionState]) =>
          val initial = gs.getOption.getOrElse(DeviceSessionState.empty)
          val (finalState, out) = sortedFold(key, msgs, initial, registry)
          gs.update(finalState)
          out
      }
  }

  /** Streaming ingest with bootstrap state (ST8 init-from-store):
    * first occurrence of a key starts from `initialStates` instead of
    * empty — the migration path when the state store starts cold but
    * the device table already has totals.
    */
  def processStreamWithInit(
      ds: Dataset[Envelope], registry: Registry,
      initialStates: Dataset[(DeviceKey, DeviceSessionState)]): Dataset[EffectRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(e => (e.realm, e.deviceId))
      .flatMapGroupsWithState[DeviceSessionState, EffectRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout,
        initialStates.groupByKey(_._1).mapValues(_._2)) {
        (key: DeviceKey, msgs: Iterator[Envelope], gs: GroupState[DeviceSessionState]) =>
          val initial = gs.getOption.getOrElse(DeviceSessionState.empty)
          val (finalState, out) = sortedFold(key, msgs, initial, registry)
          gs.update(finalState)
          out
      }
  }
}
