package graft.streaming

import java.time.Instant
import scala.collection.immutable.ListMap

import graft.core._
import graft.events._
import graft.triggers._

/** One broker message, after header extraction (SURVEY §3.1 step 1).
  * `offset` is the per-device arrival order (the FIFO the reference's
  * MessageTracker enforces); `receptionDecimicros` is the broker
  * timestamp in tenths of microseconds.
  */
final case class Envelope(
    realm: String,
    deviceId: String,
    msgType: String, // connection | disconnection | introspection | data | control
    iface: String,
    path: String,
    payload: Array[Byte],
    receptionDecimicros: Long,
    ipAddress: String,
    offset: Long)

object Envelope {
  /** Declaration-order column names — the ordinal contract of the
    * ingest fold's direct InternalRow access.
    */
  val fieldNames: Array[String] = Array("realm", "deviceId", "msgType",
    "iface", "path", "payload", "receptionDecimicros", "ipAddress", "offset")
}

/** Flat effect row — the single output type of the state machine so
  * one Encoder covers writes, events, commands and errors; a sink
  * routes on `kind`.
  */
final case class EffectRow(
    kind: String,
    realm: String,
    deviceId: String,
    iface: String,
    major: Int,
    endpoint: String,
    path: String,
    valueTypeCode: Int,
    valueBson: Array[Byte], // BSON {v: value}; null when n/a
    prevBson: Array[Byte],  // BSON {v: previous}; null when n/a
    valueTimestampMs: Long,
    receptionMs: Long,
    submillis: Int,
    eventType: String,
    target: String,
    detail: String)

object EffectRow {
  def blank(kind: String, realm: String, deviceId: String): EffectRow =
    EffectRow(kind, realm, deviceId, null, -1, null, null, -1, null, null,
      -1L, -1L, -1, null, null, null)
}

/** Per-device session state — the Spark state-store mirror of the
  * reference's 23-field device actor state (SURVEY §2.8 ST1;
  * reference `data_updater/state.ex:19-45`). Property values are kept
  * in state (BSON-encoded) so change triggers need no external as-of
  * lookup on the hot path.
  */
final case class DeviceSessionState(
    connected: Boolean,
    introspection: Map[String, Int],
    introspectionMinor: Map[String, Int],
    oldIntrospection: Map[String, Int], // "name:major" -> minor
    totalReceivedMsgs: Long,
    totalReceivedBytes: Long,
    interfaceMsgs: Map[String, Long],  // "name:major" -> msgs
    interfaceBytes: Map[String, Long], // "name:major" -> bytes
    properties: Map[String, Array[Byte]], // "iface/path" -> BSON {v}
    pendingEmptyCache: Boolean,
    // ST4 paths cache: recently upserted no-retention datastream
    // paths, FIFO-bounded like the reference's 32-entry cache
    // (data_updater/cache.ex:19-81) — a cache hit skips the redundant
    // path-index upsert, the write-amplification guard at scale.
    seenPaths: Vector[String] = Vector.empty)

object DeviceSessionState {
  val PathsCacheSize = 32
  val empty: DeviceSessionState = DeviceSessionState(
    connected = false, Map.empty, Map.empty, Map.empty, 0L, 0L,
    Map.empty, Map.empty, Map.empty, pendingEmptyCache = false)
}

/** The interface/trigger registry visible to the state machine —
  * broadcast per micro-batch (replacing the reference's 10-minute
  * TTL caches, SURVEY §2.8 ST2/ST3).
  */
final case class Registry(
    interfaces: Map[String, InterfaceDescriptor],
    mappings: Map[String, Seq[Mapping]],
    triggers: Seq[Trigger]) {
  def descriptor(name: String): Option[InterfaceDescriptor] = interfaces.get(name)
  def mappingsOf(name: String): Seq[Mapping] = mappings.getOrElse(name, Nil)
  def triggersFor(et: TriggerEventType): Seq[Trigger] =
    triggers.filter(_.eventType == et)
}

/** The device message pipeline as a pure function
  * `(state, message, registry) → (state', effects)` — the reference's
  * `Impl` module re-expressed for Spark's keyed-state model
  * (SURVEY §3.1/§3.2). Pure → unit-testable and usable from both
  * `flatMapGroupsWithState` and batch folds.
  */
object DeviceProcessor {

  def processMessage(
      state: DeviceSessionState,
      env: Envelope,
      registry: Registry): (DeviceSessionState, Seq[EffectRow]) = {
    val (receptionMs, submillis) =
      PayloadCodec.splitReceptionTimestamp(env.receptionDecimicros)
    env.msgType match {
      case "connection" => handleConnection(state, env, registry, receptionMs, submillis)
      case "disconnection" => handleDisconnection(state, env, registry, receptionMs, submillis)
      case "introspection" => handleIntrospection(state, env, registry, receptionMs, submillis)
      case "data" => handleData(state, env, registry, receptionMs, submillis)
      case "control" => handleControl(state, env, registry, receptionMs, submillis)
      case other =>
        (bumpStats(state, env), Seq(error(env, receptionMs, s"unexpected_msg_type:$other")))
    }
  }

  /** Fold-side context for the columnar prefix: the trigger-index
    * decoder for the prematch mask and the fingerprint of the fold's
    * registry (0 = "always recompute"). Built once per partition
    * (batch) or per group (stream), never per message.
    */
  final case class PreContext(
      regFp: Long,
      trigIdx: Map[TriggerEventType, Seq[(Trigger, Int)]])

  object PreContext {
    def of(registry: Registry): PreContext = PreContext(
      graft.functions.RegistryMeta.fingerprintOf(registry),
      graft.functions.RegistryMeta.triggerIndex(registry))
  }

  /** [[processMessage]] with the columnar-precomputed stateless prefix
    * ([[graft.functions.IngestPrecompute]]): identical results by
    * construction — the fast path reuses the same value-landing body
    * and falls back to the full row-at-a-time path whenever the
    * precompute can't be trusted (non-data message, registry changed
    * since plan time, unmaskable registry).
    */
  def processMessagePre(
      state: DeviceSessionState,
      env: Envelope,
      pre: graft.functions.IngestPre,
      registry: Registry,
      ctx: PreContext): (DeviceSessionState, Seq[EffectRow]) = {
    import graft.functions.IngestPre
    if (pre == null || env.msgType != "data" ||
        pre.err == IngestPre.ErrRecompute || pre.regFp != ctx.regFp)
      processMessage(state, env, registry)
    else {
      val (receptionMs, submillis) =
        PayloadCodec.splitReceptionTimestamp(env.receptionDecimicros)
      handleDataPre(state, env, registry, pre, ctx, receptionMs, submillis)
    }
  }

  private def handleDataPre(
      state: DeviceSessionState, env: Envelope, registry: Registry,
      pre: graft.functions.IngestPre, ctx: PreContext,
      receptionMs: Long, submillis: Int): (DeviceSessionState, Seq[EffectRow]) = {
    import graft.functions.IngestPre
    val s = bumpStats(state, env)
    if (pre.err != IngestPre.ErrOk)
      return askCleanSession(s, env, receptionMs, IngestPre.errName(pre.err), submillis)
    val iface = registry.interfaces(env.iface)
    val mapping = registry.mappingsOf(env.iface)(pre.mappingIdx)
    def trigOk(et: TriggerEventType): Seq[Trigger] =
      ctx.trigIdx.getOrElse(et, Nil).collect {
        case (t, i) if ((pre.trigMask >>> i) & 1L) == 1L => t
      }
    if (pre.isUnset)
      handleUnset(s, env, registry, iface, mapping, receptionMs, submillis,
        Some(trigOk))
    else {
      val valueTsMs =
        if (pre.valueTsMs == Long.MinValue) receptionMs else pre.valueTsMs
      handleValueWith(s, env, registry, iface, mapping, pre.canonical,
        trigOk, valueTsMs, receptionMs, submillis)
    }
  }

  // --- lifecycle ----------------------------------------------------------

  private def handleConnection(
      state: DeviceSessionState, env: Envelope, registry: Registry,
      receptionMs: Long, submillis: Int): (DeviceSessionState, Seq[EffectRow]) = {
    val update = EffectRow.blank("device_update", env.realm, env.deviceId)
      .copy(receptionMs = receptionMs, submillis = submillis,
        detail = s"""{"connected":true,"last_seen_ip":"${env.ipAddress}"}""")
    val events = deviceTriggers(TriggerEventType.DeviceConnected, env, registry).map { t =>
      EffectRow.blank("event", env.realm, env.deviceId).copy(
        eventType = "device_connected", target = t.targets.mkString(","),
        receptionMs = receptionMs, detail = env.ipAddress)
    }
    // lifecycle messages don't count toward received totals — the
    // reference's handle_connection has no stats bump (impl.ex:89-133)
    (state.copy(connected = true), update +: events)
  }

  private def handleDisconnection(
      state: DeviceSessionState, env: Envelope, registry: Registry,
      receptionMs: Long, submillis: Int): (DeviceSessionState, Seq[EffectRow]) = {
    // no bump: the reference's handle_disconnection only flushes the
    // accumulated counters (impl.ex:134-168)
    val s = state
    // Flush session stats on disconnect (reference W8/ST8).
    val update = EffectRow.blank("device_update", env.realm, env.deviceId)
      .copy(receptionMs = receptionMs, submillis = submillis,
        detail = s"""{"connected":false,${statsJson(s)}}""")
    val events = deviceTriggers(TriggerEventType.DeviceDisconnected, env, registry).map { t =>
      EffectRow.blank("event", env.realm, env.deviceId).copy(
        eventType = "device_disconnected", target = t.targets.mkString(","),
        receptionMs = receptionMs)
    }
    (s.copy(connected = false), update +: events)
  }

  // --- introspection (SURVEY §3.2) ---------------------------------------

  private def handleIntrospection(
      state: DeviceSessionState, env: Envelope, registry: Registry,
      receptionMs: Long, submillis: Int): (DeviceSessionState, Seq[EffectRow]) = {
    val text = new String(env.payload, java.nio.charset.StandardCharsets.UTF_8)
    PayloadCodec.parseIntrospection(text) match {
      case None =>
        askCleanSession(bumpStats(state, env), env, receptionMs, "invalid_introspection", submillis)
      case Some(entries) =>
        val s0 = bumpStats(state, env)
        val newMajor = entries.map(e => e.interfaceName -> e.major).toMap
        val newMinor = entries.map(e => e.interfaceName -> e.minor).toMap

        val incoming = registry
          .triggersFor(TriggerEventType.IncomingIntrospection).map { t =>
            EffectRow.blank("event", env.realm, env.deviceId).copy(
              eventType = "incoming_introspection",
              target = t.targets.mkString(","),
              receptionMs = receptionMs, detail = text)
          }

        // Full-outer diff of old vs new announced interfaces (J4).
        val names = (state.introspection.keySet ++ newMajor.keySet).toSeq.sorted
        val diffEffects = names.flatMap { name =>
          (state.introspection.get(name), newMajor.get(name)) match {
            case (None, Some(maj)) =>
              kvRegister(env, name, maj, receptionMs, register = true) ++
                fireIntrospectionEvent(env, registry, TriggerEventType.InterfaceAdded,
                  "interface_added", name, maj, newMinor.getOrElse(name, 0), receptionMs)
            case (Some(oldMaj), None) =>
              kvRegister(env, name, oldMaj, receptionMs, register = false) ++
                fireIntrospectionEvent(env, registry, TriggerEventType.InterfaceRemoved,
                  "interface_removed", name, oldMaj, -1, receptionMs)
            case (Some(oldMaj), Some(maj)) if oldMaj != maj =>
              // Major change: the reference's Myers diff over
              // (name, major) pairs yields del+ins, so both
              // interface_removed (old major, with kv unregister for
              // major 0) and interface_added fire (impl.ex:740-800).
              kvRegister(env, name, oldMaj, receptionMs, register = false) ++
                fireIntrospectionEvent(env, registry, TriggerEventType.InterfaceRemoved,
                  "interface_removed", name, oldMaj, -1, receptionMs) ++
                kvRegister(env, name, maj, receptionMs, register = true) ++
                fireIntrospectionEvent(env, registry, TriggerEventType.InterfaceAdded,
                  "interface_added", name, maj, newMinor.getOrElse(name, 0), receptionMs)
            case (Some(_), Some(maj)) =>
              val oldMin = state.introspectionMinor.getOrElse(name, 0)
              val newMin = newMinor.getOrElse(name, 0)
              if (oldMin != newMin)
                fireIntrospectionEvent(env, registry, TriggerEventType.InterfaceMinorUpdated,
                  "interface_minor_updated", name, maj, newMin, receptionMs, oldMinor = oldMin)
              else Nil
            case (None, None) => Nil
          }
        }

        // Old-introspection bookkeeping for removed/upgraded versions
        // (A4/W9): (name, retired major, its minor) tuples.
        val removedOld: Seq[(String, Int, Int)] = names.toSeq.flatMap { name =>
          (state.introspection.get(name), newMajor.get(name)) match {
            case (Some(oldMaj), None) =>
              Some((name, oldMaj, state.introspectionMinor.getOrElse(name, 0)))
            case (Some(oldMaj), Some(maj)) if oldMaj != maj =>
              Some((name, oldMaj, state.introspectionMinor.getOrElse(name, 0)))
            case _ => None
          }
        }

        val introUpdate = EffectRow.blank("device_update", env.realm, env.deviceId)
          .copy(receptionMs = receptionMs, submillis = submillis,
            detail = {
              val intro = entries.sortBy(_.interfaceName)
                .map(e => s""""${e.interfaceName}":[${e.major},${e.minor}]""")
                .mkString("\"introspection\":{", ",", "}")
              // removed/upgraded versions ride the same patch so the
              // store's devices fold accumulates old_introspection
              // (reference devices.old_introspection, queries.ex fold)
              val old =
                if (removedOld.isEmpty) ""
                else removedOld.sortBy(t => (t._1, t._2))
                  .map { case (name, major, minor) =>
                    s""""$name:$major":[$major,$minor]"""
                  }
                  .mkString(",\"old_introspection\":{", ",", "}")
              s"{$intro$old}"
            })

        // Drop properties of interfaces no longer announced.
        val keptProps = state.properties.filter { case (k, _) =>
          newMajor.keySet.exists(n => k.startsWith(n + "/"))
        }

        val s1 = s0.copy(
          introspection = newMajor,
          introspectionMinor = newMinor,
          oldIntrospection = s0.oldIntrospection ++
            removedOld.map { case (n, mj, mn) => s"$n:$mj" -> mn },
          properties = keptProps)
        (s1, incoming ++ diffEffects :+ introUpdate)
    }
  }

  private def fireIntrospectionEvent(
      env: Envelope, registry: Registry, et: TriggerEventType,
      name: String, iface: String, major: Int, minor: Int,
      receptionMs: Long, oldMinor: Int = -1): Seq[EffectRow] =
    registry.triggersFor(et).map { t =>
      EffectRow.blank("event", env.realm, env.deviceId).copy(
        eventType = name, iface = iface, major = major,
        target = t.targets.mkString(","), receptionMs = receptionMs,
        detail = if (oldMinor >= 0) s"$oldMinor->$minor"
                 else if (minor >= 0) minor.toString else null)
    }

  private def kvRegister(
      env: Envelope, name: String, major: Int, receptionMs: Long,
      register: Boolean): Seq[EffectRow] =
    if (major != 0) Nil // reference registers kv groups only for major 0
    else {
      def row(group: String) =
        EffectRow.blank("kv_store", env.realm, env.deviceId).copy(
          iface = name, major = major, receptionMs = receptionMs,
          detail = (if (register) "register:" else "unregister:") +
            s"$group-$name-v$major")
      // register inserts into both groups (queries.ex:599-637);
      // unregister deletes only devices-by-interface (queries.ex:638-664).
      if (register)
        Seq(row("devices-by-interface"), row("devices-with-data-on-interface"))
      else
        Seq(row("devices-by-interface"))
    }

  // --- data (SURVEY §3.1, the hot path) ----------------------------------

  private def handleData(
      state: DeviceSessionState, env: Envelope, registry: Registry,
      receptionMs: Long, submillis: Int): (DeviceSessionState, Seq[EffectRow]) = {
    // Totals bump up front; per-interface counters only on the success
    // paths (the reference calls update_stats with major=nil on every
    // error branch, which skips the interface bump — impl.ex:462-523,
    // 634-638).
    val s = bumpStats(state, env)

    // validate_path → interface lookup → ownership → resolve → decode
    // → type check, each failing to the clean-session error path (ST6).
    if (!PathMatcher.isValidPath(env.path))
      return askCleanSession(s, env, receptionMs, "invalid_path", submillis)

    registry.descriptor(env.iface) match {
      case None => askCleanSession(s, env, receptionMs, "interface_loading_failed", submillis)
      case Some(iface) if iface.ownership == Ownership.Server =>
        askCleanSession(s, env, receptionMs, "cannot_write_on_server_owned_interface", submillis)
      case Some(iface) =>
        PathMatcher.resolve(registry.mappingsOf(env.iface), iface.aggregation, env.path) match {
          case None => askCleanSession(s, env, receptionMs, "mapping_not_found", submillis)
          case Some(mapping) =>
            PayloadCodec.decodePayload(env.payload) match {
              case None => askCleanSession(s, env, receptionMs, "undecodable_bson_payload", submillis)
              case Some(decoded) =>
                val valueTsMs = decoded.timestamp
                  .filter(_ => mapping.explicitTimestamp)
                  .map(_.toEpochMilli).getOrElse(receptionMs)
                if (decoded.value == null)
                  handleUnset(s, env, registry, iface, mapping, receptionMs, submillis)
                else if (!TypeChecker.validates(decoded.value, mapping, iface, registry))
                  askCleanSession(s, env, receptionMs, "unexpected_value_type", submillis)
                else
                  handleValue(s, env, registry, iface, mapping, decoded.value,
                    valueTsMs, receptionMs, submillis)
            }
        }
    }
  }

  private def handleValue(
      state: DeviceSessionState, env: Envelope, registry: Registry,
      iface: InterfaceDescriptor, mapping: Mapping, value: Any,
      valueTsMs: Long, receptionMs: Long, submillis: Int): (DeviceSessionState, Seq[EffectRow]) =
    handleValueWith(state, env, registry, iface, mapping,
      Bson.encode(Seq("v" -> value)),
      et => registry.triggersFor(et)
        .filter(_.matchesDataEvent(env.iface, iface.major, env.path, value)),
      valueTsMs, receptionMs, submillis)

  /** The shared value-landing body: `bson` is the canonical `{v: _}`
    * encoding and `trigOk(et)` yields the triggers of that event type
    * whose (scope, path, value) predicate matches this event — either
    * evaluated row-at-a-time ([[handleValue]]) or decoded from the
    * columnar prematch mask ([[handleDataPre]]). Both callers MUST
    * agree byte-for-byte (the precompute uses the same encoder and the
    * same matchesDataEvent).
    */
  private def handleValueWith(
      state: DeviceSessionState, env: Envelope, registry: Registry,
      iface: InterfaceDescriptor, mapping: Mapping, bson: Array[Byte],
      trigOk: TriggerEventType => Seq[Trigger],
      valueTsMs: Long, receptionMs: Long, submillis: Int): (DeviceSessionState, Seq[EffectRow]) = {
    val propKey = env.iface + env.path
    val prev = state.properties.get(propKey)

    // incoming_data fires at all three scopes (impl.ex:179-199) —
    // matchesDataEvent covers any-interface / interface / path+value.
    val incoming = trigOk(TriggerEventType.IncomingData)
      .map(t => dataEvent(env, iface, "incoming_data", t, bson, null, receptionMs))

    val isProperty = iface.interfaceType == InterfaceType.Properties
    val changed = isProperty && prev.exists(p => !java.util.Arrays.equals(p, bson))
    val created = isProperty && prev.isEmpty

    // value_change fires BEFORE the write, only when prev != new.
    val preEvents =
      (if (changed || created)
        trigOk(TriggerEventType.ValueChange)
          .map(t => dataEvent(env, iface, "value_change", t, bson, prev.orNull, receptionMs))
      else Nil) ++
      (if (created)
        trigOk(TriggerEventType.PathCreated)
          .map(t => dataEvent(env, iface, "path_created", t, bson, null, receptionMs))
      else Nil)

    val write =
      if (isProperty)
        EffectRow("property_upsert", env.realm, env.deviceId, env.iface,
          iface.major, mapping.endpoint, env.path, mapping.valueType.code,
          bson, prev.orNull, valueTsMs, receptionMs, submillis, null, null, null)
      else {
        val kind = if (iface.aggregation == Aggregation.Object) "object_append"
                   else "datastream_append"
        // W3 retention: datastream/object value rows carry their own
        // expiry when the mapping has retention configured — the
        // reference's `USING TTL retention` on the value insert
        // (queries.ex:157-197, impl.ex:438); no retention → no expiry.
        val retention =
          if (mapping.expirySeconds > 0)
            s"expiry_ms:${receptionMs + mapping.expirySeconds.toLong * 1000L}"
          else null
        EffectRow(kind, env.realm, env.deviceId, env.iface,
          iface.major, mapping.endpoint, env.path, mapping.valueType.code,
          bson, null, valueTsMs, receptionMs, submillis, null, null, retention)
      }

    // Datastream path-index upsert (W5): covers EVERY individual/
    // object datastream value (reference impl.ex:386-421) — retention
    // only adds the expiry, at 2.5× like path_ttl (impl.ex:527-533);
    // no retention → expiry stays null and the row never expires.
    // ST4: a no-retention path already in the session paths cache
    // skips the re-upsert — the stored row's last-activity then stays
    // at the last pre-cache-hit write, exactly the staleness the
    // reference's cache accepts by design (its cache hit also skips
    // the row refresh); retention paths always re-upsert — their
    // expiry must refresh (cache-hit vs maybe-update split,
    // impl.ex:390-416).
    val pathKey = env.iface + env.path
    val cacheable = !isProperty && mapping.expirySeconds <= 0
    val pathIndex =
      if (!isProperty && !(cacheable && state.seenPaths.contains(pathKey))) {
        val detail =
          if (mapping.expirySeconds > 0) {
            val ttlMs = mapping.expirySeconds.toLong * 1000L * 5 / 2
            s"expiry_ms:${receptionMs + ttlMs}"
          } else null
        Seq(EffectRow.blank("path_index", env.realm, env.deviceId).copy(
          iface = env.iface, major = iface.major, path = env.path,
          valueTimestampMs = valueTsMs, receptionMs = receptionMs,
          detail = detail))
      } else Nil

    // value_change_applied fires AFTER the write.
    val postEvents =
      if (changed || created)
        trigOk(TriggerEventType.ValueChangeApplied)
          .map(t => dataEvent(env, iface, "value_change_applied", t, bson, prev.orNull, receptionMs))
      else Nil

    val s1 =
      if (isProperty) state.copy(properties = state.properties + (propKey -> bson))
      else if (cacheable && !state.seenPaths.contains(pathKey)) {
        val fifo = state.seenPaths :+ pathKey
        state.copy(seenPaths =
          if (fifo.length > DeviceSessionState.PathsCacheSize) fifo.tail else fifo)
      } else state
    (bumpIfaceStats(s1, env, iface.major),
      incoming ++ preEvents ++ Seq(write) ++ pathIndex ++ postEvents)
  }

  private def handleUnset(
      state: DeviceSessionState, env: Envelope, registry: Registry,
      iface: InterfaceDescriptor, mapping: Mapping,
      receptionMs: Long, submillis: Int,
      trigOkOpt: Option[TriggerEventType => Seq[Trigger]] = None): (DeviceSessionState, Seq[EffectRow]) = {
    if (iface.interfaceType != InterfaceType.Properties)
      return askCleanSession(state, env, receptionMs, "unset_on_datastream", submillis)
    if (!mapping.allowUnset)
      return askCleanSession(state, env, receptionMs, "unset_not_allowed", submillis)
    val propKey = env.iface + env.path
    val trigOk = trigOkOpt.getOrElse((et: TriggerEventType) =>
      registry.triggersFor(et)
        .filter(_.matchesDataEvent(env.iface, iface.major, env.path, null)))
    val removed = trigOk(TriggerEventType.PathRemoved)
      .map(t => dataEvent(env, iface, "path_removed", t, null, null, receptionMs))
    val del = EffectRow("property_unset", env.realm, env.deviceId, env.iface,
      iface.major, mapping.endpoint, env.path, mapping.valueType.code,
      null, state.properties.get(propKey).orNull,
      -1L, receptionMs, submillis, null, null, null)
    (bumpIfaceStats(state.copy(properties = state.properties - propKey),
      env, iface.major), del +: removed)
  }

  // --- control ------------------------------------------------------------

  private def handleControl(
      state: DeviceSessionState, env: Envelope, registry: Registry,
      receptionMs: Long, submillis: Int): (DeviceSessionState, Seq[EffectRow]) = {
    // /emptyCache is the one control path the reference does NOT count
    // (impl.ex:921-936); /producer/properties and unknown paths bump
    // payload+path bytes (impl.ex:915-917, 943)
    val s = if (env.path == "/emptyCache") state else bumpStats(state, env)
    env.path match {
      case "/emptyCache" =>
        // ST7: resend SERVER-owned properties (the ones the device
        // consumes) + the consumer-properties digest listing exactly
        // those paths. Server-owned values enter session state via
        // the initial-state bootstrap (seeded from the properties
        // table on first key occurrence) — devices cannot write them
        // (F8), servers write through the store, not this stream.
        val serverOwned = registry.interfaces.values
          .filter(i => i.ownership == Ownership.Server &&
            i.interfaceType == InterfaceType.Properties &&
            s.introspection.contains(i.name))
          .toSeq.sortBy(_.name)
        val resend = serverOwned.flatMap { i =>
          s.properties.collect {
            case (k, v) if k.startsWith(i.name + "/") =>
              EffectRow.blank("command", env.realm, env.deviceId).copy(
                iface = i.name, path = k.substring(i.name.length),
                valueBson = v, receptionMs = receptionMs, detail = "publish")
          }.toSeq.sortBy(_.path)
        }
        val serverPaths = serverOwned.flatMap(i =>
          s.properties.keys.filter(_.startsWith(i.name + "/"))).sorted
        val digest = EffectRow.blank("command", env.realm, env.deviceId).copy(
          path = "/control/consumer/properties",
          valueBson = PayloadCodec.deflateProperties(serverPaths.mkString(";")),
          receptionMs = receptionMs, detail = "consumer_properties")
        val clear = EffectRow.blank("device_update", env.realm, env.deviceId).copy(
          receptionMs = receptionMs, submillis = submillis,
          detail = """{"pending_empty_cache":false}""")
        (s.copy(pendingEmptyCache = false), resend ++ Seq(digest, clear))

      case "/producer/properties" =>
        // Property prune (J5): delete stored device-owned property
        // paths not in the announced set; fire path_removed for each.
        PayloadCodec.parseDeviceProperties(env.payload, s.introspection.keySet) match {
          case None => askCleanSession(s, env, receptionMs, "invalid_properties_payload", submillis)
          case Some(announced) =>
            val announcedKeys = announced.map { case (i, p) => i + p }
            val deviceOwnedProps = s.properties.keys.filter { k =>
              registry.interfaces.values.exists(i =>
                i.ownership == Ownership.Device && k.startsWith(i.name + "/"))
            }.toSeq.sorted
            val toDelete = deviceOwnedProps.filterNot(announcedKeys.contains)
            val effects = toDelete.flatMap { k =>
              val ifaceName = registry.interfaces.keys
                .filter(n => k.startsWith(n + "/")).maxByOption(_.length)
              ifaceName.toSeq.flatMap { n =>
                val path = k.substring(n.length)
                val desc = registry.interfaces(n)
                val major = desc.major
                // Resolve the mapping so the delete row carries the
                // same (endpoint, valueTypeCode) key as the stored
                // upsert — the reference deletes by endpoint_id
                // (queries.ex:395, impl.ex:1373-1390); without it the
                // tombstone lands in its own LwwTable partition and
                // the prune never takes effect.
                PathMatcher.resolve(
                    registry.mappingsOf(n), desc.aggregation, path) match {
                  case None =>
                    // A stored path that no longer resolves would make
                    // a dead tombstone (endpoint=null misses the stored
                    // row); the reference hard-fails here — surface it.
                    Seq(error(env, receptionMs, s"prune_mapping_not_found:$n$path"))
                  case Some(mapping) =>
                    // Tombstone carries the envelope's submillis: LWW
                    // orders on (reception_timestamp, submillis), so a
                    // -1 here would lose to a same-millisecond upsert.
                    val del = EffectRow.blank("property_unset", env.realm, env.deviceId)
                      .copy(iface = n, major = major,
                        endpoint = mapping.endpoint,
                        valueTypeCode = mapping.valueType.code,
                        path = path, prevBson = s.properties.get(k).orNull,
                        receptionMs = receptionMs, submillis = submillis,
                        detail = "prune")
                    val evts = registry.triggersFor(TriggerEventType.PathRemoved)
                      .filter(_.matchesDataEvent(n, major, path, null))
                      .map(t => EffectRow.blank("event", env.realm, env.deviceId).copy(
                        eventType = "path_removed", iface = n, path = path,
                        target = t.targets.mkString(","), receptionMs = receptionMs))
                    del +: evts
                }
              }
            }
            (s.copy(properties = s.properties.filter(kv => announcedKeys.contains(kv._1) ||
              !deviceOwnedProps.contains(kv._1))), effects)
        }

      case other =>
        askCleanSession(s, env, receptionMs, s"unexpected_control_message:$other", submillis)
    }
  }

  // --- shared -------------------------------------------------------------

  private def dataEvent(
      env: Envelope, iface: InterfaceDescriptor, name: String, t: Trigger,
      bson: Array[Byte], prev: Array[Byte], receptionMs: Long): EffectRow =
    EffectRow.blank("event", env.realm, env.deviceId).copy(
      eventType = name, iface = env.iface, major = iface.major,
      path = env.path, valueBson = bson, prevBson = prev,
      target = t.targets.mkString(","), receptionMs = receptionMs)

  private def deviceTriggers(
      et: TriggerEventType, env: Envelope, registry: Registry): Seq[Trigger] =
    registry.triggersFor(et).filter { t =>
      t.scope match {
        case TriggerScope.OnDevice(id) => id == env.deviceId
        case TriggerScope.AnyDevice => true
        case _ => false
      }
    }

  /** Totals + exchanged counters as the device_update JSON fragment
    * shared by the disconnect flush and the per-micro-batch flush.
    */
  private def statsJson(s: DeviceSessionState): String = {
    val exchanged = s.interfaceMsgs.toSeq.sorted
      .map { case (k, v) => s""""$k":[$v,${s.interfaceBytes.getOrElse(k, 0L)}]""" }
      .mkString("{", ",", "}")
    s""""total_received_msgs":${s.totalReceivedMsgs},""" +
      s""""total_received_bytes":${s.totalReceivedBytes},"exchanged":$exchanged"""
  }

  /** ST8 write side: one stats patch per (device, micro-batch), the
    * amortized Spark form of the reference's per-message DB counter
    * updates (impl.ex:640-674) — what makes a cold restart bootstrap
    * from [[graft.storage.AstarteStore.devicesSnapshot]] exact rather
    * than only as-of the last disconnect.
    */
  def statsFlush(
      state: DeviceSessionState, realm: String, deviceId: String,
      receptionMs: Long, submillis: Int): EffectRow =
    EffectRow.blank("device_update", realm, deviceId).copy(
      receptionMs = receptionMs, submillis = submillis,
      detail = s"{${statsJson(state)}}")

  private def messageBytes(env: Envelope): Int =
    (if (env.payload == null) 0 else env.payload.length) +
      (if (env.iface == null) 0 else env.iface.length) +
      (if (env.path == null) 0 else env.path.length)

  /** A1: totals bump on every COUNTED message including errored ones —
    * data, introspection, and non-emptyCache control; connection and
    * disconnection are lifecycle-only in the reference (no update_stats
    * in impl.ex:89-168), matching the simple-flow golden 45013.
    */
  private def bumpStats(
      state: DeviceSessionState, env: Envelope): DeviceSessionState =
    state.copy(
      totalReceivedMsgs = state.totalReceivedMsgs + 1,
      totalReceivedBytes = state.totalReceivedBytes + messageBytes(env))

  /** A2: per-interface exchanged counters, keyed "name:major" — the
    * reference accounts per `{interface, major}` tuple
    * (impl.ex:640-674), so counters for v0 and v1 of the same
    * interface stay separate across a major upgrade. Bumped only on
    * successfully handled data messages: every error branch calls
    * update_stats with major=nil, which skips the interface bump
    * (impl.ex:462-523, 634-638).
    */
  private def bumpIfaceStats(
      state: DeviceSessionState, env: Envelope, major: Int): DeviceSessionState = {
    if (env.iface == null) return state
    val bytes = messageBytes(env)
    val key = s"${env.iface}:$major"
    state.copy(
      interfaceMsgs = state.interfaceMsgs + (key -> (state.interfaceMsgs.getOrElse(key, 0L) + 1)),
      interfaceBytes = state.interfaceBytes + (key -> (state.interfaceBytes.getOrElse(key, 0L) + bytes)))
  }

  /** ST6 clean-session escalation: flag + forced disconnect command +
    * error effect; the message itself is discarded.
    */
  private def askCleanSession(
      state: DeviceSessionState, env: Envelope, receptionMs: Long,
      reason: String, submillis: Int = -1): (DeviceSessionState, Seq[EffectRow]) = {
    val err = error(env, receptionMs, reason)
    val flag = EffectRow.blank("device_update", env.realm, env.deviceId).copy(
      receptionMs = receptionMs, submillis = submillis,
      detail = """{"pending_empty_cache":true}""")
    val disconnect = EffectRow.blank("command", env.realm, env.deviceId).copy(
      receptionMs = receptionMs, detail = "disconnect")
    (state.copy(pendingEmptyCache = true), Seq(err, flag, disconnect))
  }

  private def error(env: Envelope, receptionMs: Long, reason: String): EffectRow =
    EffectRow.blank("error", env.realm, env.deviceId).copy(
      iface = env.iface, path = env.path,
      receptionMs = receptionMs, eventType = "device_error", detail = reason)
}

/** F7 type validation (reference impl.ex:568-621). */
object TypeChecker {
  import AstarteValueType._

  def validates(value: Any, mapping: Mapping, iface: InterfaceDescriptor,
      registry: Registry): Boolean =
    if (iface.aggregation == Aggregation.Object) value match {
      case m: collection.Map[_, _] =>
        val leaves = registry.mappingsOf(iface.name)
          .map(mm => mm.endpoint.substring(mm.endpoint.lastIndexOf('/') + 1) -> mm)
          .toMap
        // an EMPTY object is valid (the reference lands an all-NULL
        // row for `{}` and counts it, simple-flow payload4)
        m.forall {
          case (k, v) => leaves.get(k.toString) match {
            case Some(leafMapping) => scalarOk(v, leafMapping.valueType)
            case None => false // unknown key rejected
          }
        }
      case _ => false
    }
    else scalarOk(value, mapping.valueType)

  private def scalarOk(value: Any, t: AstarteValueType): Boolean = (t, value) match {
    case (_, null) => false
    case (ADouble, _: Double | _: Int | _: Long) => true
    case (AInteger, _: Int) => true
    case (ALongInteger, _: Long | _: Int) => true
    case (AString, _: String) => true
    case (ABoolean, _: Boolean) => true
    case (ABinaryBlob, _: BsonBinary) => true
    case (ABinaryBlob, _: Array[Byte]) => true
    case (ADateTime, _: Instant) => true
    case (arr, xs: Seq[_]) if arr.isArray =>
      AstarteValueType.elementOf(arr).exists(el => xs.forall(x => scalarOk(x, el)))
    case (_: AstarteValueType, m: ListMap[_, _]) => false // structs rejected
    case _ => false
  }
}
