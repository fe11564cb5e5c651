package graft.triggers

import graft.events.ProtoWire
import graft.events.ProtoWire.{Fields, Writer}
import graft.streaming.{DeviceStateMachine, Registry}

/** RPC control-plane wire (S9 completion): the protobuf `Call` →
  * `InstallVolatileTrigger` / `DeleteVolatileTrigger` surface, decoded
  * over [[ProtoWire]] and answered synchronously with a `Reply`
  * (GenericOk / GenericError) — mirroring the reference's handler
  * (`rpc/handler.ex:35-100`) and install-time validation
  * (`impl.ex:946-1058`; errors asserted in
  * `data_updater_test.exs:353-409`).
  *
  * Field numbering is this library's stable numbering (the reference's
  * .proto files live in a separate astarte_rpc package, not in the
  * reference repo), documented here:
  *
  * Call — oneof call:
  *   1 install_volatile_trigger   2 delete_volatile_trigger
  * InstallVolatileTrigger:
  *   1 realm_name  2 device_id  3 parent_trigger_id
  *   4 simple_trigger_id  5 simple_trigger (SimpleTrigger)
  *   6 trigger_target (TriggerTarget)
  * DeleteVolatileTrigger:
  *   1 realm_name  2 device_id  3 trigger_id
  * SimpleTrigger — oneof trigger:
  *   1 data_trigger{1 interface_name ("*" = any), 2 interface_major,
  *                  3 type, 4 match_path, 5 value_match_operator,
  *                  6 known_value (KnownValue)}
  *   2 device_trigger{1 type, 2 device_id ("" = any)}
  *   3 introspection_trigger{1 type, 2 interface_name, 3 interface_major}
  * TriggerTarget:
  *   1 routing_key (repeated)
  * KnownValue — oneof value (ALL length-delimited, forced presence —
  * a proto3 zero default must not vanish):
  *   1 int64_be (8 bytes)  2 double_bits (8 bytes, IEEE-754 BE)
  *   3 string  4 bool (1 byte)  5 bytes
  * Reply:
  *   1 generic_ok_reply{}  3 error (bool)
  *   2 generic_error_reply{1 error_name, 2 user_readable_message,
  *                         3 user_readable_error_name, 4 error_data}
  *
  * Enum codes (proto3 zero-default; 0 is never a valid type):
  *   DataTriggerType: 1 INCOMING_DATA 2 VALUE_CHANGE
  *     3 VALUE_CHANGE_APPLIED 4 PATH_CREATED 5 PATH_REMOVED
  *     6 VALUE_STORED
  *   DeviceTriggerType: 1 CONNECTED 2 DISCONNECTED
  *     3 EMPTY_CACHE_RECEIVED 4 ERROR
  *   IntrospectionTriggerType: 1 INCOMING_INTROSPECTION
  *     2 INTERFACE_ADDED 3 INTERFACE_REMOVED 4 INTERFACE_MINOR_UPDATED
  *   MatchOperator: 0 ANY 1 EQ 2 NEQ 3 GT 4 GTE 5 LT 6 LTE
  *     7 CONTAINS 8 NOT_CONTAINS
  */
object RpcWire {
  import TriggerEventType._

  // --- enum maps ----------------------------------------------------------

  private val dataTypes: Seq[(Int, TriggerEventType)] = Seq(
    1 -> IncomingData, 2 -> ValueChange, 3 -> ValueChangeApplied,
    4 -> PathCreated, 5 -> PathRemoved, 6 -> ValueStored)
  private val deviceTypes: Seq[(Int, TriggerEventType)] = Seq(
    1 -> DeviceConnected, 2 -> DeviceDisconnected,
    3 -> EmptyCacheReceived, 4 -> DeviceError)
  private val introTypes: Seq[(Int, TriggerEventType)] = Seq(
    1 -> IncomingIntrospection, 2 -> InterfaceAdded,
    3 -> InterfaceRemoved, 4 -> InterfaceMinorUpdated)

  private val dataCode = dataTypes.map(_.swap).toMap
  private val deviceCode = deviceTypes.map(_.swap).toMap
  private val introCode = introTypes.map(_.swap).toMap
  private val dataType = dataTypes.toMap
  private val deviceType = deviceTypes.toMap
  private val introType = introTypes.toMap

  private val opCodes: Seq[(Int, MatchOperator)] = Seq(
    0 -> MatchOperator.Any, 1 -> MatchOperator.EqualTo,
    2 -> MatchOperator.NotEqualTo, 3 -> MatchOperator.GreaterThan,
    4 -> MatchOperator.GreaterOrEqualTo, 5 -> MatchOperator.LessThan,
    6 -> MatchOperator.LessOrEqualTo, 7 -> MatchOperator.Contains,
    8 -> MatchOperator.NotContains)
  private val opCode = opCodes.map(_.swap).toMap
  private val opFromCode = opCodes.toMap

  private def sub(build: Writer => Unit): Array[Byte] = {
    val w = new Writer; build(w); w.result()
  }

  // --- known value --------------------------------------------------------

  // Every variant is length-delimited with forced presence (message/
  // fixed blob), NEVER a bare varint or skip-empty bytes field:
  // proto3 zero-default skipping would make knownValue 0, "", false,
  // or empty-bytes decode as "no known value" and a trigger like
  // "fire when value == 0" would never match.
  private def encodeKnown(v: Any): Array[Byte] = sub { w =>
    def be8(l: Long) = java.nio.ByteBuffer.allocate(8).putLong(l).array()
    v match {
      case null => ()
      case b: Boolean => w.bytes(4, Array[Byte](if (b) 1 else 0))
      case i: Int => w.message(1, be8(i.toLong))
      case l: Long => w.message(1, be8(l))
      case d: Double =>
        w.bytes(2, java.nio.ByteBuffer.allocate(8).putDouble(d).array())
      case f: Float =>
        w.bytes(2, java.nio.ByteBuffer.allocate(8).putDouble(f.toDouble).array())
      case s: String => w.message(3, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case b: Array[Byte] => w.message(5, b)
      case other =>
        w.message(3, other.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  private def decodeKnown(bytes: Array[Byte]): Any = {
    val f = ProtoWire.read(bytes)
    if (f.blobs.contains(1)) java.nio.ByteBuffer.wrap(f.blob(1)).getLong
    else if (f.blobs.contains(2)) java.nio.ByteBuffer.wrap(f.blob(2)).getDouble
    else if (f.blobs.contains(4)) f.blob(4)(0) == 1.toByte
    else if (f.blobs.contains(3)) f.str(3)
    else if (f.blobs.contains(5)) f.blob(5)
    else null
  }

  // --- SimpleTrigger ------------------------------------------------------

  private[triggers] def encodeSimpleTrigger(t: Trigger): Array[Byte] = sub { w =>
    t.eventType match {
      case et if dataCode.contains(et) =>
        val (ifaceName, major) = t.scope match {
          case TriggerScope.OnInterface(n, m) => (n, m)
          case _ => ("*", 0)
        }
        w.message(1, sub { d =>
          d.string(1, ifaceName)
          d.int32(2, major)
          d.int32(3, dataCode(et))
          t.pathPattern.foreach(d.string(4, _))
          d.int32(5, opCode(t.valueOp))
          if (t.knownValue != null) d.message(6, encodeKnown(t.knownValue))
        })
      case et if deviceCode.contains(et) =>
        val dev = t.scope match {
          case TriggerScope.OnDevice(id) => id
          case _ => ""
        }
        w.message(2, sub { d => d.int32(1, deviceCode(et)); d.string(2, dev) })
      case et =>
        val (ifaceName, major) = t.scope match {
          case TriggerScope.OnInterface(n, m) => (n, m)
          case _ => ("", 0)
        }
        w.message(3, sub { d =>
          d.int32(1, introCode(et)); d.string(2, ifaceName); d.int32(3, major)
        })
    }
  }

  private[triggers] def decodeSimpleTrigger(
      bytes: Array[Byte], triggerId: String, targets: List[String]): Trigger = {
    val f = ProtoWire.read(bytes)
    if (f.blobs.contains(1)) {
      val d = ProtoWire.read(f.blob(1))
      val scope =
        if (d.str(1) == "*") TriggerScope.AnyInterface
        else TriggerScope.OnInterface(d.str(1), d.int(2))
      Trigger(triggerId, dataType(d.int(3)), scope,
        Option(d.str(4)).filter(_.nonEmpty),
        opFromCode(d.int(5)),
        Option(d.blob(6)).map(decodeKnown).orNull,
        targets)
    } else if (f.blobs.contains(2)) {
      val d = ProtoWire.read(f.blob(2))
      val scope =
        if (d.str(2).isEmpty) TriggerScope.AnyDevice
        else TriggerScope.OnDevice(d.str(2))
      Trigger(triggerId, deviceType(d.int(1)), scope, None,
        MatchOperator.Any, null, targets)
    } else if (f.blobs.contains(3)) {
      val d = ProtoWire.read(f.blob(3))
      val scope =
        if (d.str(2).isEmpty) TriggerScope.AnyInterface
        else TriggerScope.OnInterface(d.str(2), d.int(3))
      Trigger(triggerId, introType(d.int(1)), scope, None,
        MatchOperator.Any, null, targets)
    } else throw new IllegalArgumentException("SimpleTrigger oneof not set")
  }

  // --- Call encode (client side / test fixtures) --------------------------

  def encodeInstall(
      realm: String, deviceId: String, parentTriggerId: String,
      trigger: Trigger): Array[Byte] = sub { w =>
    w.message(1, sub { m =>
      m.string(1, realm)
      m.string(2, deviceId)
      m.string(3, parentTriggerId)
      m.string(4, trigger.triggerId)
      m.message(5, encodeSimpleTrigger(trigger))
      m.message(6, sub { t => trigger.targets.foreach(t.string(1, _)) })
    })
  }

  def encodeDelete(realm: String, deviceId: String, triggerId: String): Array[Byte] =
    sub(_.message(2, sub { m =>
      m.string(1, realm); m.string(2, deviceId); m.string(3, triggerId)
    }))

  // --- Reply --------------------------------------------------------------

  def okReply: Array[Byte] = sub(_.message(1, Array.emptyByteArray))

  def errorReply(errorName: String, message: String = null): Array[Byte] =
    sub { w =>
      w.message(2, sub { e =>
        e.string(1, errorName)
        if (message != null) e.string(2, message)
      })
      w.int64(3, 1L) // error = true
    }

  /** Decoded reply: Right(()) on ok, Left(error_name) on error; bytes
    * that do not parse as a reply at all — this is a WIRE surface —
    * come back as Left("malformed_reply"), never an exception.
    */
  def decodeReply(bytes: Array[Byte]): Either[String, Unit] =
    try {
      val f = ProtoWire.read(bytes)
      if (f.blobs.contains(2)) Left(ProtoWire.read(f.blob(2)).str(1))
      else if (f.blobs.contains(1)) Right(())
      else Left("empty_reply")
    } catch {
      case scala.util.control.NonFatal(_) => Left("malformed_reply")
    }

  private def errorName(e: VolatileTriggers.InstallError): String = e match {
    case VolatileTriggers.InvalidMatchPath => "invalid_match_path"
    case VolatileTriggers.UnsupportedInterfaceAggregation =>
      "unsupported_interface_aggregation"
    case VolatileTriggers.InterfaceNotFound => "interface_not_found"
  }

  // --- server side --------------------------------------------------------

  /** Per-(realm, device) installed volatile triggers — the reference
    * keys volatile triggers in the device's session state, so an
    * install for device A must never fire for device B.
    */
  type Installed = Map[(String, String), Seq[Trigger]]

  /** Decode + dispatch one Call against the per-device installed map.
    * Pure: returns the new map and the encoded Reply. Install
    * validates synchronously ([[VolatileTriggers.validate]]) and
    * rolls back on error — the reference's "state rollback here"
    * branches (`impl.ex:991-1046`); delete is idempotent and always
    * acks, like `handle_delete_volatile_trigger`. ANY decode failure
    * (truncated varint, overrunning length, bad enum code) yields an
    * undecodable_call error reply — a malformed payload must never
    * crash the RPC consumer.
    */
  def handleRpc(
      payload: Array[Byte],
      installed: Installed,
      registry: Registry): (Installed, Array[Byte]) =
    try {
      val f = ProtoWire.read(payload)
      if (f.blobs.contains(1)) {
        val m = ProtoWire.read(f.blob(1))
        val key = (m.str(1), m.str(2))
        val targets = Option(m.blob(6))
          .map(b => ProtoWire.read(b).blobs.getOrElse(1, Nil)
            .map(new String(_, java.nio.charset.StandardCharsets.UTF_8)).toList)
          .getOrElse(Nil)
        val t = decodeSimpleTrigger(m.blob(5), m.str(4), targets)
        VolatileTriggers.validate(t, registry) match {
          case Right(valid) =>
            (installed.updated(key, installed.getOrElse(key, Nil) :+ valid), okReply)
          case Left(err) => (installed, errorReply(errorName(err)))
        }
      } else if (f.blobs.contains(2)) {
        val m = ProtoWire.read(f.blob(2))
        val key = (m.str(1), m.str(2))
        (installed.updated(key,
          VolatileTriggers.deleteTarget(installed.getOrElse(key, Nil), m.str(3))),
          okReply)
      } else (installed, errorReply("empty_call"))
    } catch {
      // IllegalArgument (overrun), IndexOutOfBounds (truncated
      // varint), NoSuchElement (unknown enum code), ...
      case e: RuntimeException =>
        (installed, errorReply("undecodable_call", e.getMessage))
    }
}

/** The running control plane: a [[DeviceStateMachine.RegistryProvider]]
  * that overlays RPC-installed volatile triggers onto a base registry,
  * scoped per (realm, device) like the reference's session state —
  * `current(realm, deviceId)` sees only that device's installs, and
  * the global `current()` view carries none. `handleRpc` is the
  * broker-facing entry point — synchronous reply, installs visible to
  * in-flight queries on the next state-function invocation (S9 + ST3).
  */
final class RpcControlPlane(base: DeviceStateMachine.RegistryProvider)
    extends DeviceStateMachine.RegistryProvider {

  @volatile private var installed: RpcWire.Installed = Map.empty

  def installedTriggers(realm: String, deviceId: String): Seq[Trigger] =
    installed.getOrElse((realm, deviceId), Nil)

  def handleRpc(payload: Array[Byte]): Array[Byte] = synchronized {
    val (next, reply) = RpcWire.handleRpc(payload, installed, base.current())
    installed = next
    reply
  }

  override def current(): Registry = base.current()

  override def current(realm: String, deviceId: String): Registry = {
    val r = base.current()
    installed.getOrElse((realm, deviceId), Nil) match {
      case Nil => r
      case ts => r.copy(triggers = VolatileTriggers.overlay(r.triggers, ts))
    }
  }
}
