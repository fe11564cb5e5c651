package graft.events

/** Typed output events of the engine — the Spark-side re-expression of
  * the reference's protobuf SimpleEvent family (SURVEY §1.1 "Event";
  * reference `triggers_handler.ex:35-375`, 9 fired variants).
  *
  * Each event is produced inside the per-device state machine and
  * emitted on the events side-output; a sink (Kafka/AMQP/memory)
  * serializes it with routing headers.
  */
sealed trait SimpleEvent {
  def realm: String
  def deviceId: String
  /** AMQP-style routing metadata of the matched trigger target. */
  def target: String
  def timestampMs: Long
}

final case class DeviceConnected(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    deviceIpAddress: String) extends SimpleEvent

final case class DeviceDisconnected(
    realm: String, deviceId: String, target: String, timestampMs: Long)
  extends SimpleEvent

final case class IncomingData(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    interface: String, path: String, bsonValue: Array[Byte]) extends SimpleEvent

final case class ValueChange(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    interface: String, path: String,
    oldBsonValue: Array[Byte], newBsonValue: Array[Byte]) extends SimpleEvent

final case class ValueChangeApplied(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    interface: String, path: String,
    oldBsonValue: Array[Byte], newBsonValue: Array[Byte]) extends SimpleEvent

final case class PathCreated(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    interface: String, path: String, bsonValue: Array[Byte]) extends SimpleEvent

final case class PathRemoved(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    interface: String, path: String) extends SimpleEvent

final case class ValueStored(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    interface: String, path: String, bsonValue: Array[Byte]) extends SimpleEvent

final case class IncomingIntrospection(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    introspection: String) extends SimpleEvent

final case class InterfaceAdded(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    interface: String, majorVersion: Int, minorVersion: Int) extends SimpleEvent

final case class InterfaceRemoved(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    interface: String, majorVersion: Int) extends SimpleEvent

final case class InterfaceMinorUpdated(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    interface: String, majorVersion: Int,
    oldMinorVersion: Int, newMinorVersion: Int) extends SimpleEvent

final case class DeviceError(
    realm: String, deviceId: String, target: String, timestampMs: Long,
    errorName: String, metadata: Map[String, String]) extends SimpleEvent
