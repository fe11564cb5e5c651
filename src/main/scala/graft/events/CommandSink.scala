package graft.events

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.streaming.EffectRow

/** The MQTT control-plane RPC wire (S8): the reference sends commands
  * to the broker plugin as a protobuf `Call` with a publish/disconnect
  * oneof (`rpc/vmq_plugin.ex:40-65`) — Publish carries topic tokens +
  * payload + qos, Disconnect carries client id + discard flag. Same
  * shape here over [[ProtoWire]]:
  *
  * Call: oneof call { 1 publish, 2 disconnect }
  * Publish:    1 topic_tokens (repeated string), 2 payload (bytes),
  *             3 qos (int32)
  * Disconnect: 1 client_id (string), 2 discard_state (bool)
  */
object VmqRpc {
  import ProtoWire._

  sealed trait RpcCall
  final case class Publish(topicTokens: Seq[String], payload: Array[Byte], qos: Int)
    extends RpcCall
  final case class Disconnect(clientId: String, discardState: Boolean)
    extends RpcCall

  def encode(call: RpcCall): Array[Byte] = {
    val w = new Writer
    call match {
      case Publish(tokens, payload, qos) =>
        val sub = new Writer
        tokens.foreach(t => sub.string(1, t))
        sub.bytes(2, payload)
        sub.int32(3, qos)
        w.message(1, sub.result())
      case Disconnect(clientId, discard) =>
        val sub = new Writer
        sub.string(1, clientId)
        sub.int64(2, if (discard) 1L else 0L)
        w.message(2, sub.result())
    }
    w.result()
  }

  def decode(bytes: Array[Byte]): RpcCall = {
    val f = read(bytes)
    if (f.blobs.contains(1)) {
      val p = read(f.blob(1))
      Publish(p.messages(1).map(new String(_, java.nio.charset.StandardCharsets.UTF_8)),
        Option(p.blob(2)).getOrElse(Array.emptyByteArray), p.int(3))
    } else if (f.blobs.contains(2)) {
      val d = read(f.blob(2))
      Disconnect(d.str(1), d.long(2) != 0L)
    } else throw new IllegalArgumentException("no call oneof field set")
  }
}

/** Command side-output sink (S8): the engine's `command` effect rows
  * (forced disconnects, server-property resends, consumer-properties
  * digests) serialized to the RPC wire and appended to a durable
  * topic — swap the parquet write for an AMQP producer to talk to a
  * real broker plugin without touching the encoding.
  *
  * Control publishes go out at qos 2 (guaranteed, like the
  * reference's control-plane traffic); data resends at qos 0.
  */
final class CommandSink(val path: String) {

  def publish(effects: Dataset[EffectRow]): Unit = {
    import effects.sparkSession.implicits._
    val commands = effects.filter(_.kind == "command")
    if (commands.isEmpty) return
    commands
      .map { e =>
        val call: VmqRpc.RpcCall =
          if (e.detail == "disconnect")
            VmqRpc.Disconnect(s"${e.realm}/${e.deviceId}", discardState = true)
          else {
            val qos = if (Option(e.path).exists(_.startsWith("/control/"))) 2 else 0
            // topic = realm/device[/interface]/path-tokens (the
            // reference's '/'-joined topic split back into tokens)
            val tail = Option(e.iface).toSeq ++
              Option(e.path).getOrElse("").split("/").filter(_.nonEmpty).toSeq
            VmqRpc.Publish(e.realm +: e.deviceId +: tail,
              Option(e.valueBson).getOrElse(Array.emptyByteArray), qos)
          }
        CommandWireRow(e.realm, e.deviceId, e.detail, e.path,
          e.receptionMs, VmqRpc.encode(call))
      }
      .toDF()
      .write.mode("append").parquet(path)
  }

  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

final case class CommandWireRow(
    realm: String,
    device_id: String,
    command: String,
    path: String,
    timestamp_ms: Long,
    wire: Array[Byte])
