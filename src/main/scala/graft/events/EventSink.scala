package graft.events

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EffectRow

/** Events sink (SURVEY §2.1 S7): serializes the engine's event
  * side-output with the reference's routing metadata shape — one row
  * per (event, target) with routing key and header columns — to a
  * durable parquet topic (standing in for the AMQP events exchange;
  * swap `write` for a Kafka/AMQP producer in `foreachBatch` without
  * touching the routing logic).
  *
  * Delivery semantics: blind append keyed by (device, reception,
  * eventType, target) — idempotent under task retry, the Spark
  * replacement for the reference's infinite-retry publish
  * (`triggers_handler.ex:404-459`).
  */
final class EventSink(val path: String) {

  /** Route events: one output row per target (a merged congruent
    * trigger carries a comma-joined target list), each carrying the
    * SimpleEvent protobuf wire bytes and the five x_astarte_* routing
    * headers (S7 parity with `triggers_handler.ex:377-459`). A typed
    * map is fine here: this is the sink stage, not a codegen'd scan
    * pipeline.
    */
  def publish(effects: Dataset[EffectRow]): Unit = {
    import effects.sparkSession.implicits._
    val events = effects.filter(_.kind == "event")
    if (events.isEmpty) return
    events
      .flatMap { e =>
        Option(e.target).getOrElse("").split(",").iterator.map { t =>
          val ev = SimpleEventCodec.fromEffectRow(e.eventType, e.realm,
            e.deviceId, t, e.iface, e.major, e.path, e.valueBson, e.prevBson,
            e.receptionMs, e.detail)
          val sid = SimpleEventCodec.triggerId(t + "|" + e.eventType)
          val pid = SimpleEventCodec.triggerId(t)
          EventWireRow(e.realm, e.deviceId, e.eventType, t, e.iface, e.path,
            e.valueBson, e.prevBson, e.receptionMs, e.detail,
            SimpleEventCodec.encode(ev, sid, pid),
            SimpleEventCodec.headers(ev, sid, pid).toMap)
        }
      }
      .toDF()
      .write.mode("append").partitionBy("event_type").parquet(path)
  }

  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** One routed sink row: event columns + wire bytes + routing headers. */
final case class EventWireRow(
    realm: String,
    device_id: String,
    event_type: String,
    routing_key: String,
    iface: String,
    path: String,
    bson_value: Array[Byte],
    bson_prev_value: Array[Byte],
    timestamp_ms: Long,
    detail: String,
    wire: Array[Byte],
    headers: Map[String, String])
