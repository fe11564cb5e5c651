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
    * trigger carries a comma-joined target list).
    */
  def publish(effects: Dataset[EffectRow]): Unit = {
    val events = effects.toDF().filter(col("kind") === "event")
    if (events.isEmpty) return
    events
      .withColumn("target", explode(split(col("target"), ",")))
      .select(
        col("realm"),
        col("deviceId").as("device_id"),
        col("eventType").as("event_type"),
        col("target").as("routing_key"),
        col("iface"), col("path"),
        col("valueBson").as("bson_value"),
        col("prevBson").as("bson_prev_value"),
        col("receptionMs").as("timestamp_ms"),
        col("detail"))
      .write.mode("append").partitionBy("event_type").parquet(path)
  }

  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}
