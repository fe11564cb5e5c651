package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Broker-wire envelope source (S1/S2): the reference consumes device
  * messages from sharded AMQP queues, routing on `x_astarte_*`
  * headers — msg_type selects the handler, realm/device_id/remote_ip/
  * interface/path/control_path carry the addressing, and messages
  * with missing required headers are acked and DISCARDED
  * (`amqp_data_consumer.ex:109-270`).
  *
  * Spark translation: any header-carrying record stream with the
  * Kafka source schema (`key binary, value binary, topic string,
  * partition int, offset long, timestamp timestamp, timestampType
  * int, headers array<struct<key string, value binary>>`) decodes to
  * `Dataset[Envelope]` with one declarative select — source
  * partitions map to the reference's queue shards, and per-device
  * FIFO is restored downstream by the state machine's
  * (reception, offset) sort, so shard rebalancing can't reorder a
  * device. The decode is pure Column expressions (no UDF): it stays
  * inside whole-stage codegen on the ingest hot path.
  */
object WireSource {

  /** Kafka readStream glue. Requires the spark-sql-kafka connector on
    * the classpath at runtime (not bundled in this environment — the
    * decode path below is the tested part and is connector-agnostic).
    */
  def kafkaSource(
      spark: SparkSession, bootstrapServers: String, topic: String,
      maxOffsetsPerTrigger: Long = 100000L): Dataset[Envelope] =
    decodeEnvelopes(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("includeHeaders", "true")
        // bounds a micro-batch (and so the per-device in-memory sort
        // slice) — the Spark analogue of AMQP prefetch_count
        .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
        .load())

  /** The in-repo broker client path (S1 with a REAL network client):
    * `format("graft-broker")` connects [[graft.sources.BrokerClient]]
    * partition readers to a [[graft.sources.MessageBroker]] over TCP —
    * sharded FIFO queues, per-shard offset cursors in the checkpoint,
    * live shard discovery — and decodes through the SAME pure-Column
    * path as [[kafkaSource]]. This is the executable stand-in for the
    * AMQP front door while no broker client jar ships; the managed-
    * broker deployment swaps only the `format(...)` line.
    */
  def brokerSource(
      spark: SparkSession, host: String, port: Int,
      maxRecordsPerTrigger: Long = 100000L): Dataset[Envelope] =
    decodeEnvelopes(
      spark.readStream
        .format("graft-broker")
        .option("host", host)
        .option("port", port.toString)
        .option("maxRecordsPerTrigger", maxRecordsPerTrigger.toString)
        .load())

  /** WireRecord-schema file spool as a REAL readStream source: a
    * broker bridge (AMQP consumer, Kafka Connect sink, …) lands
    * batches of raw records — key/value/headers untouched — as
    * parquet files in `dir`; Spark's file source provides offsets +
    * checkpointing and this decodes through the SAME pure-Column path
    * as [[kafkaSource]]. `maxFilesPerTrigger` bounds a micro-batch
    * (the prefetch analogue, like kafkaSource's maxOffsetsPerTrigger).
    * This is the connector-less deployment shape — swapping in the
    * Kafka connector jar changes only the `format("kafka")` line.
    */
  def fileWireSource(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 100): Dataset[Envelope] =
    decodeEnvelopes(
      spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[WireRecord].schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
        .parquet(dir))

  /** Header-driven decode of broker records to typed envelopes
    * (batch or streaming). Records failing the reference's required-
    * header checks are discarded, exactly like handle_invalid_msg.
    */
  def decodeEnvelopes(records: DataFrame): Dataset[Envelope] = {
    import records.sparkSession.implicits._
    // per-header lookup via filter + get, NOT map_from_entries: a
    // duplicate header key would make map construction throw (default
    // dedup policy) and one malformed record must never kill the
    // stream — the reference discards invalid messages. First
    // occurrence wins; get() is null on no match.
    def h(name: String) = expr(
      s"CAST(get(filter(headers, x -> x.key = 'x_astarte_$name'), 0).value AS STRING)")
    records
      .withColumn("mt", h("msg_type"))
      .withColumn("ph", h("path"))
      .withColumn("cph", h("control_path"))
      .select(
        h("realm").as("realm"),
        h("device_id").as("deviceId"),
        col("mt").as("msgType"),
        h("interface").as("iface"),
        // each msg type reads ITS OWN path header — a data record
        // carrying only a control path (or vice versa) must fail the
        // required-header guard, not borrow the wrong one
        when(col("mt") === "control", col("cph")).otherwise(col("ph")).as("path"),
        col("value").as("payload"),
        (unix_micros(col("timestamp")) * 10).as("receptionDecimicros"),
        h("remote_ip").as("ipAddress"),
        col("offset").as("offset"))
      .filter(
        col("msgType").isNotNull && col("realm").isNotNull &&
        col("deviceId").isNotNull &&
        // connection needs the remote ip; data needs interface+path;
        // control needs its control path (reference handle_consume
        // `with` guards)
        (col("msgType") =!= "connection" || col("ipAddress").isNotNull) &&
        (col("msgType") =!= "data" ||
          (col("iface").isNotNull && col("path").isNotNull)) &&
        (col("msgType") =!= "control" || col("path").isNotNull))
      .as[Envelope]
  }
}

/** The Kafka record shape, for tests and non-Kafka bridges that want
  * to feed [[WireSource.decodeEnvelopes]] (e.g. an AMQP consumer
  * landing records into files/memory with the same schema).
  */
final case class WireRecord(
    key: Array[Byte],
    value: Array[Byte],
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: java.sql.Timestamp,
    timestampType: Int,
    headers: Array[WireHeader])

final case class WireHeader(key: String, value: Array[Byte])
