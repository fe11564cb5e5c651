package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `format("graft-broker")` — a DataSource V2 micro-batch streaming
  * source whose partition readers are REAL network broker clients
  * ([[BrokerClient]] over TCP), one per queue shard: the Spark shape
  * of the reference's sharded AMQP consumers
  * (`amqp_data_consumer/supervisor.ex:31-49` — one consumer per queue
  * shard, FIFO within a shard).
  *
  * Scale/semantics design, mirroring the Kafka connector:
  *   - offsets are a per-shard cursor map, serialized into the query
  *     checkpoint — exactly-once replay after restart comes from the
  *     (start, end] offset ranges being deterministic, not from the
  *     broker remembering consumers;
  *   - shard discovery happens at every `latestOffset`, so a shard
  *     added mid-stream (a rebalance/scale-out) is picked up on the
  *     next micro-batch with its cursor starting at 0;
  *   - `maxRecordsPerTrigger` bounds a micro-batch through Spark's
  *     admission control (`SupportsAdmissionControl`), split evenly
  *     across shards — the AMQP prefetch_count analogue, keeping the
  *     per-device in-memory sort slice bounded downstream;
  *   - one input partition per shard: Spark schedules one reader task
  *     per shard, preserving shard FIFO within a micro-batch, and
  *     per-device total order is restored downstream by the state
  *     machine's (reception, offset) sort.
  *
  * Rows come out in the Kafka source schema
  * ([[graft.streaming.WireRecord]]), so
  * [[graft.streaming.WireSource.decodeEnvelopes]] consumes this
  * source and the Kafka source interchangeably.
  */
class BrokerSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-broker"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BrokerSourceProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // getTable receives the CASE-SENSITIVE option map — normalize, or
    // a camelCase maxRecordsPerTrigger silently reads as "no cap"
    val opts = new CaseInsensitiveStringMap(properties)
    val host = Option(opts.get("host")).getOrElse("localhost")
    val port = Option(opts.get("port")).map(_.toInt).getOrElse(
      throw new IllegalArgumentException("graft-broker: option 'port' is required"))
    val maxPerTrigger = Option(opts.get("maxRecordsPerTrigger")).map(_.toLong)
    // reconnect-with-backoff knobs — the reference's connection
    // manager redials its broker on a flat 10 s backoff
    // (`connection_manager.ex` @connection_backoff 10000); default
    // here is 1 s × up to 10 attempts, tunable per query
    val backoffMs = Option(opts.get("reconnectBackoffMs")).map(_.toLong).getOrElse(1000L)
    val maxReconnects = Option(opts.get("maxReconnects")).map(_.toInt).getOrElse(10)
    new BrokerTable(host, port, maxPerTrigger, backoffMs, maxReconnects)
  }
}

object BrokerSourceProvider {
  /** The Kafka record shape — byte-compatible with WireSource's
    * expectations (key, value, topic, partition, offset, timestamp,
    * timestampType, headers).
    */
  val schema: StructType =
    org.apache.spark.sql.Encoders.product[graft.streaming.WireRecord].schema
}

private[sources] class BrokerTable(
    host: String, port: Int, maxPerTrigger: Option[Long],
    backoffMs: Long = 1000L, maxReconnects: Int = 10) extends Table with SupportsRead {
  override def name(): String = s"graft-broker://$host:$port"
  override def schema(): StructType = BrokerSourceProvider.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BrokerSourceProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new BrokerMicroBatchStream(host, port, maxPerTrigger, backoffMs, maxReconnects)
        // batch read = the backfill shape: a one-shot snapshot of
        // every shard from its TRUNCATION FLOOR to the end observed
        // at plan time. Planning from 0 would reach below the floor
        // on any broker whose stream has committed (ack-truncated)
        // a batch, and fail the vanished-range guard.
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] = {
            val client = new BrokerClient(host, port)
            try {
              val ends = client.endOffsets()
              // bases AFTER ends: the floor only rises, so the fresher
              // snapshot narrows the window a concurrent ack could
              // truncate out from under the read (which would still
              // fail loudly on the reader's vanished-range guard)
              val bases = client.baseOffsets()
              ends.zipWithIndex.collect {
                case (end, shard)
                    if end > bases.lift(shard).getOrElse(0L) =>
                  BrokerInputPartition(host, port, shard,
                    bases.lift(shard).getOrElse(0L), end,
                    backoffMs, maxReconnects): InputPartition
              }.toArray
            } finally client.close()
          }
          override def createReaderFactory(): PartitionReaderFactory =
            new BrokerReaderFactory
        }
      }
    }
}

/** Per-shard end-offset cursor map. JSON form: `{"0":12,"1":40}` —
  * shard id → first offset NOT consumed (exclusive end).
  */
private[sources] final case class BrokerOffset(ends: Map[Int, Long]) extends Offset {
  override def json(): String =
    ends.toSeq.sortBy(_._1)
      .map { case (s, o) => s""""$s":$o""" }
      .mkString("{", ",", "}")
}

private[sources] object BrokerOffset {
  private val entry = """"(\d+)"\s*:\s*(\d+)""".r
  def parse(json: String): BrokerOffset =
    BrokerOffset(entry.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

private[sources] class BrokerMicroBatchStream(
    host: String, port: Int, maxPerTrigger: Option[Long],
    backoffMs: Long = 1000L, maxReconnects: Int = 10)
    extends MicroBatchStream with SupportsAdmissionControl {

  // driver-side control connection (offset discovery only — data
  // moves over the per-partition executor connections); tracked so
  // stop() never DIALS the broker just to hang up. Init and teardown
  // share one lock: an unsynchronized check-then-act here lets a
  // latestOffset racing stop() at query teardown open a second
  // client after close ran and leak its socket
  private var controlOpt: Option[BrokerClient] = None
  private var stopped = false
  private def control: BrokerClient = synchronized {
    if (stopped)
      throw new IllegalStateException("broker stream already stopped")
    controlOpt.getOrElse {
      val c = new BrokerClient(host, port)
      controlOpt = Some(c)
      c
    }
  }

  /** Run a control-plane call, redialing the broker with backoff when
    * the connection drops — the reference's connection-manager
    * behavior (flat backoff, bounded attempts). A stop() racing the
    * backoff surfaces as the control accessor's IllegalStateException,
    * never a redial after teardown.
    */
  private def withControl[A](f: BrokerClient => A): A = {
    var attempt = 0
    while (true) {
      // the redial (inside `control`) must sit in the SAME try as the
      // call: a broker still down mid-backoff throws ConnectException
      // from the socket constructor, and that attempt counts too
      try return f(control)
      catch { case e: java.io.IOException =>
        attempt += 1
        synchronized {
          controlOpt.foreach(x => try x.close() catch { case _: Throwable => () })
          controlOpt = None
        }
        if (attempt > maxReconnects) throw e
        Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def initialOffset(): Offset = BrokerOffset(Map.empty)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[BrokerOffset].ends
    val ends = withControl(_.endOffsets())
    val capped = limit match {
      case r: ReadMaxRows =>
        // split the cap across shards PROPORTIONAL to each shard's
        // backlog (an even split would strand allocation on idle
        // shards while a hot shard starves); every backlogged shard
        // advances at least one record, so the total can overshoot
        // the cap by at most the shard count — the same approximate
        // bounding the Kafka source accepts
        val remaining = ends.zipWithIndex.map { case (end, s) =>
          (s, from.getOrElse(s, 0L), math.max(0L, end - from.getOrElse(s, 0L)))
        }
        val total = remaining.map(_._3).sum
        if (total <= r.maxRows())
          ends.zipWithIndex.map { case (end, s) => s -> end }
        else remaining.map { case (s, lo, rem) =>
          // double arithmetic: maxRows * rem in long overflows once
          // cap × backlog crosses 2^63 and the wrap would silently
          // collapse a hot shard's advance to the 1-record floor
          val share = math.max(if (rem > 0) 1L else 0L,
            (r.maxRows().toDouble * rem / total).toLong)
          s -> (lo + math.min(rem, share))
        }
      case _ =>
        ends.zipWithIndex.map { case (end, s) => s -> end }
    }
    BrokerOffset(capped.toMap)
  }

  override def deserializeOffset(json: String): Offset = BrokerOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[BrokerOffset].ends
    val until = end.asInstanceOf[BrokerOffset].ends
    until.toSeq.sortBy(_._1).flatMap { case (shard, hi) =>
      val lo = from.getOrElse(shard, 0L)
      if (hi > lo) Some(BrokerInputPartition(host, port, shard, lo, hi): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BrokerReaderFactory

  /** Spark calls commit once a micro-batch is durably checkpointed —
    * the reference's ack-after-write (`message_tracker/server.ex:45-88`):
    * acked offsets are truncated broker-side, bounding its memory to
    * the unacked backlog. A restart from the checkpoint resumes AT the
    * ack floor; only a rewind below it (lost checkpoint) can then hit
    * the reader's vanished-range error — loudly, never silently.
    */
  override def commit(end: Offset): Unit =
    end.asInstanceOf[BrokerOffset].ends.toSeq.sorted.foreach {
      case (shard, upTo) => withControl(_.ack(shard, upTo))
    }
  override def stop(): Unit = synchronized {
    stopped = true
    controlOpt.foreach(c => try c.close() catch { case _: Throwable => () })
    controlOpt = None
  }
}

private[sources] final case class BrokerInputPartition(
    host: String, port: Int, shard: Int, from: Long, until: Long,
    backoffMs: Long = 1000L, maxReconnects: Int = 10)
    extends InputPartition

private[sources] class BrokerReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BrokerInputPartition]
    new BrokerPartitionReader(p)
  }
}

/** One shard's (from, until] slice, fetched over a dedicated client
  * connection in bounded chunks — the executor never holds more than
  * a chunk of raw records beyond the row it is emitting.
  */
private[sources] class BrokerPartitionReader(p: BrokerInputPartition)
    extends PartitionReader[InternalRow] {

  private val ChunkSize = 4096
  private var client = new BrokerClient(p.host, p.port)
  private var cursor = p.from
  private var buffer: Iterator[BrokerRecord] = Iterator.empty
  private var current: BrokerRecord = _

  // A dropped data connection redials with backoff before failing the
  // task: the planned (from, until] range is deterministic, so a
  // refetch after reconnect returns identical records — cheaper than
  // burning a Spark task retry on a broker blip.
  private def fetchWithReconnect(from: Long, want: Int): Seq[BrokerRecord] = {
    var attempt = 0
    var needRedial = false
    while (true) {
      try {
        // redial inside the try: a broker still down mid-backoff
        // throws from the socket constructor and counts as an attempt
        if (needRedial) {
          client = new BrokerClient(p.host, p.port)
          needRedial = false
        }
        return client.fetch(p.shard, from, want)
      } catch { case e: java.io.IOException =>
        attempt += 1
        if (attempt > p.maxReconnects) throw e
        try client.close() catch { case _: Throwable => () }
        needRedial = true
        Thread.sleep(p.backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def next(): Boolean = {
    if (!buffer.hasNext && cursor < p.until) {
      val want = math.min(ChunkSize.toLong, p.until - cursor).toInt
      val recs = fetchWithReconnect(cursor, want)
      if (recs.isEmpty)
        throw new java.io.IOException(
          s"broker shard ${p.shard}: offsets [$cursor, ${p.until}) vanished " +
            "(planned range no longer fetchable)")
      cursor = recs.last.offset + 1
      buffer = recs.iterator
    }
    if (buffer.hasNext) { current = buffer.next(); true } else false
  }

  override def get(): InternalRow = {
    val headers = new GenericArrayData(current.headers.map { case (k, v) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), v))
    }.toArray[Any])
    new GenericInternalRow(Array[Any](
      current.key,
      current.value,
      UTF8String.fromString("graft-broker"),
      p.shard,
      current.offset,
      current.tsMs * 1000L, // TimestampType = epoch micros
      0,
      headers))
  }

  override def close(): Unit =
    try client.close() catch { case _: Throwable => () }
}
