package graft.events

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EffectRow

/** Publish-retry parity with the reference's backoff loop
  * (`triggers_handler.ex:404-425`): events go through a pluggable
  * producer that fails transiently; the retry wrapper must deliver
  * every event exactly once, back off exponentially between attempts,
  * and give up (failing the task) only after the attempt bound.
  */
object RetryingProducerSpec {
  // executor-side state: local[N] shares the JVM, so a static map
  // observes sends made inside tasks
  val delivered = new ConcurrentHashMap[String, Integer]()
  val failuresLeft = new ConcurrentHashMap[String, Integer]()
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
  val sleeps = java.util.Collections.synchronizedList(
    new java.util.ArrayList[Long]())

  def reset(): Unit = {
    delivered.clear(); failuresLeft.clear(); attempts.set(0); sleeps.clear()
  }

  /** Fails the first `failuresLeft(key)` sends of each event, then
    * accepts — a broker with transient unavailability.
    */
  final class FlakyProducer extends EventProducer {
    override def send(row: EventWireRow): Unit = {
      val key = row.routing_key + "|" + row.event_type + "|" + row.device_id
      attempts.incrementAndGet()
      val left = failuresLeft.getOrDefault(key, 0)
      if (left > 0) {
        failuresLeft.put(key, left - 1)
        throw new RuntimeException(s"broker unavailable for $key ($left left)")
      }
      delivered.merge(key, 1, (a, b) => a + b)
    }
  }
}

class RetryingProducerSpec extends AnyFunSuite {
  import RetryingProducerSpec._

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def event(dev: String, et: String, target: String): EffectRow =
    EffectRow.blank("event", "realm", dev).copy(
      eventType = et, iface = "com.test.Iface", path = "/p",
      receptionMs = 1521645570595L, target = target)

  private def effects(rows: EffectRow*) = {
    import spark.implicits._
    rows.toDS()
  }

  test("flaky producer: every event delivered exactly once, with backoff") {
    reset()
    failuresLeft.put("t1|device_connected|dev-a", 3)
    failuresLeft.put("t2|incoming_data|dev-b", 1)
    val sink = new EventSink("/tmp/unused-events-topic")
    val retrying = new RetryingProducer(new FlakyProducer(),
      maxAttempts = 5, baseBackoffMs = 10, maxBackoffMs = 80,
      sleeper = ms => sleeps.add(ms), jitter = bound => bound / 2)
    sink.publishTo(effects(
      event("dev-a", "device_connected", "t1"),
      event("dev-b", "incoming_data", "t2"),
      // a merged congruent trigger fans out to both targets
      event("dev-c", "path_removed", "t1,t2")), retrying)

    import scala.jdk.CollectionConverters._
    assert(delivered.asScala.toMap == Map(
      "t1|device_connected|dev-a" -> 1,
      "t2|incoming_data|dev-b" -> 1,
      "t1|path_removed|dev-c" -> 1,
      "t2|path_removed|dev-c" -> 1))
    // 4 deliveries + 4 injected failures
    assert(attempts.get() == 8)
    // dev-a's three failures backed off exponentially: 10, 20, 40ms
    // base → equal-jitter sleep = expo/2 + expo/4
    val devASleeps = sleeps.asScala.toList.sorted.takeRight(3)
    assert(sleeps.size() == 4)
    assert(devASleeps == List(7L, 15L, 30L))
  }

  test("attempt bound: a dead broker fails the task after maxAttempts") {
    reset()
    failuresLeft.put("t1|device_connected|dev-x", 99)
    val sink = new EventSink("/tmp/unused-events-topic")
    val retrying = new RetryingProducer(new FlakyProducer(),
      maxAttempts = 3, baseBackoffMs = 1, maxBackoffMs = 4,
      sleeper = _ => (), jitter = _ => 0)
    val e = intercept[Exception] {
      sink.publishTo(effects(event("dev-x", "device_connected", "t1")), retrying)
    }
    // the producer's failure surfaces through the Spark task
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
    assert(chain.exists(t => Option(t.getMessage).exists(_.contains("broker unavailable"))))
    assert(attempts.get() == 3)
    assert(delivered.isEmpty)
  }
}
