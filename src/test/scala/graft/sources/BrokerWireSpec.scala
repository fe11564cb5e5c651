package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Framing fuzz for the hand-rolled broker protocol: seeded-random
  * records (empty/odd-sized payloads, null keys, unicode header
  * names, zero to many headers) must survive publish → fetch over a
  * live socket byte-for-byte, in order, across shards — the length
  * framing either round-trips everything or corrupts the stream.
  */
class BrokerWireSpec extends AnyFunSuite {

  test("seeded-random records round-trip the socket byte-for-byte") {
    val broker = new MessageBroker()
    val client = new BrokerClient("127.0.0.1", broker.port)
    try {
      client.addShard() // 2 shards
      val rnd = new scala.util.Random(20260813L)
      def bytes(max: Int): Array[Byte] = {
        val b = new Array[Byte](rnd.nextInt(max + 1)); rnd.nextBytes(b); b
      }
      val sent = (0 until 200).map { i =>
        val shard = rnd.nextInt(2)
        val key = if (rnd.nextBoolean()) null else bytes(64)
        val value = bytes(1024)
        val headers = (0 until rnd.nextInt(6)).map { h =>
          val name = Seq("x_astarte_msg_type", "üñïçödé-é", "", s"h$h")(rnd.nextInt(4))
          name -> bytes(32)
        }
        (shard, key, value, headers, client.publish(shard, key, value, headers))
      }
      // offsets are per-shard FIFO positions
      for (shard <- 0 to 1) {
        val mine = sent.filter(_._1 == shard)
        assert(mine.map(_._5) == mine.indices.map(_.toLong))
        // fetch in odd-sized chunks and compare byte-for-byte
        val fetched = Iterator.iterate(0L)(_ + 7).map(f => client.fetch(shard, f, 7))
          .takeWhile(_.nonEmpty).flatten.toList
        assert(fetched.length == mine.length)
        fetched.zip(mine).foreach { case (got, (_, key, value, headers, off)) =>
          assert(got.offset == off)
          assert((got.key == null && key == null) ||
            java.util.Arrays.equals(got.key, key))
          assert(java.util.Arrays.equals(got.value, value))
          assert(got.headers.map(_._1) == headers.map(_._1))
          got.headers.zip(headers).foreach { case ((_, gv), (_, sv)) =>
            assert(java.util.Arrays.equals(gv, sv))
          }
        }
      }
      // out-of-range fetches are empty, not errors
      assert(client.fetch(0, 10000L, 10).isEmpty)
      assert(client.fetch(9, 0L, 10).isEmpty)
    } finally {
      client.close(); broker.close()
    }
  }
}
