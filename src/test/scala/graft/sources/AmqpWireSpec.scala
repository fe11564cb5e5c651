package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the hand-rolled AMQP 0-9-1 framing: anything
  * the Writer can emit must read back verbatim (frames, field tables,
  * content headers with arbitrary header bytes), and HOSTILE input —
  * truncated frames, oversized size prefixes, corrupt frame-end
  * octets, malformed tables — must fail with a clean IOException-
  * family error, never an OOM-sized allocation or a silent wrong
  * decode. Same posture as the media codecs' fuzz hardening: wire
  * parsers are the attack surface.
  */
class AmqpWireSpec extends AnyFunSuite {
  import AmqpWire._

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  private val genBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  private val genHeaderKey: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(100))

  test("property: frames round-trip arbitrary payloads and channels") {
    check(Prop.forAll(genBytes, Gen.chooseNum(0, 65535)) { (payload, channel) =>
      val bos = new ByteArrayOutputStream()
      writeFrame(new DataOutputStream(bos), Frame(FrameMethod, channel, payload))
      val back = readFrame(new DataInputStream(
        new ByteArrayInputStream(bos.toByteArray)))
      back.frameType == FrameMethod && back.channel == channel &&
        java.util.Arrays.equals(back.payload, payload)
    })
  }

  test("property: content headers round-trip arbitrary header tables") {
    check(Prop.forAll(
      Gen.listOf(Gen.zip(genHeaderKey, genBytes)),
      Gen.chooseNum(0L, Long.MaxValue)) { (headers, bodySize) =>
      // AMQP field tables key by shortstr: dedupe keys like a real
      // header table would
      val hs = headers.distinctBy(_._1)
      val (size, decoded) = parseContentHeader(contentHeader(bodySize, hs))
      size == bodySize && decoded.map(_._1) == hs.map(_._1) &&
        decoded.zip(hs).forall { case ((_, a), (_, b)) =>
          java.util.Arrays.equals(a, b)
        }
    })
  }

  test("property: truncating a valid frame anywhere fails cleanly") {
    val frameBytes = {
      val bos = new ByteArrayOutputStream()
      writeFrame(new DataOutputStream(bos),
        Frame(FrameMethod, 1, Array.tabulate(64)(_.toByte)))
      bos.toByteArray
    }
    check(Prop.forAll(Gen.chooseNum(0, frameBytes.length - 1)) { cut =>
      val in = new DataInputStream(
        new ByteArrayInputStream(frameBytes.take(cut)))
      try { readFrame(in); false } // a truncated frame must never parse
      catch {
        case _: EOFException | _: IOException => true
        case _: Throwable => false
      }
    })
  }

  test("property: corrupting any single byte never crashes the reader") {
    val frameBytes = {
      val bos = new ByteArrayOutputStream()
      writeFrame(new DataOutputStream(bos),
        Frame(FrameMethod, 1, Array.tabulate(64)(_.toByte)))
      bos.toByteArray
    }
    check(Prop.forAll(
      Gen.chooseNum(0, frameBytes.length - 1),
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) { (pos, b) =>
      val corrupted = frameBytes.clone()
      corrupted(pos) = b
      val in = new DataInputStream(new ByteArrayInputStream(corrupted))
      try {
        val f = readFrame(in)
        // a parse that survives must be structurally coherent (the
        // corruption hit the payload body or was a no-op)
        f.payload.length <= corrupted.length
      } catch {
        case _: EOFException | _: IOException => true // clean rejection
        case _: Throwable => false                    // anything else = bug
      }
    })
  }

  test("an adversarial giant size prefix is rejected before allocation") {
    // frame header claiming a 2 GiB payload backed by 4 real bytes:
    // the reader must bound-check the size, not allocate it
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(FrameMethod); out.writeShort(1)
    out.writeInt(Int.MaxValue); out.write(Array[Byte](1, 2, 3, 4))
    val in = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
    intercept[IOException](readFrame(in))
  }

  test("a malformed field table fails cleanly, not endlessly") {
    // type tag 'Z' is not a supported field type; a hostile table
    // must raise, never loop or mis-skip
    val w = new Writer
    val inner = new Writer
    inner.shortstr("k").u8('Z').u32(12345)
    w.longstr(inner.result())
    val r = new Reader(w.result())
    intercept[IOException](r.table())
  }
}
