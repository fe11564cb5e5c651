package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Generative round-trip for the hand-rolled BSON codec: any document
  * built from the supported value universe — scalars, binaries,
  * Instants, nulls, and NESTED docs/arrays to depth 3 — must decode
  * back to itself. PayloadCodecSpec pins fixed reference vectors;
  * this pins the encoding for the whole value space, including the
  * corners vectors never visit (empty strings/keys, deep nesting,
  * unicode keys, negative timestamps).
  */
class BsonPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val genKey: Gen[String] = for {
    n <- Gen.choose(0, 8)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('é', '中', '_', '-', ' ')))
  } yield cs.mkString

  private def genScalar: Gen[Any] = Gen.oneOf(
    Gen.chooseNum(Int.MinValue, Int.MaxValue),
    Gen.chooseNum(Long.MinValue, Long.MaxValue),
    // NaN breaks == comparison; keep doubles finite and comparable
    Gen.chooseNum(-1e12, 1e12).map(d => d: Any),
    Gen.asciiPrintableStr,
    Gen.oneOf(true, false),
    Gen.chooseNum(-62135596800000L, 253402300799999L)
      .map(ms => java.time.Instant.ofEpochMilli(ms)),
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(bs => BsonBinary(0, bs.toArray)),
    Gen.const(null))

  private def genValue(depth: Int): Gen[Any] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      6 -> genScalar,
      1 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, genValue(depth - 1)).map(xs => xs: Seq[Any])),
      1 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(genKey, genValue(depth - 1)))
          .map(kvs => dedupKeys(kvs))))

  // BSON docs decode into a map, so duplicate keys cannot round-trip;
  // generate documents with distinct keys (the only documents the
  // encoder is ever fed)
  private def dedupKeys(kvs: Seq[(String, Any)]): Map[String, Any] =
    kvs.toMap

  private def genDoc: Gen[Seq[(String, Any)]] =
    Gen.choose(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.zip(genKey, genValue(3)))
        .map(kvs => dedupKeys(kvs).toSeq))

  /** Structural equality tolerant of the codec's canonical forms:
    * binaries compare by bytes, Seq/Map recursively.
    */
  private def same(a: Any, b: Any): Boolean = (a, b) match {
    case (BsonBinary(s1, b1), BsonBinary(s2, b2)) =>
      s1 == s2 && java.util.Arrays.equals(b1, b2)
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (u, v) => same(u, v) }
    case (x: collection.Map[_, _], y: collection.Map[_, _]) =>
      x.size == y.size && x.forall { case (k, v) =>
        y.asInstanceOf[collection.Map[Any, Any]].get(k).exists(same(v, _)) }
    case (x, y) => x == y
  }

  test("property: encode(doc) decodes back to the same document") {
    check(Prop.forAll(genDoc) { doc =>
      Bson.decode(Bson.encode(doc)) match {
        case Some(back) =>
          back.size == doc.size && doc.forall { case (k, v) =>
            back.get(k).exists(same(v, _)) }
        case None => false
      }
    })
  }

  test("property: truncating an encoded document never crashes the decoder") {
    check(Prop.forAll(Gen.zip(genDoc, Gen.choose(0, 1000))) { case (doc, cut) =>
      val enc = Bson.encode(doc)
      val t = java.util.Arrays.copyOfRange(enc, 0, math.min(cut, enc.length))
      Bson.decode(t) // Option in, Option out — any result, no throw
      true
    })
  }
}
