package graft.analytics

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.Multimodal._

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("batched feature extraction: schema, determinism, batch shape") {
    import spark.implicits._
    val media = (0L until 300L).map { i =>
      MediaRow(i, if (i % 3 == 0) "image" else "video",
        s"payload-$i".getBytes ++ Array.fill[Byte]((i % 50).toInt)(i.toByte))
    }.toDS()

    val fx = extractFeatures(media, new DeterministicStubCodec,
      batchSize = 64, partitions = 4).collect()

    assert(fx.length == 300)
    // deterministic: same content → same features across runs
    val fx2 = extractFeatures(media, new DeterministicStubCodec,
      batchSize = 64, partitions = 4).collect()
    assert(fx.sortBy(_.mediaId).map(_.digest).toSeq ==
      fx2.sortBy(_.mediaId).map(_.digest).toSeq)
    // batch shape: no batch exceeds the configured size, and batching
    // actually happens (not row-at-a-time)
    assert(fx.forall(_.batchSize <= 64))
    assert(fx.exists(_.batchSize > 1))
    // stub semantics: images have no duration, video duration scales
    assert(fx.filter(_.mediaType == "image").forall(_.durationMs == 0))
    assert(fx.filter(_.mediaType == "video").forall(f => f.durationMs == f.byteLen * 10))
  }

  test("binaryMeta computes length and digest without decoding") {
    import spark.implicits._
    val df = Seq(("a", "hello"), ("b", "wörld")).toDF("id", "text")
      .withColumn("content",
        org.apache.spark.sql.functions.encode(
          org.apache.spark.sql.functions.col("text"), "UTF-8"))
    val meta = binaryMeta(df, "content").collect()
    val byId = meta.map(r => r.getAs[String]("id") ->
      (r.getAs[Int]("byte_len"), r.getAs[String]("digest"))).toMap
    assert(byId("a")._1 == 5)
    assert(byId("b")._1 == 6) // ö is 2 bytes in UTF-8
    assert(byId("a")._2 == "5d41402abc4b2a76b9719d911017c592")
  }

  test("frame sampling offsets") {
    assert(frameOffsets(100, 10, 3) == Seq(0L, 30L, 60L, 90L))
    assert(frameOffsets(5, 10, 2) == Seq(0L))
  }
}
