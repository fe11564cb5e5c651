package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batched decode / feature-extract
  * plumbing.
  *
  * The actual media decoding is STUBBED — no codec libraries exist in
  * this environment — behind [[MediaCodec]]; [[DeterministicStubCodec]]
  * produces stable fake features from the bytes so the pipeline is
  * testable end-to-end. The Spark-side plumbing is real: schema,
  * size-aware partitioning, per-partition batched invocation (the
  * Scala analogue of `mapInPandas` batch shape), and the
  * metadata-only fast paths.
  */
object Multimodal {

  /** One media object: opaque payload + typed envelope. */
  final case class MediaRow(
      mediaId: Long,
      mediaType: String, // image | audio | video
      content: Array[Byte])

  final case class MediaFeatures(
      mediaId: Long,
      mediaType: String,
      byteLen: Long,
      digest: String,
      width: Int,       // stub-decoded
      height: Int,      // stub-decoded
      durationMs: Long, // stub-decoded (audio/video)
      batchSize: Int)   // observability: size of the decode batch

  /** Pluggable decoder, invoked once per BATCH of rows — the shape a
    * vectorized decode (GPU / native lib) needs. Implementations must
    * be deterministic per content bytes.
    */
  trait MediaCodec extends Serializable {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** Deterministic fake decode: "dimensions" from the content digest,
    * "duration" from the byte length. Replace with a real codec
    * (??? = libjpeg/ffmpeg binding) without touching the plumbing.
    */
  final class DeterministicStubCodec extends MediaCodec {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
      // real implementation would decode the whole batch vectorized:
      // ??? (no image/audio libs in this container)
      batch.map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(r.content)
        val hex = md.map("%02x".format(_)).mkString
        MediaFeatures(
          mediaId = r.mediaId,
          mediaType = r.mediaType,
          byteLen = r.content.length.toLong,
          digest = hex,
          width = 16 + (md(0) & 0x7f),
          height = 16 + (md(1) & 0x7f),
          durationMs = if (r.mediaType == "image") 0L else r.content.length.toLong * 10,
          batchSize = batch.size)
      }
    }
  }

  /** Batched feature extraction over an opaque-binary Dataset.
    *
    * Scale design: media rows are repartitioned by id hash so decode
    * cost spreads evenly regardless of upstream layout (a directory
    * scan groups similar sizes together); each partition is processed
    * in fixed-size batches so a vectorized codec gets its preferred
    * shape and memory stays bounded by batch, not partition.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      codec: MediaCodec,
      batchSize: Int = 64,
      partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val repartitioned =
      if (partitions > 0) media.repartition(partitions, col("mediaId"))
      else media
    repartitioned.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(batch => codec.decodeBatch(batch.toSeq))
    }
  }

  /** Metadata-only projection — never touches content bytes beyond
    * length/digest, so Parquet's column pruning skips the payload
    * pages when `content` isn't selected downstream.
    */
  def binaryMeta(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("byte_len", octet_length(col(contentCol)))
      .withColumn("digest", md5(col(contentCol)))

  /** Frame sampling stub for video: pick every k-th "frame offset" —
    * real implementation seeks the container; the partition/batch
    * plumbing is identical.
    */
  def frameOffsets(byteLen: Long, frameBytes: Long, everyK: Int): Seq[Long] =
    (0L until byteLen by frameBytes).grouped(everyK).map(_.head).toSeq
}
