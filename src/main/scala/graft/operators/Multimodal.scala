package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal row: opaque binary payload + typed metadata. */
final case class MediaRow(media_id: Long, media_type: String,
                          payload: Array[Byte], width: Int, height: Int,
                          source: String)

/** Extracted features for one asset. */
final case class MediaFeatures(media_id: Long, media_type: String,
                               byte_len: Int, byte_sum: Long,
                               mean_byte_x100: Long, feature: Array[Float])

/**
 * Multimodal column plumbing: image/audio/video as opaque BINARY columns
 * with typed metadata, processed in partition-sized batches.
 *
 * The DECODE STEP IS A STUB — this container has no image/audio codecs, so
 * [[decodeStub]] produces a deterministic fake feature vector. Everything
 * around it is real Spark plumbing: the binary schema, the typed
 * `Dataset[MediaRow].mapPartitions` batch iteration (the Scala analog of
 * mapInPandas: one iterator per partition, codec state initialized once per
 * partition, streamed row batches), and the feature schema out.
 *
 * Scale design: payloads never shuffle — feature extraction is a narrow map
 * over the scan; only the small (id, features) projection flows downstream.
 * Partition sizing for 100 TB of blobs is governed by
 * spark.sql.files.maxPartitionBytes against payload size, not row count.
 */
object Multimodal {

  /** STUB: stands in for a real image/audio decode (JPEG/PNG/ffmpeg would
    * be invoked here). Deterministic byte-histogram fold so tests are exact. */
  def decodeStub(payload: Array[Byte], width: Int, height: Int): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) { f(i % 8) += (payload(i) & 0xff); i += 1 }
    var j = 0
    while (j < 8) { f(j) = f(j) / math.max(1, width * height); j += 1 }
    f
  }

  /** Batch feature extraction — typed mapPartitions; per-partition "codec"
    * initialization happens once at the head of the iterator. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload", "width", "height", "source")
      .as[MediaRow]
      .mapPartitions { rows =>
        // real pipeline: codec/session init here, reused across the batch
        rows.map { r =>
          var sum = 0L
          var i = 0
          while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
          MediaFeatures(r.media_id, r.media_type, r.payload.length, sum,
            sum * 100L / math.max(1, r.payload.length),
            decodeStub(r.payload, r.width, r.height))
        }
      }
  }

  /** A resized asset: new dims + the downsampled payload. */
  final case class Resized(media_id: Long, width: Int, height: Int,
                           out_w: Int, out_h: Int, pixels: Array[Byte])

  /**
   * Resize (downsample) the payload interpreted as a width×height byte
   * matrix via nearest-neighbor stride sampling — the STUB stands in for a
   * real interpolating resize (no image libs here); the plumbing is the
   * real shape: metadata-driven dimension math, per-partition batch
   * iteration, payloads never shuffled.
   */
  def resizeStub(spark: SparkSession, media: DataFrame,
                 outW: Int = 4, outH: Int = 4): Dataset[Resized] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload", "width", "height", "source")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val out = new Array[Byte](outW * outH)
          // degenerate assets (empty payload or non-positive dims) resize to
          // an all-zero frame instead of crashing the whole partition
          if (r.payload.nonEmpty && r.width > 0 && r.height > 0) {
            // payload is a row-major byte matrix truncated/wrapped to w×h
            var y = 0
            while (y < outH) {
              val sy = y * r.height / outH
              var x = 0
              while (x < outW) {
                val sx = x * r.width / outW
                out(y * outW + x) =
                  r.payload((sy * r.width + sx) % r.payload.length)
                x += 1
              }
              y += 1
            }
          }
          Resized(r.media_id, r.width, r.height, outW, outH, out)
        }
      }
  }

  /** One sampled frame: asset id + frame index + the frame's bytes. */
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /**
   * Frame sampling for video/audio payloads: split the payload into
   * fixed-size frames and keep every `stride`-th one — the decode itself is
   * the documented stub (no codecs in this container; a real pipeline
   * replaces the splitter with ffmpeg-style demux inside the same
   * mapPartitions batch shape). Output rows ∝ sampled frames; payloads
   * never shuffle — sampling happens in the scan's partition.
   */
  def frameSample(spark: SparkSession, media: DataFrame,
                  frameBytes: Int = 16, stride: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload", "width", "height", "source")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          // STUB demux: fixed-size byte frames stand in for decoded frames
          r.payload.grouped(frameBytes).zipWithIndex.collect {
            case (bytes, i) if i % stride == 0 => Frame(r.media_id, i, bytes)
          }
        }
      }
  }

  /** Byte-range read of the binary payload (the ranged-GET of §2.1 applied
    * to a multimodal column): slice [start, start+len) without ever moving
    * the full payload past the scan. */
  def mediaByteRange(media: DataFrame, start: Int, len: Int): DataFrame =
    media
      .select(col("media_id"),
        lit(start.toLong).as("range_start"),
        lower(hex(expr(s"substring(payload, ${start + 1}, $len)"))).as("chunk_hex"))
      .orderBy("media_id")

  /** Declarative metadata + byte-level stats (oracle-checkable): byte length
    * of the binary payload and the byte sum recomputed from the hex twin —
    * the checksum/ETag shape of §2.8 applied to a multimodal column. */
  def mediaMeta(media: DataFrame): DataFrame =
    media
      .withColumn("byte_len", length(col("payload")))
      .withColumn("byte_sum",
        expr("aggregate(transform(sequence(1, 64), " +
          "i -> CAST(conv(substring(payload_hex, i * 2 - 1, 2), 16, 10) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .select("media_id", "media_type", "byte_len", "byte_sum", "width", "height")
      .orderBy("media_id")
}
