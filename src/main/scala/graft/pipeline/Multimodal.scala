package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (driver prompt): media payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batch-wise over partitions. The actual image/audio decode is STUBBED with
  * a deterministic fake (no media libraries in this environment) — the
  * Spark-side contract (schema, partitioning, batch iteration shape) is
  * real and tested.
  *
  * The test corpus has no binary column, so the payload is derived from
  * `documents.text` via a UTF-8 binary cast; on a real corpus the payload
  * column would come straight from parquet.
  */
object Multimodal {

  /** Typed record produced by the (stubbed) decoder. */
  case class DecodedMedia(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      mean_intensity: Double)

  /** Typed record produced by the (stubbed) resize step. */
  case class ResizedMedia(
      doc_id: Long,
      src_width: Int,
      src_height: Int,
      dst_width: Int,
      dst_height: Int,
      scale: Double)

  /** One sampled frame of a (stubbed) video payload. */
  case class SampledFrame(
      doc_id: Long,
      frame_idx: Int,
      frame_checksum: Long)

  /** Attach the opaque payload + cheap metadata (size, content hash). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      length(col("text").cast("binary")).as("n_bytes"),
      sha2(col("text").cast("binary"), 256).as("sha256_hex"))

  /** Batch "decode": partition-wise iteration over payload bytes, emitting a
    * typed record per media item. The decode itself is a deterministic fake
    * (dimensions + intensity derived from the payload bytes); swap the body
    * for an actual codec call in production. Runs fully distributed — one
    * task per partition, no driver involvement.
    */
  /** Batch "resize": consumes the decode output and computes target
    * dimensions for a max-256px bounding box (aspect preserved). The
    * geometry is real; only the pixel work is stubbed out. Chained
    * partition-wise transforms — no shuffle anywhere in the media pipeline.
    */
  def resizeStub(docs: DataFrame, maxSide: Int = 256): Dataset[ResizedMedia] = {
    val spark = docs.sparkSession
    import spark.implicits._
    decodeStub(docs).mapPartitions { batch =>
      batch.map { m =>
        val scale = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
        ResizedMedia(m.doc_id, m.width, m.height,
          math.max(1, math.round(m.width * scale).toInt),
          math.max(1, math.round(m.height * scale).toInt),
          math.round(scale * 10000).toDouble / 10000)
      }
    }
  }

  /** Frame sampling for "video" payloads: one frame per 1000 payload bytes,
    * capped at `maxFrames` per document (flatMap — the row-explosion shape a
    * real decoder produces). Frame checksum is the deterministic stand-in
    * for decoded frame content.
    */
  def frameSampleStub(docs: DataFrame, maxFrames: Int = 5): Dataset[SampledFrame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = math.min(bytes.length / 1000 + 1, maxFrames)
        (0 until n).map { i =>
          var h = 0xcbf29ce484222325L ^ i.toLong
          val start = i * 1000
          val end = math.min(start + 1000, bytes.length)
          var j = start
          while (j < end) { h = (h ^ (bytes(j) & 0xffL)) * 0x100000001b3L; j += 1 }
          SampledFrame(id, i, h)
        }
      }
  }

  def decodeStub(docs: DataFrame): Dataset[DecodedMedia] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          // deterministic fake decode standing in for an image codec
          var h = 0xcbf29ce484222325L
          var sum = 0L
          var i = 0
          while (i < bytes.length) {
            h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
            sum += bytes(i) & 0xffL
            i += 1
          }
          val width = 64 + (((h >>> 8) & 0x3ffL)).toInt
          val height = 64 + (((h >>> 24) & 0x3ffL)).toInt
          val mean = if (bytes.isEmpty) 0.0
            else math.round(sum.toDouble / bytes.length * 10000).toDouble / 10000
          DecodedMedia(id, bytes.length, width, height, 3, mean)
        }
      }
  }
}
