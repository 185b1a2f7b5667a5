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
    * dimensions for a max-`maxSide`-px bounding box (aspect preserved). The
    * geometry is real; only the pixel work is stubbed out. Chained
    * partition-wise transforms — no shuffle anywhere in the media pipeline.
    *
    * Target sides use integer arithmetic (`src * maxSide div longest`) and
    * the reported scale is a single IEEE division, so the output is exactly
    * replayable by an independent engine (no float round-to-nearest step
    * whose tie-breaking could differ across implementations).
    */
  def resizeStub(docs: DataFrame, maxSide: Int = 256): Dataset[ResizedMedia] = {
    val spark = docs.sparkSession
    import spark.implicits._
    decodeStub(docs).mapPartitions { batch =>
      batch.map { m =>
        val longest = math.max(m.width, m.height)
        if (longest <= maxSide)
          ResizedMedia(m.doc_id, m.width, m.height, m.width, m.height, 1.0)
        else
          ResizedMedia(m.doc_id, m.width, m.height,
            math.max(1, m.width * maxSide / longest),
            math.max(1, m.height * maxSide / longest),
            maxSide.toDouble / longest)
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

  /** The fake decode derives every output from the payload byte sum and
    * length so an independent engine can replay it exactly and hash-compare
    * the result (the r1-r3 FNV-derived dimensions were deterministic but
    * only this JVM could compute them — rows-only checkable):
    *
    *   - width  = 64 + byte_sum mod 1024
    *   - height = 64 + (byte_sum div 7 + n_bytes) mod 1024
    *   - mean_intensity = byte_sum / n_bytes as ONE IEEE-754 division of two
    *     exactly-representable integers — bitwise identical in any engine,
    *     no rounding step to diverge on.
    *
    * The per-byte loop is still a real pass over the payload (the shape a
    * codec call has); only the arithmetic after it is the stub.
    */
  def decodeStub(docs: DataFrame): Dataset[DecodedMedia] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          var sum = 0L
          var i = 0
          while (i < bytes.length) {
            sum += bytes(i) & 0xffL
            i += 1
          }
          val width = 64 + (sum % 1024L).toInt
          val height = 64 + ((sum / 7L + bytes.length) % 1024L).toInt
          val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
          DecodedMedia(id, bytes.length, width, height, 3, mean)
        }
      }
  }
}
