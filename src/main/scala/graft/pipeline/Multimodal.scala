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
