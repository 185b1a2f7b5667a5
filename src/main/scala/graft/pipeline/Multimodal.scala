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
  /** 60-bit perceptual hash of each payload — STUBBED feature extraction:
    * a real pHash DCTs the decoded pixel grid; with no codec in this
    * container, the "features" are the payload's md5 (first 15 hex chars →
    * a 60-bit key both engines can derive), which preserves the one
    * property the downstream join needs for verification: identical
    * payloads collide exactly. The banding/verification machinery in
    * [[phashNearDupPairs]] is the real, production-shaped part — swap this
    * one projection for a real pHash and nothing downstream changes.
    */
  def pHashStub(media: DataFrame, idCol: String = "doc_id"): DataFrame =
    media.select(col(idCol),
      conv(substring(md5(col("payload")), 1, 15), 16, 10).cast("long").as("phash"))

  /** Near-duplicate media pairs at Hamming distance ≤ `maxHamming` over the
    * 60-bit perceptual hash — the image-dedup step of a multimodal
    * pipeline. Pigeonhole banding: the 60 bits split into `maxHamming + 1`
    * contiguous bands, so any pair within distance k agrees on at least
    * one whole band; candidates equi-join on (band, bits) — map-side band
    * explode, signature-not-pixels over the shuffle, buckets capped like
    * every other dedup join here (`graft_cap_*` observes shed rows) — and
    * the exact `bit_count(xor)` decides. Exact over the capped candidate
    * set; returns (id_a < id_b, hamming).
    */
  /** The (id, phash, band, bits) band explode shared by the batch
    * self-join and the streaming gate — one struct per pigeonhole band of
    * the 60-bit hash, map-side.
    */
  private[graft] def phashBands(
      hashed: DataFrame,
      maxHamming: Int,
      idCol: String): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 59,
      s"maxHamming must be in [0, 59], got $maxHamming")
    val nBands = maxHamming + 1
    val widths = Array.tabulate(nBands)(b => 60 / nBands + (if (b < 60 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("phash"), offsets(b))
          .bitwiseAND(lit((1L << widths(b)) - 1)).as("bits"))
    }
    hashed
      .select(col(idCol).as("id"), col("phash"),
        explode(array(bandCols: _*)).as("bd"))
      .select(col("id"), col("phash"),
        col("bd.band").as("band"), col("bd.bits").as("bits"))
  }

  def phashNearDupPairs(
      hashed: DataFrame,
      maxHamming: Int = 5,
      idCol: String = "doc_id",
      bucketCap: Int = Dedup.defaultBucketCap): DataFrame = {
    val banded = phashBands(hashed, maxHamming, idCol)
    val capped = Dedup.capBuckets(banded, bucketCap, "band", "bits")
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.phash").as("__ha"), col("b.phash").as("__hb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

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
