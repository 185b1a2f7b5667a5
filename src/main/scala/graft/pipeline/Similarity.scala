package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column (driver prompt; SURVEY.md §7 phase 4).
  *
  * Brute-force is the correctness baseline: one map-side cosine per row + a
  * top-k (`TakeOrderedAndProject` — no full sort, no shuffle of the data,
  * only k rows per partition reach the driver). The LSH variant is the scale
  * path: only the query's bucket (plus Hamming-1 neighbor buckets for
  * recall) is scanned — at 100 TB that's a partition-pruning-sized win when
  * the table is written bucketed/partitioned by the bucket id.
  */
object Similarity {

  /** Exact top-k by cosine similarity against a literal query vector. */
  def bruteForceTopK(
      embeddings: DataFrame,
      queryVec: Seq[Float],
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    embeddings.select(
        col(idCol),
        round(cosineSimilarity(col(vecCol), typedLit(queryVec)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Same plane family as [[graft.functions.HyperplaneBucket]], evaluated
    * driver-side for the query vector.
    */
  private def bucketOf(queryVec: Seq[Float], bits: Int, seed: Long): Int = {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val dim = queryVec.length
    var bucket = 0
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var d = 0
      while (d < dim) {
        dot += queryVec(d) * (mix(seed + b.toLong * 1000003L + d.toLong).toDouble / Long.MaxValue.toDouble)
        d += 1
      }
      if (dot >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** LSH-bucketed ANN top-k: scan only the query's bucket and its Hamming-1
    * neighbors, rank by exact cosine within the candidates.
    */
  def lshTopK(
      embeddings: DataFrame,
      queryVec: Seq[Float],
      k: Int = 10,
      bits: Int = 8,
      seed: Long = 7L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val qBucket = bucketOf(queryVec, bits, seed)
    val probeBuckets = qBucket +: (0 until bits).map(b => qBucket ^ (1 << b))
    embeddings.select(
        col(idCol),
        col(vecCol),
        hyperplaneBucket(col(vecCol), bits, seed).as("bucket"))
      .filter(col("bucket").isin(probeBuckets: _*))
      .select(col(idCol), round(cosineSimilarity(col(vecCol), typedLit(queryVec)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
