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

  /** LSH-bucketed ANN top-k over the raw table: computes every row's bucket
    * then filters — a full scan per query. Correct, but NOT an index; use
    * [[buildLshIndex]] + [[lshTopKIndexed]] for the scale path.
    */
  def lshTopK(
      embeddings: DataFrame,
      queryVec: Seq[Float],
      k: Int = 10,
      bits: Int = 8,
      seed: Long = 7L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val probeBuckets = probesOf(queryVec, bits, seed)
    embeddings.select(
        col(idCol),
        col(vecCol),
        hyperplaneBucket(col(vecCol), bits, seed).as("bucket"))
      .filter(col("bucket").isin(probeBuckets: _*))
      .select(col(idCol), round(cosineSimilarity(col(vecCol), typedLit(queryVec)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** The query bucket plus its Hamming-1 neighbors (multi-probe for recall). */
  def probesOf(queryVec: Seq[Float], bits: Int, seed: Long): Seq[Int] = {
    val qBucket = bucketOf(queryVec, bits, seed)
    qBucket +: (0 until bits).map(b => qBucket ^ (1 << b))
  }

  /** Build the ANN index: the table written partitioned by hyperplane bucket.
    * One shuffle-free pass over the vectors; the layout is the index — a
    * probe then reads only the matching bucket directories (Spark partition
    * pruning), which at 100 TB is the difference between an index lookup and
    * a full scan. Sizing: directories ≈ 2^bits; pick
    * bits ≈ log2(n / desired_bucket_rows).
    */
  def buildLshIndex(
      embeddings: DataFrame,
      path: String,
      bits: Int = 8,
      seed: Long = 7L,
      vecCol: String = "embedding"): Unit =
    embeddings
      .withColumn("bucket", hyperplaneBucket(col(vecCol), bits, seed))
      // co-locate each bucket in one task so the dynamic-partition write
      // emits one file per bucket directory instead of one per (task, bucket)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** ANN top-k against a built index: partition pruning restricts the read
    * to the probed bucket directories; exact cosine ranks within them.
    * `bits`/`seed` must match [[buildLshIndex]].
    */
  def lshTopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      queryVec: Seq[Float],
      k: Int = 10,
      bits: Int = 8,
      seed: Long = 7L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val probeBuckets = probesOf(queryVec, bits, seed)
    spark.read.parquet(indexPath)
      .filter(col("bucket").isin(probeBuckets: _*))
      .select(col(idCol), round(cosineSimilarity(col(vecCol), typedLit(queryVec)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
