package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for large-scale document corpora (driver prompt;
  * SURVEY.md §7 phase 4). Every operator is a pure DataFrame → DataFrame
  * transform built to scale:
  *
  *   - signatures (minhash / simhash / buckets) are computed map-side in one
  *     pass, no shuffle;
  *   - candidate generation shuffles only on small bucket keys (band hash /
  *     simhash chunk / LSH bucket), never all-pairs;
  *   - the band-explode stream carries only (doc_id, band, hash) — wide
  *     signature arrays are joined back *after* candidate pruning, so the
  *     big shuffle stays narrow.
  */
object Dedup {

  private def tokens(textCol: String) = split(lower(col(textCol)), " ")

  /** Exact dedup: hash-groupBy on the full text. Returns one row per
    * distinct text with the representative (minimum) id and the copy count.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col(textCol))

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle→minhash (map-side) → band → bucket-join on (band, bandHash) →
    * distinct candidate pairs → join signatures back → estimated Jaccard ≥
    * `threshold`. With r rows per band and b bands, a pair of true Jaccard s
    * is caught with probability 1-(1-s^r)^b.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands

    val sigs = docs.select(
      col(idCol).as("id"),
      minhashSignature(tokens(textCol), numHashes, 3, 42L).as("sig"))

    // slim band stream: (id, band, band_hash) only
    val banded = sigs.select(
      col("id"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> hash(slice(sig, b * $r + 1, $r)))"))
        .as(Seq("band", "band_hash")))

    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    candidates
      .join(sigs.select(col("id"), col("sig").as("sig_a")), col("id_a") === col("id"))
      .drop("id")
      .join(sigs.select(col("id"), col("sig").as("sig_b")), col("id_b") === col("id"))
      .drop("id")
      .withColumn("est_jaccard",
        expr(s"aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v) / cast($numHashes AS double)"))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** SimHash near-duplicate pairs with Hamming distance ≤ `maxHamming`.
    * Bucketing on 16-bit chunks of the 64-bit simhash: by pigeonhole, any
    * pair within distance ≤ 3 shares at least one of the 4 chunks, so the
    * join only touches chunk-equal candidates.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    val sims = docs.select(col(idCol).as("id"), simhash64(tokens(textCol)).as("sh"))
    val chunked = sims.select(
      col("id"), col("sh"),
      posexplode(expr("transform(sequence(0, 3), c -> (sh >> (c * 16)) & 65535)"))
        .as(Seq("chunk", "chunk_val")))

    val a = chunked.as("a"); val b = chunked.as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram (word shingle) Jaccard over LSH candidates: minhash bands
    * prune to candidate pairs, then the true Jaccard is computed on the
    * distinct shingle sets. Avoids the all-pairs O(n²) join.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.3): DataFrame = {
    val shingled = docs.select(
      col(idCol).as("id"),
      expr(s"array_distinct(transform(sequence(1, greatest(size(split(lower($textCol), ' ')) - ${n - 1}, 0)), " +
        s"i -> concat_ws(' ', slice(split(lower($textCol), ' '), i, $n))))").as("shingles"))

    // loose minhash candidates (low threshold → high recall), exact verify after
    val candidates = minhashPairs(docs, idCol, textCol, numHashes = 64, bands = 32, threshold = 0.2)
      .select("id_a", "id_b")

    candidates
      .join(shingled.select(col("id"), col("shingles").as("sh_a")), col("id_a") === col("id")).drop("id")
      .join(shingled.select(col("id"), col("shingles").as("sh_b")), col("id_b") === col("id")).drop("id")
      .withColumn("jaccard",
        expr("size(array_intersect(sh_a, sh_b)) / cast(size(array_union(sh_a, sh_b)) AS double)"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs via random-hyperplane LSH: vectors
    * are bucketed by sign-bit codes from two independent hash tables (union
    * for recall), pairs are verified with exact cosine ≥ `threshold` inside
    * each bucket only.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      bits: Int = 8,
      threshold: Double = 0.95): DataFrame = {
    def table(seed: Long): DataFrame = {
      val bucketed = embeddings.select(
        col(idCol).as("id"), col(vecCol).as("v"),
        hyperplaneBucket(col(vecCol), bits, seed).as("bucket"))
      val a = bucketed.as("a"); val b = bucketed.as("b")
      a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          cosineSimilarity(col("a.v"), col("b.v")).as("cos"))
    }
    table(7L).union(table(1337L))
      .filter(col("cos") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(round(max(col("cos")), 6).as("cosine"))
  }
}
