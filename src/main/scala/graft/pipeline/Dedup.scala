package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for large-scale document corpora (driver prompt;
  * SURVEY.md §7 phase 4). Every operator is a pure DataFrame → DataFrame
  * transform built to scale:
  *
  *   - signatures (minhash / simhash / buckets) are computed map-side in one
  *     pass, no shuffle, over DISTINCT texts only (exact-duplicate pre-pass:
  *     a 100 TB crawl is full of identical documents, and collapsing them
  *     first keeps them from forming quadratic LSH buckets);
  *   - candidate generation shuffles only on small bucket keys (band hash /
  *     simhash chunk / LSH bucket), never all-pairs;
  *   - every bucket join is capped ([[defaultBucketCap]]): buckets larger
  *     than the cap are dropped before the self-join, so one skewed key
  *     (boilerplate, empty docs) cannot go quadratic — genuinely similar
  *     members of an over-full bucket still pair through their other
  *     bands/chunks;
  *   - the band-explode stream carries only (doc_id, band, hash) — wide
  *     signature arrays are joined back *after* candidate pruning, so the
  *     big shuffle stays narrow.
  */
object Dedup {

  private def tokens(textCol: String) = split(lower(col(textCol)), " ")

  /** Skew guard for every LSH bucket self-join: buckets with more members
    * than this are dropped before pairing. At the default minhash band count
    * (16) a true near-dup pair in a dropped bucket is still caught by its
    * 15 other bands with near-certainty; the cap only sheds the quadratic
    * cost of degenerate keys.
    */
  val defaultBucketCap: Int = 1000

  /** Drop rows whose bucket (the given key columns) exceeds `cap` members.
    * One window count over the same shuffle key the join uses — linear.
    */
  private def capBuckets(df: DataFrame, cap: Int, keys: String*): DataFrame =
    df.withColumn("__bucket_n", count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      .filter(col("__bucket_n") <= cap)
      .drop("__bucket_n")

  /** Exact dedup: hash-groupBy on the full text. Returns one row per
    * distinct text with the representative (minimum) id and the copy count.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col(textCol))

  /** One row per DISTINCT text: (id = min doc id, text). The exact-duplicate
    * pre-pass all near-dup operators build on.
    */
  private def distinctTexts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol)).agg(min(col(idCol)).as("id"))

  /** Map-side minhash signatures over distinct texts: (id, sig). Shared by
    * [[minhashPairs]] and [[ngramJaccardPairs]] — compute once, persist, and
    * both the band stream and the verify join read the cache instead of
    * re-hashing every shingle (the r1 bottleneck: signatures were built
    * up to three times per query).
    */
  /** Signatures are computed MAP-SIDE for every row, then exact duplicates
    * collapse by grouping on a 128-bit content hash — the shuffle carries
    * (md5, id, signature) ≈ 0.5 KB per doc instead of the full text, which
    * at 10-100 KB/doc is the difference that matters at corpus scale.
    * (Duplicate copies recompute their signature; CPU is the cheap resource
    * next to shuffle bytes.) Identical texts produce identical signatures,
    * so `first(sig)` is deterministic.
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      shingleSize: Int = 3,
      seed: Long = 42L): DataFrame =
    docs.select(
        col(idCol).as("id"),
        md5(col(textCol).cast("binary")).as("content_hash"),
        minhashSignature(tokens(textCol), numHashes, shingleSize, seed).as("sig"))
      .groupBy(col("content_hash"))
      .agg(min(col("id")).as("id"), first(col("sig")).as("sig"))
      .select(col("id"), col("sig"))

  /** Signatures over an already-deduplicated (id, text) representative set —
    * lets callers that need several per-text derivations (e.g.
    * [[ngramJaccardPairs]]: shingle sets AND signatures) pay the full-text
    * shuffle of the dedup pre-pass once instead of once per derivation.
    */
  private def signaturesOfReps(
      reps: DataFrame,
      textCol: String,
      numHashes: Int,
      shingleSize: Int = 3,
      seed: Long = 42L): DataFrame =
    reps.select(col("id"), minhashSignature(tokens(textCol), numHashes, shingleSize, seed).as("sig"))

  /** LSH candidate pairs from banded signatures: slim (id, band, band_hash)
    * stream → bucket-capped self-join on (band, band_hash) → distinct id
    * pairs. With r rows per band and b bands, a pair of true Jaccard s is
    * caught with probability 1-(1-s^r)^b.
    */
  def bandCandidates(
      sigs: DataFrame,
      numHashes: Int,
      bands: Int,
      bucketCap: Int = defaultBucketCap): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val banded = sigs.select(
      col("id"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> hash(slice(sig, b * $r + 1, $r)))"))
        .as(Seq("band", "band_hash")))
    val capped = capBuckets(banded, bucketCap, "band", "band_hash")
    val a = capped.as("a"); val b = capped.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash + LSH near-duplicate pairs among distinct texts:
    * shingle→minhash (map-side, once, cached) → band-bucket candidates →
    * signature compare → estimated Jaccard ≥ `threshold`.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      bucketCap: Int = defaultBucketCap): DataFrame = {
    // cached: read by the band stream and twice by the verify join. Tiny
    // (numHashes longs per distinct doc), so the cache never pressures
    // executor memory even at large n.
    val sigs = minhashSignatures(docs, idCol, textCol, numHashes).persist()
    val candidates = bandCandidates(sigs, numHashes, bands, bucketCap)
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
    *
    * The 64-bit simhash is split into `maxHamming + 1` chunks — by
    * pigeonhole, any pair within the distance budget shares at least one
    * full chunk, so bucketing on (chunk index, chunk value) has guaranteed
    * recall for the requested distance (the r1 version fixed 4 chunks and
    * silently lost pairs when called with maxHamming > 3).
    *
    * No distinct-text pre-pass here: identical texts have Hamming distance 0
    * and are legitimate output; the bucket cap bounds their join cost.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      bucketCap: Int = defaultBucketCap): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15] (chunks need >= 4 bits to stay selective), got $maxHamming")
    val numChunks = maxHamming + 1
    val width = 64 / numChunks // last chunk also takes the remainder bits
    val mask = (1L << width) - 1
    val sims = docs.select(col(idCol).as("id"), simhash64(tokens(textCol)).as("sh"))
    val chunked = sims.select(
      col("id"), col("sh"),
      posexplode(expr(
        s"transform(sequence(0, ${numChunks - 1}), c -> IF(c = ${numChunks - 1}, " +
          s"shiftrightunsigned(sh, c * $width), shiftrightunsigned(sh, c * $width) & $mask))"))
        .as(Seq("chunk", "chunk_val")))
    val capped = capBuckets(chunked, bucketCap, "chunk", "chunk_val")
    val a = capped.as("a"); val b = capped.as("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram (word shingle) Jaccard over LSH candidates: one shared set
    * of minhash signatures generates loose candidates (narrow bands → high
    * recall), then the true Jaccard is computed on the distinct shingle
    * sets. Avoids both the all-pairs O(n²) join and the r1 double
    * signature computation (candidates reuse [[minhashSignatures]]).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.3,
      bucketCap: Int = defaultBucketCap): DataFrame = {
    // one dedup pre-pass (full-text shuffle) feeds BOTH derivations.
    // Shingles are stored as 64-bit hashes, not strings: set operations and
    // shuffles carry 8 bytes per shingle instead of the n-gram text
    // (hash-collision error on Jaccard is ~2^-64 per pair — negligible).
    val reps = distinctTexts(docs, idCol, textCol).persist()
    val shingled = reps.select(
      col("id"),
      expr(s"array_distinct(transform(sequence(1, greatest(size(split(lower($textCol), ' ')) - ${n - 1}, 0)), " +
        s"i -> xxhash64(concat_ws(' ', slice(split(lower($textCol), ' '), i, $n)))))").as("shingles"))

    val sigs = signaturesOfReps(reps, textCol, numHashes = 64).persist()
    // 32 bands of 2 hashes: band-match probability s² per band — high recall
    // down to low Jaccard, exact verify prunes false positives after.
    val candidates = bandCandidates(sigs, numHashes = 64, bands = 32, bucketCap)

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
    * each (capped) bucket only.
    *
    * Sizing at scale: buckets ≈ 2^bits, so choose
    * bits ≈ log2(n / desired_bucket_size) — e.g. 10⁹ vectors and ~4k-vector
    * buckets → bits ≈ 18. The cap bounds the worst bucket regardless.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      bits: Int = 8,
      threshold: Double = 0.95,
      bucketCap: Int = defaultBucketCap): DataFrame = {
    def table(seed: Long): DataFrame = {
      val bucketed = capBuckets(
        embeddings.select(
          col(idCol).as("id"), col(vecCol).as("v"),
          hyperplaneBucket(col(vecCol), bits, seed).as("bucket")),
        bucketCap, "bucket")
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
