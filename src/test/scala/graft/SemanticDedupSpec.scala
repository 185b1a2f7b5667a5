package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Similarity}

class SemanticDedupSpec extends SparkTestBase {

  import spark.implicits._

  /** Deterministic pseudo-random unit-ish vectors, clustered around four
    * well-separated axes so k-means has real structure to find.
    */
  private def corpus(n: Int): org.apache.spark.sql.DataFrame = {
    def vec(id: Long): Seq[Float] = {
      val axis = (id % 4).toInt
      val rnd = new scala.util.Random(id)
      Seq.tabulate(8)(d => (if (d == axis * 2) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.1f)
    }
    (0L until n.toLong).map(i => (i, vec(i))).toDF("vec_id", "embedding")
  }

  /** 30 unit vectors fanned 0.05 rad apart in a 2-D plane: every distinct
    * pair has cosine ≤ cos(0.05) ≈ 0.99875 < 0.999, while exact copies are
    * 1 — so at threshold 0.999 the planted pairs are PROVABLY the only
    * matches, independent of where k-means puts the cell boundaries.
    */
  private def fan: org.apache.spark.sql.DataFrame =
    (0L until 30L).map { i =>
      val theta = i * 0.05
      (i, Seq(math.cos(theta).toFloat, math.sin(theta).toFloat, 0f, 0f))
    }.toDF("vec_id", "embedding")

  test("exact copies always pair, whatever the centroids learned") {
    val copies = fan.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val pairs = Dedup
      .semanticNearDupPairs(fan.union(copies), k = 4, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // identical vectors share a cell by construction → recall 1; the 0.05
    // rad separation keeps every distinct pair under the exact-cosine bar
    pairs shouldBe (0L until 10L).map(i => (i, i + 1000L)).toSet
  }

  test("exact copies beyond the bucket cap still pair (pre-collapse recall)") {
    // 8 exact copies of vector 0 with bucketCap = 2: pre-r13 the cap shed
    // the high-id copies inside their k-means cell and they silently
    // survived dedup (ADVICE r12). The pre-collapse pairs every copy with
    // its representative before any cell/cap is involved.
    val copies = (0 until 8).map { i =>
      (1000L + i, Seq(1.0f, 0.0f, 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val pairs = Dedup
      .semanticNearDupPairs(fan.union(copies), k = 4, threshold = 0.999, bucketCap = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // fan vector 0 IS (1,0,0,0): it is the min-id representative of all 8
    pairs shouldBe (0 until 8).map(i => (0L, 1000L + i)).toSet
  }

  test("dropSemanticDuplicates keeps exactly one representative per cluster") {
    val copies = fan.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val survivors = Dedup
      .dropSemanticDuplicates(fan.union(copies), k = 4, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    survivors shouldBe (0L until 30L).toSet // min-id representative wins
  }

  test("near (not exact) duplicates verify within a cluster at a looser threshold") {
    val base = corpus(120)
    // a slightly perturbed copy of vector 7 (one component nudged):
    // cosine ≈ 0.999+, lands in the same cell
    val near = base.filter(col("vec_id") === 7L)
      .select(lit(2007L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(0.02f)).otherwise(x)).as("embedding"))
    val pairs = Dedup
      .semanticNearDupPairs(base.union(near), k = 4, threshold = 0.99)
      .filter(col("id_b") === 2007L)
      .select("id_a").as[Long].collect().toSeq
    pairs should contain(7L)
  }

  test("learnCentroids is deterministic for a fixed input") {
    val c1 = Similarity.learnCentroids(corpus(80), k = 4, iters = 2)
    val c2 = Similarity.learnCentroids(corpus(80), k = 4, iters = 2)
    c1 shouldBe c2
    c1.length shouldBe 4
  }

  test("pre-learned centroids reproduce the inline-learning result exactly") {
    // the warmup-memoized model path (centroids = Some(...)) must be
    // behavior-identical to the per-call learn: learnSemanticCentroids
    // learns over the same distinct-vector reps the mining clusters
    val copies = fan.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val mixed = fan.union(copies)
    val model = Dedup.learnSemanticCentroids(mixed, k = 4)
    val inline = Dedup.semanticNearDupPairs(mixed, k = 4, threshold = 0.999)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    val prelearned = Dedup
      .semanticNearDupPairs(mixed, k = 4, threshold = 0.999, centroids = Some(model))
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    prelearned shouldBe inline
    val droppedPre = Dedup
      .dropSemanticDuplicates(mixed, k = 4, threshold = 0.999, centroids = Some(model))
      .select("vec_id").as[Long].collect().toSet
    droppedPre shouldBe (0L until 30L).toSet
  }
}
