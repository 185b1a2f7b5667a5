package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** The ANN index must behave like an index: a probe reads only the probed
  * bucket directories (Spark partition pruning), not the whole table.
  */
class AnnIndexSpec extends SparkTestBase {

  /** Find the file scan anywhere in an executed plan, descending through
    * AQE wrapper nodes and materialized query stages (whose inner plan is
    * not part of `children`, so a plain `collectFirst` misses it once the
    * query has an exchange).
    */
  private def findScan(p: SparkPlan): Option[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
    case q: QueryStageExec        => findScan(q.plan)
    case s: FileSourceScanExec    => Some(s)
    case other                    => other.children.view.flatMap(findScan(_)).headOption
  }

  private lazy val (indexPath, query, nPartitions) = {
    import spark.implicits._
    val embs = (0L until 256L)
      .map(i => (i, Array.tabulate(16)(d => math.sin(i * 13.0 + d * 7.0).toFloat)))
      .toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ann_test").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/index"
    Similarity.buildLshIndex(embs, path, bits = 4, seed = 7L, tables = 1)
    val q = embs.filter(col("vec_id") === 3).head().getSeq[Float](1)
    val parts = new java.io.File(path, "tbl=0").listFiles().count(_.getName.startsWith("bucket="))
    (path, q, parts)
  }

  test("index layout is partitioned by bucket") {
    nPartitions should be > 2
    nPartitions should be <= 16
  }

  test("probe prunes to the probed bucket partitions") {
    val df = Similarity.lshTopKIndexed(spark, indexPath, query, k = 5, bits = 4, seed = 7L, tables = 1)
    val rows = df.collect()
    rows.length shouldBe 5
    rows.head.getLong(0) shouldBe 3L // the query vector itself ranks first

    val scan = findScan(df.queryExecution.executedPlan).get
    assert(scan.partitionFilters.nonEmpty, "bucket filter must be a partition filter")
    // 5 probe buckets (bucket + 4 Hamming-1 neighbors) out of up to 16: the
    // scan must read strictly fewer part-files than the index holds
    val probed = Similarity.probesOf(query, bits = 4, seed = 7L).toSet
    def parquetFiles(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(parquetFiles).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    val totalFiles = parquetFiles(new java.io.File(indexPath))
    val readFiles = scan.metrics("numFiles").value
    readFiles should be < totalFiles
    // and no more bucket directories than probed
    scan.metrics("numPartitions").value should be <= probed.size.toLong
  }

  test("indexed probe agrees with the unindexed scan path") {
    val embs = spark.read.parquet(indexPath).select(col("vec_id"), col("embedding"))
    val indexed = Similarity.lshTopKIndexed(spark, indexPath, query, k = 5, bits = 4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val scanned = Similarity.lshTopK(embs, query, k = 5, bits = 4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    indexed shouldBe scanned
  }

  test("ANN recall: indexed probes overlap@10 >= 8 with brute force at sf0.01") {
    // the approximate paths must return (nearly) the same neighbors as the
    // exact scan, not just *some* 10 vectors — a probe reading the wrong
    // buckets would pass every pruning assertion and still be useless.
    //
    // Parameter sizing: the synthetic embeddings are near-random (the true
    // top-10 cosines are only ~0.26-0.37), which is LSH's adversarial case —
    // neighbor and non-neighbor angles barely differ, so per-table collision
    // rates are low and recall must come from table count. bits=4 follows
    // the documented log2(n / bucket_rows) rule for n=500; tables=4 gives
    // deterministic 10/10 overlap here (verified against a driver-side
    // replay of the plane family). Real embedding corpora (cosine >= 0.8
    // near-dup targets) get the same recall with far fewer probes.
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = embs.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val exact = Similarity.bruteForceTopK(embs, q, k = 10)
      .collect().map(_.getLong(0)).toSet

    val dir = Files.createTempDirectory("graft_ann_recall").toFile
    dir.deleteOnExit()
    val lshPath = dir.getAbsolutePath + "/lsh"
    val ivfPath = dir.getAbsolutePath + "/ivf"
    Similarity.buildLshIndex(embs, lshPath, bits = 4, tables = 4)
    Similarity.buildIvfIndex(embs, ivfPath)

    val lsh = Similarity.lshTopKIndexed(spark, lshPath, q, k = 10, bits = 4, tables = 4)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(spark, ivfPath, q, k = 10)
      .collect().map(_.getLong(0)).toSet

    withClue(s"LSH overlap@10 vs brute force (exact=$exact lsh=$lsh): ") {
      exact.intersect(lsh).size should be >= 8
    }
    withClue(s"IVF overlap@10 vs brute force (exact=$exact ivf=$ivf): ") {
      exact.intersect(ivf).size should be >= 8
    }
  }

  test("batch IVF probe at full nprobe equals the brute-force batch; fewer probes keep recall") {
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dir = Files.createTempDirectory("graft_ivf_batch").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/ivf"
    Similarity.buildIvfIndex(embs, path, k = 16)
    val queries = embs.filter(col("vec_id") < 6)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = embs.filter(col("vec_id") >= 6)
    val exact = Similarity.bruteForceTopKBatch(corpus, queries, k = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // probing every centroid = exhaustive: must match brute force row for row
    val all = Similarity.ivfTopKBatch(spark, path, queries, k = 8, nprobe = 16,
        corpusFilter = col("vec_id") >= 6)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    all shouldBe exact
    // a partial probe keeps high overlap on this adversarially random corpus
    val partial = Similarity.ivfTopKBatch(spark, path, queries, k = 8, nprobe = 8,
        corpusFilter = col("vec_id") >= 6)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    partial.intersect(exact).size should be >= (exact.size * 3) / 4
  }

  test("appendToIvfIndex ingests new vectors without a rebuild, exact at full probe") {
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val first = embs.filter(col("vec_id") % 2 === 0)
    val second = embs.filter(col("vec_id") % 2 === 1)
    val dir = Files.createTempDirectory("graft_ivf_append").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/ivf"
    Similarity.buildIvfIndex(first, path, k = 8)
    Similarity.appendToIvfIndex(second, path)
    // the appended index covers the FULL corpus: an exhaustive probe must
    // equal brute force over the union, old and new vectors alike
    val queries = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = embs.filter(col("vec_id") >= 4)
    val exact = Similarity.bruteForceTopKBatch(corpus, queries, k = 6)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val probed = Similarity.ivfTopKBatch(spark, path, queries, k = 6, nprobe = 8,
        corpusFilter = col("vec_id") >= 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    probed shouldBe exact
    // and the append reused the existing layout: centroid table unchanged,
    // rows landed in existing cid partitions
    spark.read.parquet(path + "__centroids").count() shouldBe 8L
    spark.read.parquet(path).count() shouldBe embs.count()

    // --- compaction: repeated appends accumulate one file per batch per
    // touched partition; compact collapses them with probes unchanged ---
    def dataFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(path))
    }
    Similarity.appendToIvfIndex(second.limit(0), path) // touch nothing (empty)
    val before = dataFiles().length
    before should be > 8 // 2+ batches over 8 partitions left > one file each
    Similarity.compactIvfIndex(spark, path)
    val after = dataFiles().length
    after should be < before
    after should be <= 8 // at most one file per cid at this tiny size
    // probe results identical through the rewrite: same rows, same top-k
    spark.read.parquet(path).count() shouldBe embs.count()
    spark.read.parquet(path + "__centroids").count() shouldBe 8L
    val probedAfter = Similarity.ivfTopKBatch(spark, path, queries, k = 6, nprobe = 8,
        corpusFilter = col("vec_id") >= 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    probedAfter shouldBe exact
  }

  test("versioned index catalog: pointer flips atomically, readers' files never move") {
    import graft.pipeline.IndexCatalog
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dir = Files.createTempDirectory("graft_ivf_versioned").toFile
    dir.deleteOnExit()
    val root = dir.getAbsolutePath + "/ivf"
    // unpublished root: resolve fails loudly, not with a phantom path
    an[IllegalStateException] should be thrownBy IndexCatalog.resolve(spark, root)
    val v1 = Similarity.buildIvfIndexVersioned(embs, root, k = 8)
    v1 shouldBe 1
    IndexCatalog.currentVersion(spark, root) shouldBe Some(1)
    val live1 = IndexCatalog.resolve(spark, root)
    val queries = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val before = Similarity.ivfTopKBatch(spark, live1, queries, k = 6, nprobe = 8,
        corpusFilter = col("vec_id") >= 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // compact publishes v2 WITHOUT touching v1's files (the race the
    // move-aside swap had): a reader still holding v1's path keeps working
    val v2 = Similarity.compactIvfIndexVersioned(spark, root)
    v2 shouldBe 2
    IndexCatalog.resolve(spark, root) should endWith("v=2")
    val stillV1 = Similarity.ivfTopKBatch(spark, live1, queries, k = 6, nprobe = 8,
        corpusFilter = col("vec_id") >= 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    stillV1 shouldBe before
    // the flipped version answers identically
    val viaV2 = Similarity.ivfTopKBatch(spark, IndexCatalog.resolve(spark, root),
        queries, k = 6, nprobe = 8, corpusFilter = col("vec_id") >= 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    viaV2 shouldBe before
    // one more cycle prunes v1 (bounded two-version footprint), keeps v2
    val v3 = Similarity.compactIvfIndexVersioned(spark, root)
    v3 shouldBe 3
    new java.io.File(IndexCatalog.versionDir(root, 1)).exists() shouldBe false
    new java.io.File(IndexCatalog.versionDir(root, 1) + "__centroids").exists() shouldBe false
    new java.io.File(IndexCatalog.versionDir(root, 2)).exists() shouldBe true
  }

  test("int8 quantization: bounded codes, tight reconstruction, high probe recall") {
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = Similarity.quantizeInt8(embs)
    // every code in [-127, 127]; the max-|component| of each vector maps to ±127
    val stats = q.select(
      expr("aggregate(codes, 127, (a, c) -> least(a, CAST(c AS INT)))").as("mn"),
      expr("aggregate(codes, -127, (a, c) -> greatest(a, CAST(c AS INT)))").as("mx"))
      .agg(min(col("mn")), max(col("mx"))).head()
    stats.getInt(0) should be >= -127
    stats.getInt(1) should be <= 127
    // reconstruction error <= scale/2 per component
    val maxErr = q.join(embs, Seq("vec_id"))
      .select(expr(
        "aggregate(zip_with(codes, embedding, (c, x) -> " +
          "abs(CAST(c AS DOUBLE) * scale - CAST(x AS DOUBLE)) / scale), 0.0D, " +
          "(a, e) -> greatest(a, e))").as("err"))
      .agg(max(col("err"))).head().getDouble(0)
    maxErr should be <= 0.5
    // zero vector: scale 1, all-zero codes (no NaN/0-division path)
    val z = Similarity.quantizeInt8(
      Seq((99L, Seq.fill(8)(0.0f))).toDF("vec_id", "embedding")).head()
    z.getDouble(1) shouldBe 1.0
    z.getSeq[Byte](2).forall(_ == 0) shouldBe true
    // a null code SLOT is invalid quantized data: the reconstruction goes
    // NULL instead of silently reading the slot as 0
    val nullSlot = Seq((1L, Seq[java.lang.Byte](1.toByte, null, 3.toByte), 0.5))
      .toDF("vec_id", "codes", "scale")
      .select(graft.functions.VectorFunctions.dequantizeInt8(col("codes"), col("scale")))
      .head()
    nullSlot.isNullAt(0) shouldBe true
    // asymmetric probe recall vs float32 brute force: int8 error is ~0.4%
    // relative, so the top-10 overlap stays high even on near-random cosines
    val qv = embs.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val exact = Similarity.bruteForceTopK(embs, qv, k = 10).select("vec_id")
      .as[Long].collect().toSet
    val viaInt8 = Similarity.int8TopK(Similarity.quantizeInt8(embs), qv, k = 10)
      .select("vec_id").as[Long].collect().toSet
    (exact & viaInt8).size should be >= 8
    viaInt8 should contain(0L) // the query's own (quantized) copy still ranks top
  }

  test("product quantization: codebook shape, code bounds, exact-copy ranking, recall") {
    import spark.implicits._
    // 4 well-separated axis clusters in 8-dim (the SemanticDedupSpec corpus
    // shape) — structure PQ's per-subspace quantizers can actually learn
    def vec(id: Long): Seq[Float] = {
      val axis = (id % 4).toInt
      val rnd = new scala.util.Random(id)
      Seq.tabulate(8)(d => (if (d == axis * 2) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.1f)
    }
    val base = (0L until 120L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val cbs = Similarity.learnPqCodebooks(base, m = 2, ksub = 8)
    cbs.length shouldBe 2
    cbs.foreach { cb => cb.length shouldBe 8; cb.foreach(_.length shouldBe 4) }
    val encoded = Similarity.encodePq(base, cbs)
    val bounds = encoded.select(
      expr("aggregate(codes, CAST(0 AS INT), (a, c) -> greatest(a, CAST(c AS INT)))").as("mx"),
      expr("aggregate(codes, CAST(0 AS INT), (a, c) -> least(a, CAST(c AS INT)))").as("mn"))
      .agg(max(col("mx")), min(col("mn"))).head()
    bounds.getInt(0) should be < 8
    bounds.getInt(1) should be >= 0
    // exact copies of vector 7 share its codes, so their ADC scores tie
    // BITWISE with vector 7's and with the top of the ranking — PQ's
    // lossiness cannot split identical codes. (They need not fill the
    // top-k: in this clustered corpus the whole cluster quantizes to the
    // same codes and the id tie-break favors low corpus ids — the
    // coarse-quantization regime working as designed.)
    val q7 = vec(7L)
    val copies = (0 until 5).map(i => (5000L + i, q7)).toDF("vec_id", "embedding")
    val scored = Similarity.pqTopK(
      Similarity.encodePq(base.union(copies), cbs), cbs, q7, k = 200)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s7 = scored(7L)
    (0 until 5).foreach(i => scored(5000L + i) shouldBe s7)
    scored.values.max shouldBe s7 // tied for first, never below
    // clustered recall: ADC top-10 against the float32 brute force
    val exact = Similarity.bruteForceTopK(base, q7, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val viaPq = Similarity.pqTopK(encoded, cbs, q7, k = 10)
      .select("vec_id").as[Long].collect().toSet
    (exact & viaPq).size should be >= 5
    // storage honesty: codes are m tinyints — the 32x story for 64-dim
    encoded.schema("codes").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType shouldBe org.apache.spark.sql.types.ByteType
  }

  test("IVF-PQ composes pruning with compression: full probe equals pqTopK, low probe prunes") {
    import spark.implicits._
    def vec(id: Long): Seq[Float] = {
      val axis = (id % 4).toInt
      val rnd = new scala.util.Random(id)
      Seq.tabulate(8)(d => (if (d == axis * 2) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.1f)
    }
    val base = (0L until 120L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivfpq").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/idx"
    Similarity.buildIvfPqIndex(base, path, k = 4, m = 2, ksub = 8)
    val q7 = vec(7L)
    // at FULL nprobe the cell pruning is a no-op and the result must equal
    // the flat pqTopK over the whole encoded corpus with the same
    // (deterministically re-learned) codebooks — pruning and compression
    // compose orthogonally
    val cbs = Similarity.learnPqCodebooks(base, m = 2, ksub = 8)
    val full = Similarity.ivfPqTopK(spark, path, q7, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val flat = Similarity.pqTopK(Similarity.encodePq(base, cbs), cbs, q7, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    full shouldBe flat
    // at nprobe 1 the scan reads strictly fewer cell directories than exist
    val pruned = Similarity.ivfPqTopK(spark, path, q7, k = 5, nprobe = 1)
    pruned.collect().length shouldBe 5
    val scan = findScan(pruned.queryExecution.executedPlan).get
    assert(scan.partitionFilters.nonEmpty, "cid probe must be a partition filter")
    def parquetFiles(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(parquetFiles).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    scan.metrics("numFiles").value should be < parquetFiles(new java.io.File(path))
  }

  test("IVF sample-based centroid learning keeps recall and index shape") {
    // the scale lever: Lloyd passes scan only a seeded sample while
    // assignment + write stay full-corpus. The index must still hold every
    // vector exactly once and keep brute-force-level recall.
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = embs.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val exact = Similarity.bruteForceTopK(embs, q, k = 10)
      .collect().map(_.getLong(0)).toSet

    val dir = Files.createTempDirectory("graft_ivf_sample").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/ivf"
    Similarity.buildIvfIndex(embs, path, learnFraction = 0.5)

    spark.read.parquet(path + "__centroids").count() shouldBe 16L
    spark.read.parquet(path).count() shouldBe embs.count()
    val ivf = Similarity.ivfTopK(spark, path, q, k = 10)
      .collect().map(_.getLong(0)).toSet
    withClue(s"sample-learned IVF overlap@10 vs brute force (exact=$exact ivf=$ivf): ") {
      exact.intersect(ivf).size should be >= 8
    }
  }

  test("IVF sample smaller than k falls back to full-corpus seeding") {
    import spark.implicits._
    val embs = (0L until 200L)
      .map(i => (i, Array.tabulate(16)(d => math.sin(i * 13.0 + d * 7.0).toFloat)))
      .toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivf_tiny_sample").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/ivf"
    // ~2 sampled rows < k=8 seeds: must not produce a degenerate quantizer
    Similarity.buildIvfIndex(embs, path, k = 8, iters = 1, learnFraction = 0.01)
    spark.read.parquet(path + "__centroids").count() shouldBe 8L
    spark.read.parquet(path).count() shouldBe 200L
  }

  test("IVF index finds the query vector through pruned partitions") {
    import spark.implicits._
    val embs = (0L until 200L)
      .map(i => (i, Array.tabulate(16)(d => math.sin(i * 13.0 + d * 7.0).toFloat)))
      .toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivf_test").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/ivf"
    Similarity.buildIvfIndex(embs, path, k = 8, iters = 2)

    // index layout: one directory per centroid, plus the centroid table
    val cidDirs = new java.io.File(path).listFiles().count(_.getName.startsWith("cid="))
    cidDirs should be > 1
    spark.read.parquet(path + "__centroids").count() shouldBe 8L

    val q = embs.filter(col("vec_id") === 42).head().getSeq[Float](1)
    val df = Similarity.ivfTopK(spark, path, q, k = 5, nprobe = 2)
    val rows = df.collect()
    rows.head.getLong(0) shouldBe 42L // the vector itself is in a probed list
    rows.head.getDouble(1) shouldBe (1.0 +- 1e-6)

    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.partitionFilters.nonEmpty, "cid filter must prune partitions")
    scan.metrics("numPartitions").value should be <= 2L
  }
}
