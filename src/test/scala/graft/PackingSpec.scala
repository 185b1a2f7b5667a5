package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Packing

class PackingSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus = spark.range(0, 3000)
    .select(col("id").as("doc_id"), (pmod(col("id") * 37, lit(400)) + 1).as("n_tok"))

  test("offsets tile each shard's token stream exactly: no gaps, no overlaps") {
    val packed = Packing.packSequences(corpus, "doc_id", "n_tok", seqLen = 1024, shards = 4)
      .select("shard", "start_offset", "n_tok", "pack")
      .as[(Long, Long, Long, Long)].collect()
    packed.length shouldBe 3000
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.head._2 shouldBe 0L // every shard stream starts at token 0
      sorted.sliding(2).foreach {
        case Array((_, s1, t1, _), (_, s2, _, _)) => s2 shouldBe s1 + t1
        case _ =>
      }
    }
    // pack is exactly the start offset's seqLen bin, numbered within shard
    packed.foreach { case (_, off, _, pack) => pack shouldBe off / 1024 }
  }

  test("layout is a pure function of content: stable under repartition") {
    def layout(parts: Int) = Packing
      .packSequences(corpus.repartition(parts), "doc_id", "n_tok", 1024, 4)
      .select("doc_id", "shard", "pack", "start_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    layout(2) shouldBe layout(13)
  }

  test("shards are hash-balanced") {
    val counts = Packing.packSequences(corpus, "doc_id", "n_tok", 1024, 4)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    counts.keySet shouldBe Set(0L, 1L, 2L, 3L)
    counts.values.foreach(_.toDouble shouldBe 750.0 +- 120.0)
  }

  test("chunkDocuments tiles with overlap and a short tail") {
    // 10 tokens, chunk 4, overlap 1 → starts 0,3,6,9: [t0..t3][t3..t6][t6..t9][t9]
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Packing.chunkDocuments(docs, chunkTokens = 4, overlap = 1)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    chunks shouldBe Array(
      (0, "t0 t1 t2 t3", 4),
      (1, "t3 t4 t5 t6", 4),
      (2, "t6 t7 t8 t9", 4),
      (3, "t9", 1))
    // every token appears in some chunk; consecutive chunks share `overlap`
    chunks.flatMap(_._2.split(" ")).toSet shouldBe (0 until 10).map(i => s"t$i").toSet
    // a doc shorter than one chunk yields exactly one chunk: itself
    val short = Seq((2L, "a b")).toDF("doc_id", "text")
    Packing.chunkDocuments(short, 64, 16).collect()
      .map(r => (r.getInt(1), r.getString(2))) shouldBe Array((0, "a b"))
    an[IllegalArgumentException] should be thrownBy
      Packing.chunkDocuments(docs, chunkTokens = 4, overlap = 4)
  }

  test("input validation") {
    an[IllegalArgumentException] should be thrownBy
      Packing.packSequences(corpus, "doc_id", "n_tok", seqLen = 0, shards = 4)
    an[IllegalArgumentException] should be thrownBy
      Packing.packSequences(corpus, "doc_id", "n_tok", seqLen = 1024, shards = 0)
  }

  test("epochOrder is a dense per-shard permutation, stable under repartition") {
    val df = spark.range(0, 500).select(col("id").as("doc_id"))
    val out = Packing.epochOrder(df, "doc_id", epoch = 1, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    out.length shouldBe 500
    out.map(_._1).toSet shouldBe (0L until 500L).toSet            // every row, once
    out.groupBy(_._2).foreach { case (_, rows) =>                 // dense 1..n per shard
      rows.map(_._3).sorted shouldBe (1L to rows.length.toLong)
    }
    out.map(_._2).distinct.sorted shouldBe Seq(0, 1, 2, 3)        // all shards populated
    // pure function of (epoch, id): partitioning cannot move a row
    val again = Packing.epochOrder(df.repartition(13), "doc_id", epoch = 1, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    again shouldBe out.toSet
  }

  test("packTexts concatenates each pack's docs in layout order, stable under repartition") {
    val df = spark.range(0, 60).select(col("id").as("doc_id"),
      concat(lit("doc"), col("id")).as("text"), lit(10).as("n_tok"))
    val packs = Packing.packTexts(df, "doc_id", "text", "n_tok", seqLen = 40, shards = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // layout replay: the expected order is (md5(id), id) within each shard
    val layout = Packing.packSequences(
      df, "doc_id", "n_tok", seqLen = 40, shards = 2)
      .orderBy("shard", "start_offset")
      .collect().map(r => (r.getAs[Long]("shard"),
        r.getAs[Long]("start_offset"), r.getAs[String]("text")))
    val expected = layout.groupBy { case (sh, off, _) => (sh, off / 40) }
      .map { case (k, rows) => k ->
        ((rows.length.toLong, rows.length * 10L,
          rows.sortBy(_._2).map(_._3).mkString(" <eos> "))) }
    packs shouldBe expected
    // full packs hold exactly seqLen/10 docs; bytes identical on any input layout
    packs.values.count(_._1 == 4L) should be >= 10
    val again = Packing.packTexts(df.repartition(7), "doc_id", "text", "n_tok",
      seqLen = 40, shards = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(4))).toMap
    again shouldBe packs.map { case (k, v) => k -> v._3 }
  }

  test("takeTokenBudget keeps the per-shard prefix that starts inside the slice") {
    val df = spark.range(0, 400).select(col("id").as("doc_id"), lit(10).as("n_tok"))
    val out = Packing.takeTokenBudget(df, "doc_id", "n_tok",
      budgetTokens = 400, epoch = 0, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4)))
    // 100-token slice per shard, 10 tokens/doc → exactly 10 docs per shard
    out.length shouldBe 40
    out.groupBy(_._2).foreach { case (_, rows) =>
      rows.map(_._3).sorted shouldBe (1L to 10L)          // the prefix, dense
      rows.map(_._4).sorted shouldBe (0L until 10L).map(_ * 10)  // offsets tile
    }
    // a straddling doc is kept when it STARTS inside the slice: offsets are
    // what downstream pack-splitting consumes (the packSequences contract)
    val uneven = spark.range(0, 4).select(col("id").as("doc_id"), lit(70).as("n_tok"))
    val kept = Packing.takeTokenBudget(uneven, "doc_id", "n_tok",
      budgetTokens = 100, epoch = 0, shards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    kept.length shouldBe 2                                 // starts at 0 and 70
    kept.map(_._2).sorted shouldBe Array(0L, 70L)
    an[IllegalArgumentException] should be thrownBy
      Packing.takeTokenBudget(df, "doc_id", "n_tok", budgetTokens = 401, shards = 4)
    an[IllegalArgumentException] should be thrownBy
      Packing.takeTokenBudget(df, "doc_id", "n_tok", budgetTokens = 0, shards = 4)
  }

  test("epochOrder: different epochs give different permutations") {
    val df = spark.range(0, 300).select(col("id").as("doc_id"))
    def layout(e: Int) = Packing.epochOrder(df, "doc_id", epoch = e, shards = 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val e0 = layout(0)
    val e1 = layout(1)
    e0 should not equal e1          // a re-fold, not a relabel
    e0.keySet shouldBe e1.keySet    // over the same rows
    an[IllegalArgumentException] should be thrownBy
      Packing.epochOrder(df, "doc_id", epoch = -1, shards = 4)
    an[IllegalArgumentException] should be thrownBy
      Packing.epochOrder(df, "doc_id", epoch = 0, shards = 0)
  }
}
