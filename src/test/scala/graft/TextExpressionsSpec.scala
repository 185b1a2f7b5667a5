package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.pipeline.Dedup

/** Unit specs for the native dedup expressions (TextExpressions.scala) —
  * the hot path of every near-dup operator, exercised here through real
  * DataFrame plans so the codegen path (references-array call) is what runs.
  */
class TextExpressionsSpec extends SparkTestBase {

  import spark.implicits._

  private def tokensOf(s: String) = split(lower(lit(s)), " ")

  test("sha1Base32Digest mirrors WarcSink.sha1Base32 through codegen, null-safe") {
    import graft.functions.TextFunctions
    val rnd = new scala.util.Random(41)
    val blob = new Array[Byte](777)
    rnd.nextBytes(blob)
    val rows = Seq(Some("x".getBytes("UTF-8")), Some(Array.empty[Byte]), Some(blob), None)
    val got = rows.toDF("b")
      .select(TextFunctions.sha1Base32Digest(col("b"))).as[Option[String]].collect()
    got.toSeq shouldBe rows.map(_.map(b => "sha1:" + graft.sources.WarcSink.sha1Base32(b)))
    // the canonical empty-payload digest, through the expression path too
    got(1) shouldBe Some("sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
  }

  test("shingleHashes output is ascending-sorted and distinct") {
    // repeated trigrams ("a b c" appears 3 times) must collapse
    val text = "a b c a b c a b c d e"
    val out = spark.range(1)
      .select(shingleHashes(tokensOf(text), 3).as("sh"))
      .head().getSeq[Long](0)
    out shouldBe out.sorted
    out.distinct.size shouldBe out.size
    // 9 shingle positions, but "a b c" x3 and "b c a"/"c a b" x2 each
    out.size shouldBe 5
  }

  test("shingleHashes is empty below shingle size and stable for equal input") {
    val short = spark.range(1).select(shingleHashes(tokensOf("a b"), 3)).head().getSeq[Long](0)
    short shouldBe empty
    val a = spark.range(1).select(shingleHashes(tokensOf("x y z w"), 3)).head().getSeq[Long](0)
    val b = spark.range(1).select(shingleHashes(tokensOf("x y z w"), 3)).head().getSeq[Long](0)
    a shouldBe b
  }

  test("jaccardSorted matches a naive set computation on random arrays") {
    val rnd = new Random(7)
    val cases = Seq.tabulate(50) { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).distinct.sorted
      (a, b)
    }
    val got = cases.toDF("a", "b")
      .select(jaccardSorted(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), j) =>
      val sa = a.toSet; val sb = b.toSet
      val expected =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      j shouldBe expected +- 1e-12
    }
  }

  test("jaccardSorted fails loud on unsorted input instead of under-counting") {
    // the merge is only correct on sorted-distinct arrays; feeding it the
    // output of a different producer must error on the visited prefix, not
    // silently score wrong (the check is best-effort: elements past the
    // point where one side is exhausted are never read)
    val err = intercept[Exception] {
      Seq((Seq(1L, 5L, 3L), Seq(1L, 3L, 9L))).toDF("a", "b")
        .select(jaccardSorted(col("a"), col("b"))).collect()
    }
    err.getMessage should include("ascending-sorted")
  }

  test("dedup expressions reject wrong input types at analysis time") {
    // array<string> where array<long> is expected → AnalysisException from
    // ExpectsInputTypes, not a ClassCastException mid-stage
    val bad = Seq((Seq("a", "b"), Seq("a"))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(jaccardSorted(col("a"), col("b"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(signatureAgreement(col("a"), col("b"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(bandHashes(col("a"), 2)).collect()
    }
  }

  test("simhash64 SWAR lane counting is bit-equal to the per-bit vote loop") {
    // the r21 SWAR form counts ones in eight 8-bit lanes flushed every 255
    // tokens; this replays the original per-bit ±1 vote loop over token
    // lists that cross the lane-flush boundary (255/256/511 tokens), empty
    // and single-token docs, and duplicate-heavy content
    val rng = new scala.util.Random(7)
    def refSimhash(tokens: Seq[String]): Long = {
      val votes = new Array[Int](64)
      tokens.foreach { t =>
        val h = {
          // FNV-1a + mix, the TextHashing construction
          val bytes = t.getBytes("UTF-8")
          var x = 0xcbf29ce484222325L
          bytes.foreach(b => x = (x ^ (b & 0xffL)) * 0x100000001b3L)
          var y = x + 0x9e3779b97f4a7c15L
          y = (y ^ (y >>> 30)) * 0xbf58476d1ce4e5b9L
          y = (y ^ (y >>> 27)) * 0x94d049bb133111ebL
          y = y ^ (y >>> 31)
          y
        }
        (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      (0 until 64).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val docs = Seq(0, 1, 2, 254, 255, 256, 511, 600).map { n =>
      Seq.tabulate(n)(i => s"w${rng.nextInt(40)}_$i")
    } :+ Seq.fill(300)("dup")
    val got = docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      .toDF("doc_id", "tokens")
      .select(col("doc_id"), simhash64(col("tokens")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.zipWithIndex.foreach { case (ts, i) =>
      withClue(s"doc $i (${ts.length} tokens): ") {
        got(i.toLong) shouldBe refSimhash(ts)
      }
    }
  }

  test("signatureAgreement counts equal positions and rejects length mismatch") {
    val agree = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 7L))).toDF("a", "b")
      .select(signatureAgreement(col("a"), col("b"))).head().getDouble(0)
    agree shouldBe 0.5 +- 1e-12

    // constant-folded literals throw driver-side (IllegalArgumentException);
    // executor-side the same require surfaces wrapped in a SparkException
    val err = intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
        .select(signatureAgreement(col("a"), col("b"))).collect()
    }
    err.getMessage should include("signature lengths differ")
  }

  test("bandHashes: equal signatures give equal bands; band count and locality hold") {
    val sig = Seq.tabulate(16)(i => (i * 37 + 5).toLong)
    val rows = Seq(Tuple1(sig), Tuple1(sig), Tuple1(sig.updated(15, 999L))).toDF("sig")
      .select(bandHashes(col("sig"), 4).as("bands"))
      .collect().map(_.getSeq[Long](0))
    rows(0).size shouldBe 4
    rows(0) shouldBe rows(1)
    // only the run containing the changed position may differ
    rows(0).take(3) shouldBe rows(2).take(3)
    rows(0)(3) should not be rows(2)(3)
  }

  test("simhashBucketKeys: equal hashes share all keys; pairs within budget share a key") {
    val maxHamming = 3
    val keysOf = (sh: Long) =>
      Seq(Tuple1(sh)).toDF("sh")
        .select(simhashBucketKeys(col("sh"), maxHamming)).head().getSeq[Long](0)
    val base = 0x0123456789abcdefL
    keysOf(base) shouldBe keysOf(base)
    keysOf(base).size shouldBe (maxHamming + 1) * (maxHamming + 1)
  }

  test("simhashBucketKeys planted recall: no pair within maxHamming=3 is lost") {
    // 200 random simhashes, each paired with a copy perturbed in <= 3 bit
    // positions; the two-level pigeonhole guarantees >= 1 shared bucket key
    // for EVERY such pair — recall must be exactly 100%, not probabilistic.
    val maxHamming = 3
    val rnd = new Random(42)
    val pairs = Seq.tabulate(200) { _ =>
      val sh = rnd.nextLong()
      val flips = rnd.nextInt(maxHamming + 1)
      val perturbed = (0 until flips).foldLeft(sh)((h, _) => h ^ (1L << rnd.nextInt(64)))
      (sh, perturbed)
    }
    val shared = pairs.toDF("a", "b")
      .select(
        arrays_overlap(
          simhashBucketKeys(col("a"), maxHamming),
          simhashBucketKeys(col("b"), maxHamming)).as("shared"))
      .collect().map(_.getBoolean(0))
    all(shared) shouldBe true
  }

  test("simhash pair search through Dedup recovers every planted near-copy") {
    // end-to-end over the wired operator: docs plus copies that simhash
    // within the budget (identical text => hamming 0) must all pair up.
    val docs = (0 until 40).map(i => (i.toLong, s"sentence number $i with shared words " +
      s"alpha beta gamma delta epsilon zeta eta theta iota kappa ${i % 7}"))
    val planted = docs.take(20).map { case (id, t) => (id + 1000L, t) }
    val df = (docs ++ planted).toDF("doc_id", "text")
    val found = Dedup.simhashPairs(df, maxHamming = 3)
      .filter(col("id_a") < 20 && col("id_b") === col("id_a") + 1000L)
      .count()
    found shouldBe 20
  }

  test("dedup operators leave no persisted RDDs after clearCaches") {
    // assert on the DELTA this test creates, not global emptiness — the
    // session is shared across suites and the ContextCleaner reclaims
    // dropped frames asynchronously, so globals race with other suites
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (0 until 30).map(i => (i.toLong, s"document text body $i one two three four five"))
      .toDF("doc_id", "text")
    Dedup.minhashPairs(df, threshold = 0.5).count()
    Dedup.ngramJaccardPairs(df, threshold = 0.3).count()
    (spark.sparkContext.getPersistentRDDs.keySet -- before) should not be empty
    Dedup.clearCaches()
    (spark.sparkContext.getPersistentRDDs.keySet -- before) shouldBe empty
  }

  test("connectedComponents checkpoint blocks survive clearCaches, die on clearCheckpoints") {
    // a 6-node chain: two propagation rounds minimum, so intermediate-round
    // blocks exist and must have been freed eagerly inside the loop
    val pairs = (0L until 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // delta-scoped assertions (shared session — see the clearCaches test)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // checkpoint-block lifecycle is a distributed-loop contract — pin it
    // (the small-graph driver finish holds no blocks at all)
    val cc = Dedup.connectedComponents(pairs, driverFinishEdges = 0L)
    cc.count() shouldBe 6
    // only the final round's checkpoint blocks remain registered
    (spark.sparkContext.getPersistentRDDs.keySet -- before) should not be empty
    // a routine signature-cache clear must NOT invalidate the live CC frame
    Dedup.clearCaches()
    (spark.sparkContext.getPersistentRDDs.keySet -- before) should not be empty
    cc.agg(min(col("component"))).head().getLong(0) shouldBe 0L
    // the destructive clear is what frees the RDD-level checkpoint storage
    Dedup.clearCheckpoints()
    (spark.sparkContext.getPersistentRDDs.keySet -- before) shouldBe empty
  }

  test("unicodeNormalize composes NFC, folds NFKC compat forms, skips ASCII untouched") {
    import graft.functions.{TextFunctions, UnicodeNormalize}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def viaDf(s: String, form: String): String =
      spark.range(1).select(TextFunctions.unicodeNormalize(lit(s), form).as("t"))
        .head().getString(0)
    // decomposed e + combining acute composes to one code point under NFC
    viaDf("café", "NFC") shouldBe "café"
    viaDf("café", "NFD") shouldBe "café"
    // NFKC folds compatibility variants: ligature fi, fullwidth 1
    viaDf("ﬁle １", "NFKC") shouldBe "file 1"
    // NFC leaves compatibility forms alone
    viaDf("ﬁ", "NFC") shouldBe "ﬁ"
    // already-normal input returns the SAME UTF8String — the zero-copy
    // fast path the ASCII-dominated corpus rides
    val in = UTF8String.fromString("plain ascii")
    UnicodeNormalize(Literal("x"), "NFC").compute(in) should be theSameInstanceAs in
    // bad form name fails at construction, not per row
    an[IllegalArgumentException] should be thrownBy UnicodeNormalize(Literal("x"), "NFX")
    // SQL registration, DuckDB-parity name
    spark.sql("SELECT nfkc_normalize('ﬁle １') AS t").head().getString(0) shouldBe "file 1"
    spark.sql("SELECT nfc_normalize(NULL) AS t").head().isNullAt(0) shouldBe true
  }
}
