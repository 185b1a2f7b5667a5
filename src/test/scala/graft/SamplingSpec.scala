package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

class SamplingSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus = spark.range(0, 6000)
    .select(col("id").as("doc_id"),
      element_at(array(lit("en"), lit("de"), lit("fr")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("lang"))

  test("stratifiedSample keeps per-stratum fractions and is retry-stable") {
    val fractions = Map("en" -> 0.5, "de" -> 0.25)
    val sampled = Sampling.stratifiedSample(corpus, "doc_id", "lang", fractions, default = 0.1)
    val counts = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 docs per stratum; a 16-bit uniform hash lands within a few percent
    counts("en").toDouble shouldBe 1000.0 +- 120.0
    counts("de").toDouble shouldBe 500.0 +- 100.0
    counts("fr").toDouble shouldBe 200.0 +- 80.0 // default fraction
    // pure function of content: identical under repartition and rerun
    def ids(parts: Int) = Sampling
      .stratifiedSample(corpus.repartition(parts), "doc_id", "lang", fractions, default = 0.1)
      .select("doc_id").as[Long].collect().toSet
    ids(3) shouldBe ids(11)
  }

  test("fraction 1.0 keeps everything, 0.0 keeps nothing") {
    Sampling.stratifiedSample(corpus, "doc_id", "lang", Map.empty, default = 1.0)
      .count() shouldBe 6000L
    Sampling.stratifiedSample(corpus, "doc_id", "lang", Map("en" -> 1.0), default = 0.0)
      .select("lang").distinct().as[String].collect().toSeq shouldBe Seq("en")
  }

  test("quotaPerGroup returns exactly min(k, |group|) rows per group, deterministically") {
    val small = corpus.filter(col("lang") =!= "fr" || col("doc_id") < 30) // fr has 10 rows
    val quota = Sampling.quotaPerGroup(small, "doc_id", "lang", k = 50)
    val counts = quota.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts shouldBe Map("en" -> 50L, "de" -> 50L, "fr" -> 10L)
    def ids(parts: Int) = Sampling.quotaPerGroup(small.repartition(parts), "doc_id", "lang", 50)
      .select("doc_id").as[Long].collect().toSet
    ids(2) shouldBe ids(9)
  }

  test("quota of a hash-threshold prefilter equals quota of the full group") {
    // the documented scale remedy: stratifiedSample keeps exactly the
    // smallest hashes, so as long as >= k rows survive, the per-group
    // top-k-by-hash is unchanged
    val pre = Sampling.stratifiedSample(corpus, "doc_id", "lang", Map.empty, default = 0.2)
    pre.groupBy("lang").count().collect().foreach(_.getLong(1) should be >= 50L)
    val direct = Sampling.quotaPerGroup(corpus, "doc_id", "lang", k = 50)
      .select("doc_id").as[Long].collect().toSet
    val filtered = Sampling.quotaPerGroup(pre, "doc_id", "lang", k = 50)
      .select("doc_id").as[Long].collect().toSet
    filtered shouldBe direct
  }

  test("weighted sample: k per group, agg path equals the window form, retry-stable") {
    // weights 1..4 by residue; doc 17 gets weight 0 — never selectable
    val weighted = corpus.withColumn("w",
      when(col("doc_id") === 17, lit(0L)).otherwise(pmod(col("doc_id"), lit(4)) + 1))
    val out = Sampling.weightedSamplePerGroup(weighted, "doc_id", "lang", "w", k = 25)
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts shouldBe Map("en" -> 25L, "de" -> 25L, "fr" -> 25L)
    val ids = out.select("doc_id").as[Long].collect().toSet
    ids should not contain 17L
    // the bounded-aggregate selection must equal the reference window form
    val u = (Sampling.md5Uniform(col("doc_id")).cast("double") + lit(0.5)) / lit(65536.0)
    val key = round(log(u) / col("w").cast("double"), 9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("__k").desc, col("doc_id"))
    val windowed = weighted.filter(col("w") > 0).withColumn("__k", key)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 25)
      .select("doc_id").as[Long].collect().toSet
    ids shouldBe windowed
    // pure function of content: identical under repartition
    Sampling.weightedSamplePerGroup(weighted.repartition(7), "doc_id", "lang", "w", 25)
      .select("doc_id").as[Long].collect().toSet shouldBe ids
    // monotone in weight: boosting one unselected row's weight far enough
    // pulls it in (ln(u) < 0 shrinks toward 0 as w grows)
    val loser = corpus.select("doc_id").as[Long].collect()
      .filter(i => i % 3 == 0 && !ids.contains(i)).head
    val boosted = weighted.withColumn("w",
      when(col("doc_id") === loser, lit(1000000L)).otherwise(col("w")))
    Sampling.weightedSamplePerGroup(boosted, "doc_id", "lang", "w", 25)
      .select("doc_id").as[Long].collect().toSet should contain (loser)
  }

  test("budgetWaterfall: small groups keep everything, spillover fills the rest exactly") {
    def groups(spec: (String, Int)*) = spec.toSeq.flatMap { case (g, n) =>
      (0 until n).map(i => (g.hashCode.toLong * 10000 + i, g))
    }.toDF("doc_id", "grp")
    def takes(df: org.apache.spark.sql.DataFrame, b: Long) =
      Sampling.budgetWaterfall(df, "doc_id", "grp", b)
        .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 10/20/100 at B=60: 10 and 20 fit fully, the rest levels at 30
    takes(groups("a" -> 10, "b" -> 20, "c" -> 100), 60L) shouldBe
      Map("a" -> 10L, "b" -> 20L, "c" -> 30L)
    // 5/50/50 at B=60: level 27 with remainder 1 → first big group gets 28
    takes(groups("a" -> 5, "b" -> 50, "c" -> 50), 60L) shouldBe
      Map("a" -> 5L, "b" -> 28L, "c" -> 27L)
    // budget beyond the corpus: everything kept
    takes(groups("a" -> 3, "b" -> 4), 100L) shouldBe Map("a" -> 3L, "b" -> 4L)
    // budget below the smallest equal share: flat split, no group full
    takes(groups("a" -> 10, "b" -> 20, "c" -> 100), 9L) shouldBe
      Map("a" -> 3L, "b" -> 3L, "c" -> 3L)
    // membership is the quota draw: the selected subset of a group equals
    // quotaPerGroup at the same take (retry-stable by construction)
    val df = groups("a" -> 10, "b" -> 20, "c" -> 100)
    val viaWf = Sampling.budgetWaterfall(df, "doc_id", "grp", 60L)
      .filter(col("grp") === "c").select("doc_id").as[Long].collect().toSet
    val viaQuota = Sampling.quotaPerGroup(df.filter(col("grp") === "c"),
      "doc_id", "grp", 30).select("doc_id").as[Long].collect().toSet
    viaWf shouldBe viaQuota
    an[IllegalArgumentException] should be thrownBy
      Sampling.budgetWaterfall(df, "doc_id", "grp", 0L)
  }

  test("input validation") {
    an[IllegalArgumentException] should be thrownBy
      Sampling.stratifiedSample(corpus, "doc_id", "lang", Map("en" -> 1.5))
    an[IllegalArgumentException] should be thrownBy
      Sampling.quotaPerGroup(corpus, "doc_id", "lang", k = 0)
    an[IllegalArgumentException] should be thrownBy
      Sampling.weightedSamplePerGroup(corpus.withColumn("w", lit(1L)),
        "doc_id", "lang", "w", k = 0)
  }
}
