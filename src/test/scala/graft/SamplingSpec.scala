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

  test("input validation") {
    an[IllegalArgumentException] should be thrownBy
      Sampling.stratifiedSample(corpus, "doc_id", "lang", Map("en" -> 1.5))
    an[IllegalArgumentException] should be thrownBy
      Sampling.quotaPerGroup(corpus, "doc_id", "lang", k = 0)
  }
}
