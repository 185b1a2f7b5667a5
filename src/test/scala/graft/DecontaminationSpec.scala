package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Decontamination

class DecontaminationSpec extends SparkTestBase {

  import spark.implicits._

  private val evalDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  private val train = Seq(
    // contains "the quick brown fox jumps" and 4 more eval 5-grams
    (1L, "prefix words the quick brown fox jumps over the lazy dog suffix"),
    (2L, "completely different sentence about cooking pasta with olive oil"),
    (3L, "THE QUICK BROWN FOX JUMPS elsewhere"), // case-insensitive hit
    (4L, "too short")                            // < 5 words: no shingles
  ).toDF("doc_id", "text")

  test("contaminationReport counts distinct shared shingles per train doc") {
    val report = Decontamination
      .contaminationReport(train, evalDocs, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    // eval has 5 shingles; doc 1 embeds the full eval text → all 5 shared
    report shouldBe Map(1L -> 5L, 3L -> 1L)
  }

  test("dropContaminated removes flagged docs and keeps the rest") {
    val clean = Decontamination
      .dropContaminated(train, evalDocs, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    clean shouldBe Set(2L, 4L)
    // a lenient threshold keeps the single-shingle overlap
    val lenient = Decontamination
      .dropContaminated(train, evalDocs, "doc_id", "text", n = 5, maxShared = 1L)
      .select("doc_id").as[Long].collect().toSet
    lenient shouldBe Set(2L, 3L, 4L)
  }

  test("hashed-shingle variant matches the exact report") {
    val docs = Tables.df(spark, "/root/testdata/sf0.001", "documents")
    val exact = Decontamination.contaminationReport(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
        "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    val hashed = Decontamination.contaminationReport(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
        "doc_id", "text", n = 5, hashed = true)
      .as[(Long, Long)].collect().toMap
    hashed shouldBe exact
  }

  test("input validation") {
    an[IllegalArgumentException] should be thrownBy
      Decontamination.contaminationReport(train, evalDocs, "doc_id", "text", n = 0)
  }
}
