package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.Jsonl

/** Lossless JSONL ingestion: every line lands in clean XOR quarantine. */
class JsonlSpec extends SparkTestBase {

  test("readWithQuarantine routes every line to exactly one side") {
    val dir = Files.createTempDirectory("graft_jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "good row"}""",
      """{"doc_id": 2, "text": "also good"}""",
      """{"doc_id": 3 "text": "missing comma"}""",     // malformed JSON
      """not json at all""",
      """{"doc_id": "not a number", "text": "type mismatch"}""")
    Files.write(dir.resolve("part0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    try {
      val (clean, quarantine) = Jsonl.readWithQuarantine(
        spark, dir.toString, schema)
      val good = clean.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      good shouldBe Array((1L, "good row"), (2L, "also good"))
      clean.columns.toSeq shouldBe Seq("doc_id", "text")   // no corrupt column leak
      // the offending lines survive byte-for-byte for triage/reprocessing
      val bad = quarantine.collect().map(_.getString(0)).toSet
      bad shouldBe lines.drop(2).toSet
      // lossless: clean + quarantine = input lines
      good.length + bad.size shouldBe lines.length
      an[IllegalArgumentException] should be thrownBy
        Jsonl.readWithQuarantine(spark, dir.toString,
          schema.add(Jsonl.CorruptCol, StringType))
    } finally {
      graft.pipeline.Dedup.clearCaches()
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.delete(p); () })
    }
  }
}
