package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.Compaction

class CompactionSpec extends SparkTestBase {

  import spark.implicits._

  private def docs = Tables.df(spark, "/root/testdata/sf0.01", "documents")

  private def partFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))

  test("file count follows the data volume, not the task count") {
    val srcBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    srcBytes should be > 0L
    // a tiny target forces a split; a huge target collapses to one file
    val nSmall = Compaction.targetPartitions(docs, targetBytes = srcBytes / 4 + 1)
    nSmall shouldBe 4 +- 1 // ceil division of the estimate
    Compaction.targetPartitions(docs, targetBytes = Long.MaxValue) shouldBe 1
    // many-partition input still lands on the computed count
    val spread = docs.repartition(16)
    val out = Files.createTempDirectory("graft_compact").toString
    Compaction.compact(spread, targetBytes = srcBytes / 2 + 1).write
      .mode("overwrite").parquet(out)
    partFiles(out).length shouldBe Compaction.targetPartitions(docs, srcBytes / 2 + 1)
  }

  test("compactByRange keeps rows clustered by the leading column") {
    val out = Files.createTempDirectory("graft_compact_range").toString
    Compaction.compactByRange(docs.repartition(16), targetBytes = 16 * 1024,
        cols = Seq(col("doc_id")))
      .write.mode("overwrite").parquet(out)
    val files = partFiles(out)
    files.length should be > 1
    // per-file id ranges must not overlap: sort files by their min id and
    // check each file's max < next file's min
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("doc_id"), max("doc_id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => hi should be < lo
      case _ =>
    }
  }

  test("the range-clustered layout makes a range scan skip row groups") {
    val out = Files.createTempDirectory("graft_compact_skip").toString
    Compaction.compactByRange(docs.repartition(16), targetBytes = 16 * 1024,
        cols = Seq(col("doc_id")))
      .write.mode("overwrite").parquet(out)
    val total = docs.count()
    val df = spark.read.parquet(out).filter(col("doc_id") < 25)
    df.collect().length shouldBe 25
    // the scan's own output-row metric: with disjoint per-file id ranges,
    // parquet row-group statistics exclude every non-matching file, so the
    // scan emits only the surviving group's rows — the data-skipping payoff
    // compactByRange exists for (round-robin compact() cannot give this:
    // every file spans the full id range)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    scan.metrics("numOutputRows").value should be < total / 2
  }

  test("input validation") {
    an[IllegalArgumentException] should be thrownBy
      Compaction.targetPartitions(docs, targetBytes = 0)
    an[IllegalArgumentException] should be thrownBy
      Compaction.compactByRange(docs, 1024, Nil)
  }
}
