package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("pointInInterval equals the naive inequality join, including negatives") {
    // negative values exercise the floor-division bin arithmetic
    val points = Seq(-50L, -3L, 0L, 7L, 31L, 64L, 999L).toDF("p")
    val intervals = Seq(
      (1L, -60L, -40L), (2L, -5L, 5L), (3L, 0L, 100L),
      (4L, 30L, 31L), (5L, 200L, 300L), (6L, 7L, 7L)).toDF("iv_id", "s", "e")
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("p", "iv_id").as[(Long, Long)].collect().toSet
    for (binSize <- Seq(1L, 8L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", binSize)
        .select("p", "iv_id").as[(Long, Long)].collect().toSeq
      withClue(s"binSize=$binSize: ") {
        got.toSet shouldBe naive
        got.size shouldBe naive.size // no duplicate emissions either
      }
    }
  }

  test("intervalOverlap equals the naive join with each pair emitted exactly once") {
    val left = Seq((1L, 0L, 100L), (2L, 10L, 12L), (3L, -20L, -10L), (4L, 50L, 50L))
      .toDF("l_id", "ls", "le")
    val right = Seq((10L, 90L, 200L), (11L, -15L, 5L), (12L, 11L, 60L), (13L, 300L, 400L))
      .toDF("r_id", "rs", "re")
    val naive = left.crossJoin(right)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    naive should not be empty
    // binSize far below the spans forces intervals across MANY shared bins —
    // the canonical-bin claim must still emit each pair exactly once
    for (binSize <- Seq(2L, 16L, 512L)) {
      val got = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", binSize)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
      withClue(s"binSize=$binSize: ") {
        got.toSet shouldBe naive
        got.size shouldBe naive.size
      }
    }
  }

  test("the binned join plans as an equi join, not a nested loop") {
    val points = spark.range(0, 1000).select(col("id").as("p"))
    val intervals = spark.range(0, 1000)
      .select((col("id") * 3).as("s"), (col("id") * 3 + 40).as("e"))
    val plan = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", binSize = 32)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("input validation") {
    val a = Seq(1L).toDF("x"); val b = Seq((1L, 2L)).toDF("s", "e")
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(a, b, "x", "s", "e", binSize = 0)
    val clash = Seq((1L, 2L)).toDF("x", "e")
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(a, clash, "x", "x", "e", binSize = 8)
  }
}
