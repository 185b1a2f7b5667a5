package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.GapFill

class GapFillSpec extends SparkTestBase {

  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private def sparse = Seq(
    ("a", d("2024-01-01"), 10.0),
    ("a", d("2024-01-04"), 40.0), // 2-day gap
    ("b", d("2024-02-10"), 7.0)   // single-day key
  ).toDF("k", "day", "v")

  test("gapFillDaily manufactures exactly the missing days per key") {
    val dense = GapFill.gapFillDaily(sparse, "k", "day", Map("v" -> lit(0.0)))
      .as[(String, Date, Double)].collect().toSet
    dense shouldBe Set(
      ("a", d("2024-01-01"), 10.0),
      ("a", d("2024-01-02"), 0.0),
      ("a", d("2024-01-03"), 0.0),
      ("a", d("2024-01-04"), 40.0),
      ("b", d("2024-02-10"), 7.0))
  }

  test("no fill default leaves NULL; forwardFill then carries the last value") {
    val dense = GapFill.gapFillDaily(sparse, "k", "day")
    dense.filter(col("v").isNull).count() shouldBe 2
    val filled = GapFill.forwardFill(dense, "k", "day", Seq("v"))
      .as[(String, Date, Double)].collect().toSet
    filled shouldBe Set(
      ("a", d("2024-01-01"), 10.0),
      ("a", d("2024-01-02"), 10.0),
      ("a", d("2024-01-03"), 10.0),
      ("a", d("2024-01-04"), 40.0),
      ("b", d("2024-02-10"), 7.0))
  }

  test("forwardFill keeps NULL before a group's first observation") {
    val withLeading = Seq(
      ("a", 1L, None: Option[Double]),
      ("a", 2L, Some(5.0)),
      ("a", 3L, None)).toDF("k", "seq", "v")
    val filled = GapFill.forwardFill(withLeading, "k", "seq", Seq("v"))
      .orderBy("seq").as[(String, Long, Option[Double])].collect().toSeq
    filled.map(_._3) shouldBe Seq(None, Some(5.0), Some(5.0))
  }

  test("input validation") {
    an[IllegalArgumentException] should be thrownBy
      GapFill.gapFillDaily(sparse, "k", "day", Map("nope" -> lit(0)))
    an[IllegalArgumentException] should be thrownBy
      GapFill.forwardFill(sparse, "k", "day", Nil)
  }
}
