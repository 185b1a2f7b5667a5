package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Profile

class ProfileSpec extends SparkTestBase {

  import spark.implicits._

  private def frame = Seq(
    (1L, Some("alpha"), Some(10)),
    (2L, Some("beta"), None),
    (3L, None, Some(30)),
    (4L, Some("alpha"), Some(30))
  ).toDF("id", "name", "score")

  test("per-column rows carry counts, nulls, distincts, and string min/max") {
    val rows = Profile.profile(frame, Seq("id", "name", "score"))
      .collect().map(r => r.getString(0) -> r).toMap
    rows.keySet shouldBe Set("id", "name", "score")
    rows.values.foreach(_.getLong(1) shouldBe 4L) // n_rows
    rows("id").getLong(2) shouldBe 0L // n_nulls
    rows("name").getLong(2) shouldBe 1L
    rows("score").getLong(2) shouldBe 1L
    rows("id").getLong(3) shouldBe 4L // n_distinct (non-null values)
    rows("name").getLong(3) shouldBe 2L
    rows("score").getLong(3) shouldBe 2L
    (rows("name").getString(4), rows("name").getString(5)) shouldBe ("alpha", "beta")
    (rows("score").getString(4), rows("score").getString(5)) shouldBe ("10", "30")
  }

  test("approx variant keeps the same schema and exact-by-construction stats") {
    val approx = Profile.profile(frame, Seq("id"), exact = false)
    approx.columns.toSeq shouldBe
      Seq("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
    val r = approx.collect().head
    r.getLong(1) shouldBe 4L
    r.getLong(2) shouldBe 0L // null count is exact regardless of the distinct sketch
  }

  test("input validation") {
    an[IllegalArgumentException] should be thrownBy Profile.profile(frame, Nil)
    an[IllegalArgumentException] should be thrownBy Profile.profile(frame, Seq("nope"))
  }
}
