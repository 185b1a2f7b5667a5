package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** PageRank: hand-checked fixtures (cycle symmetry, dangling-mass
  * redistribution), the sum-to-1 invariant, and plan sanity.
  */
class PageRankSpec extends SparkTestBase {

  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("a cycle stays uniform at every iteration count") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    for (it <- Seq(1, 3, 5)) {
      val r = ranks(cycle, it)
      r.keySet shouldBe Set(1L, 2L, 3L)
      r.values.foreach(_ shouldBe (1.0 / 3.0) +- 1e-12)
    }
  }

  test("dangling mass is redistributed: the hand-computed star") {
    // 1 -> 3, 2 -> 3; vertex 3 dangles. After one iteration from uniform:
    //   dm = 1/3; v1 = v2 = 0.15/3 + 0.85·(0 + (1/3)/3) = 0.14444…
    //   v3 = 0.15/3 + 0.85·(2/3 + 1/9) = 0.71111…
    val r = ranks(Seq((1L, 3L), (2L, 3L)), iters = 1)
    r(1L) shouldBe (0.05 + 0.85 / 9.0) +- 1e-12
    r(2L) shouldBe r(1L)
    r(3L) shouldBe (0.05 + 0.85 * (2.0 / 3.0 + 1.0 / 9.0)) +- 1e-12
    r.values.sum shouldBe 1.0 +- 1e-12
  }

  test("ranks always sum to 1; self-loops and duplicate edges are legal") {
    // duplicate edges collapse; the self-loop keeps vertex 4 fed
    val g = Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 4L))
    for (it <- Seq(1, 2, 4)) {
      val r = ranks(g, it)
      r.values.sum shouldBe 1.0 +- 1e-12
      r.values.foreach(_ should be > 0.0)
    }
    // a hub pointed at by everything outranks its satellites
    val hub = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L))
    val hr = ranks(hub, 3)
    hr(9L) should be > hr(1L)
    hr(1L) should be > hr(2L) // 9 feeds 1; 2 and 3 get only teleport mass
    hr(2L) shouldBe hr(3L)
  }

  test("validation") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    an[IllegalArgumentException] should be thrownBy
      PageRank.pageRank(e, "src", "dst", iterations = 0)
    an[IllegalArgumentException] should be thrownBy
      PageRank.pageRank(e, "src", "dst", damping = 1.0)
  }
}
