package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Property check for the binning rewrite: for ANY point/interval multiset
  * (negative values, empty and inverted intervals, duplicates) and ANY
  * positive bin size, the binned joins return exactly the naive
  * inequality-join result with no duplicate emissions. Correctness must be
  * independent of `binSize` — only performance may vary.
  */
object RangeJoinProps extends Properties("RangeJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkTestBase.session

  private val genPoints = Gen.listOfN(30, Gen.choose(-100L, 100L))
  // spans up to 60 so intervals cross several small bins; inverted (e < s)
  // intervals are legal input and simply match nothing
  private val genIntervals = Gen.listOfN(20, for {
    s <- Gen.choose(-100L, 100L)
    span <- Gen.choose(-5L, 60L)
  } yield (s, s + span))
  private val genBin = Gen.oneOf(1L, 2L, 7L, 32L, 1000L)

  property("pointInInterval == naive filter, exactly once, for any binSize") =
    Prop.forAll(genPoints, genIntervals, genBin) { (ps, ivs, bin) =>
      import spark.implicits._
      val points = ps.toDF("p")
      val intervals = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("iv_id", "s", "e")
      val naive = points.crossJoin(intervals)
        .filter(col("p") >= col("s") && col("p") <= col("e"))
        .select("p", "iv_id").as[(Long, Long)].collect().sorted.toSeq
      val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", bin)
        .select("p", "iv_id").as[(Long, Long)].collect().sorted.toSeq
      got == naive
    }

  property("intervalOverlap == naive filter, exactly once, for any binSize") =
    Prop.forAll(genIntervals, genIntervals, genBin) { (ls, rs, bin) =>
      import spark.implicits._
      val left = ls.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("l_id", "ls", "le")
      val right = rs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("r_id", "rs", "re")
      val naive = left.crossJoin(right)
        .filter(col("ls") <= col("re") && col("rs") <= col("le"))
        .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
      val got = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", bin)
        .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
      got == naive
    }
}
