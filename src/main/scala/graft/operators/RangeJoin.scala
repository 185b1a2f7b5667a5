package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range joins — point-in-interval and interval-overlap — for
  * predicates Spark's planner cannot turn into an equi join. A plain
  * `a.join(b, a("p") >= b("s") && a("p") <= b("e"))` plans as
  * BroadcastNestedLoopJoin (or CartesianProduct with both sides large):
  * every row compared against every row, O(|a|·|b|) — the first thing that
  * dies at 100 TB.
  *
  * The fix is the classic binning rewrite (the same idea behind interval
  * trees and Sedona/Geospark grid joins, specialized to 1-D): quantize the
  * domain into fixed-width bins, explode each interval into the bins it
  * touches, map each point to its one bin, and equi-join ON THE BIN with
  * the exact range predicate kept as a residual filter. Catalyst then
  * plans a shuffled hash / sort-merge join on `__bin`: cost drops to
  * O(|a| + |b| + candidates), it partitions across the cluster on the bin
  * key, and AQE skew-splitting applies to hot bins. Correctness does not
  * depend on `binSize` — only performance does: choose it near the TYPICAL
  * interval span, so each interval explodes into ~2 bins (an interval
  * spanning k bins is replicated k times; a binSize far below the span
  * multiplies the build side, far above it degrades toward one giant bin).
  *
  * Both operators work on a LONG domain — callers map dates/timestamps to
  * epoch days/seconds first (exact integer bin arithmetic; no double
  * rounding at large magnitudes). Column sets of the two inputs must be
  * disjoint; the helper `__bin` column never escapes.
  */
object RangeJoin {

  /** Floor-division bin id — exact on negatives too ((c - pmod) / b),
    * unlike a double `floor(c / b)` at large magnitudes.
    */
  private def binOf(c: Column, binSize: Long): Column =
    ((c - pmod(c, lit(binSize))) / lit(binSize)).cast("long")

  /** Rows of `points` × `intervals` where
    * `points(pointCol)` ∈ [`intervals(startCol)`, `intervals(endCol)`]
    * (inclusive both ends). Returns all columns of both inputs.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must have disjoint column names")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "__bin is reserved by RangeJoin")
    val p = points.withColumn("__bin", binOf(col(pointCol), binSize))
    val iv = intervals.withColumn("__bin",
      explode(sequence(binOf(col(startCol), binSize), binOf(col(endCol), binSize))))
    p.join(iv, p("__bin") === iv("__bin") &&
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Rows of `left` × `right` where [`lStart`,`lEnd`] overlaps
    * [`rStart`,`rEnd`] (closed intervals: `lStart <= rEnd && rStart <=
    * lEnd`). Each qualifying pair is emitted EXACTLY ONCE even when the
    * two intervals share several bins: the pair is claimed only by the
    * canonical bin containing `greatest(lStart, rStart)` — a pure
    * per-pair predicate, so no post-join `distinct` (a full extra
    * shuffle over the candidate set) is needed.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left and right must have disjoint column names")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "__bin is reserved by RangeJoin")
    val l = left.withColumn("__bin",
      explode(sequence(binOf(col(lStart), binSize), binOf(col(lEnd), binSize))))
    val r = right.withColumn("__bin",
      explode(sequence(binOf(col(rStart), binSize), binOf(col(rEnd), binSize))))
    l.join(r, l("__bin") === r("__bin") &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        l("__bin") === binOf(greatest(col(lStart), col(rStart)), binSize))
      .drop("__bin")
  }
}
