package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality reconnaissance step run
  * before any expensive pipeline stage (is this column all-null? how many
  * distinct languages? what's the id range?). Emits one row per profiled
  * column: row count, null count, exact distinct count, min and max
  * (rendered as strings so heterogeneous column types share one schema).
  *
  * Shape: a single wide aggregation computes every per-column statistic in
  * one scan (Catalyst expands the multiple `count(DISTINCT ...)`s into one
  * Expand-based aggregate — still one pass over the data), then a `stack`
  * pivots the single wide row into per-column rows INSIDE the plan — no
  * driver-side collect/reshape, so the operator composes into larger plans
  * and the scan stays distributed. Exact distinct counts shuffle the
  * expanded rows; at 100 TB swap `count_distinct` for
  * `approx_count_distinct` (HLL, map-side partials, no expansion) — same
  * output schema, ±2% counts.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(cols.forall(df.columns.contains), {
      val missing = cols.filterNot(df.columns.contains)
      s"columns not in frame: ${missing.mkString(", ")}"
    })
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // stack(n, name1, nn1, nd1, min1, max1, name2, ...) → one row per column
    val stackArgs = cols.flatMap { c =>
      Seq(s"'$c'", s"`__nn_$c`", s"`__nd_$c`", s"`__min_$c`", s"`__max_$c`")
    }
    wide.select(
      col("__n").as("n_rows"),
      expr(s"stack(${cols.size}, ${stackArgs.mkString(", ")}) " +
        "AS (col_name, __nn, n_distinct, min_val, max_val)"))
      .select(
        col("col_name"),
        col("n_rows"),
        (col("n_rows") - col("__nn")).as("n_nulls"),
        col("n_distinct"),
        col("min_val"),
        col("max_val"))
  }

  /** Top-k heaviest keys of a column with their frequencies — the skew
    * diagnosis run before choosing join/salting strategy (a key here with
    * millions of rows is the one [[graft.operators.SkewJoin]] exists for).
    * Plans as partial-agg + `TakeOrderedAndProject`: per-partition top-k
    * merged on the driver, never a global sort. Deterministic cut (count
    * desc, key asc as string).
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(keyCol).cast("string"))
      .limit(k)
  }
}
