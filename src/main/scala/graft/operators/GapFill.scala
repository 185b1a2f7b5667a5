package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — turn sparse per-key observations into a
  * dense, evenly spaced series (the prerequisite for windowed features,
  * trend models, and anything that assumes one row per key per period).
  * Two composable halves:
  *
  *   - [[gapFillDaily]] manufactures the missing rows: a per-key calendar
  *     spine from the key's first to last observation, left-joined with the
  *     data, absent periods taking caller-provided fill defaults (or NULL).
  *   - [[forwardFill]] carries the latest preceding non-null value into
  *     NULL slots ("last observation carried forward").
  *
  * Scale shape: the spine derives from a per-key min/max AGGREGATE (map-side
  * partials, no driver collect) and a `sequence` explode of that small
  * frame — spine size is rows-out, never rows-in; the join shuffles on
  * (key, date). `forwardFill` is one rank-window per key — the usual
  * per-key-window skew caveat applies (a key with a decade of seconds-level
  * data sorts on one task; coarsen the period or sub-shard by time range
  * first). Both are deterministic: no RNG, no timestamps-of-now.
  */
object GapFill {

  /** One row per key per DAY between that key's min and max `dateCol`
    * (a DateType column). Observed rows keep their values; manufactured
    * rows take `fills(col)` where provided and NULL otherwise.
    */
  def gapFillDaily(
      df: DataFrame,
      keyCol: String,
      dateCol: String,
      fills: Map[String, Column] = Map.empty): DataFrame = {
    val bad = fills.keySet.diff(df.columns.toSet - keyCol - dateCol)
    require(bad.isEmpty, s"fills for absent/key/date columns: ${bad.mkString(", ")}")
    val spine = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day"))).as(dateCol))
    val joined = spine.join(df, Seq(keyCol, dateCol), "left")
    fills.foldLeft(joined) { case (d, (c, f)) =>
      d.withColumn(c, coalesce(col(c), f))
    }
  }

  /** Replace NULLs in each of `cols` with the latest preceding non-null
    * value within the `keyCol` group ordered by `orderCol`. Rows before a
    * group's first non-null keep NULL (compose with a `fills` default in
    * [[gapFillDaily]] when a leading value is required).
    */
  def forwardFill(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(cols.forall(df.columns.contains),
      s"columns not in frame: ${cols.filterNot(df.columns.contains).mkString(", ")}")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }
}
