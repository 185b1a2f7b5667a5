package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the values of the single
  * right row with the greatest `rightTs` ≤ `leftTs` in the same `key` group
  * (the "most recent prior observation" join of event/market/telemetry
  * pipelines — Spark has no native operator for it).
  *
  * Implemented by composition, not a custom exec (the preference order for
  * operators Spark lacks): both sides union into one stream tagged by
  * origin, and a single `last(_, ignoreNulls)` window over
  * (key, ts, origin) carries the latest right-side values forward into each
  * left row. That is ONE shuffle on `key` and a per-partition sort — no
  * join, no per-row range probe, no broadcast; it scales exactly like any
  * windowed aggregation and inherits AQE/skew handling on the shuffle.
  * Right rows order before left rows at equal timestamps, so a same-instant
  * observation is visible (ties = "≤", matching DuckDB/pandas ASOF
  * semantics).
  *
  * Left rows with no prior right row keep NULL matched columns (left-join
  * semantics). Matched columns are prefixed `asof_` — left columns with
  * that prefix would collide and are rejected.
  */
object AsOfJoin {

  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String): DataFrame = {
    val rightVals = right.columns.filterNot(c => c == key || c == rightTs).toSeq
    val asofCols = rightVals.map("asof_" + _)
    require(!left.columns.exists(asofCols.contains),
      s"left side already has asof_-prefixed columns: ${left.columns.filter(asofCols.contains).mkString(", ")}")

    val lu = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_left", lit(1))
    val ru = right.select(
      (col(key) +: col(rightTs).as("__asof_ts") +:
        rightVals.map(c => col(c).as("asof_" + c))): _*)
      .withColumn("__asof_left", lit(0))

    val w = Window.partitionBy(col(key))
      .orderBy(col("__asof_ts"), col("__asof_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    asofCols
      .foldLeft(lu.unionByName(ru, allowMissingColumns = true)) {
        case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .filter(col("__asof_left") === 1)
      .drop("__asof_ts", "__asof_left")
  }
}
