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
  * semantics). Matched columns come from THE single nearest right row,
  * carried as one struct — a genuine null value in the matched row stays
  * null (it never resurrects an older row's value, and a match can never
  * mix columns from different right rows). Matched columns are prefixed
  * `asof_` — left columns with that prefix would collide and are rejected.
  *
  * The window partitions by key alone, so ONE pathologically hot key
  * serializes onto one task; [[asofJoinBackwardSalted]] is the remedy
  * (differential salting, result-equal by construction).
  */
object AsOfJoin {

  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String): DataFrame =
    asofJoinBackwardSalted(left, right, key, leftTs, rightTs, hot = Nil)

  /** Forward as-of join: the mirror of [[asofJoinBackward]] — for each left
    * row, the values of the single right row with the SMALLEST `rightTs` ≥
    * `leftTs` in the same key group (the "next observation at or after"
    * join: next price tick after an order, next sensor reading after an
    * alarm). Same one-shuffle windowed composition, traversed in
    * descending timestamp order; ties are visible (= "≥", matching DuckDB
    * `ASOF ... ON l.ts <= r.ts`).
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String): DataFrame =
    asofJoinForwardSalted(left, right, key, leftTs, rightTs, hot = Nil)

  /** [[asofJoinForward]] with hot-key salting — see
    * [[asofJoinBackwardSalted]] for the mechanism and trade-offs (identical
    * here; only the traversal direction differs).
    */
  def asofJoinForwardSalted(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      hot: Seq[Any],
      buckets: Int = 16): DataFrame =
    asofJoinSalted(left, right, key, leftTs, rightTs, hot, buckets, forward = true)

  /** [[asofJoinBackward]] with the listed `hot` keys salted across `buckets`
    * window sub-partitions — the remedy for the plain operator's skew
    * caveat (one dominant key serializes its whole history onto one task).
    *
    * Differential, like [[SkewJoin]]: a hot key's LEFT rows are spread over
    * `buckets` sub-keys ([[SkewJoin.contentSalt]] — a pure function of row
    * content, stable under stage retry), while its RIGHT rows
    * replicate into every sub-key — each left row still sees its key's
    * complete prior history, so the result is row-for-row equal to the
    * unsalted operator (spec-asserted). Cold keys pay nothing (salt 0, no
    * replication). The trade is the as-of-specific one: right-side rows of
    * hot keys shuffle `buckets`× — right-sparse/left-heavy hot keys (the
    * common telemetry shape: one noisy emitter, slow-changing reference
    * data) split almost for free, while a right-heavy hot key caps the win
    * at duplicating its history per sub-task.
    *
    * Detect hot keys with [[SkewJoin.hotKeys]] on the left side (bounded by
    * its `maxKeys` contract), or pass them from domain knowledge.
    */
  def asofJoinBackwardSalted(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      hot: Seq[Any],
      buckets: Int = 16): DataFrame =
    asofJoinSalted(left, right, key, leftTs, rightTs, hot, buckets, forward = false)

  private def asofJoinSalted(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      hot: Seq[Any],
      buckets: Int,
      forward: Boolean): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val rightVals = right.columns.filterNot(c => c == key || c == rightTs).toSeq
    if (rightVals.isEmpty) return left // nothing to attach
    val asofCols = rightVals.map("asof_" + _)
    require(!left.columns.exists(asofCols.contains),
      s"left side already has asof_-prefixed columns: ${left.columns.filter(asofCols.contains).mkString(", ")}")
    require(!left.columns.contains("__asof_row"),
      "__asof_row is reserved by the as-of join")

    val isHot = col(key).isin(hot: _*)
    // content-hash salt ([[SkewJoin.contentSalt]]): pure function of row
    // content, so fetch-failure recomputes re-derive identical routing
    val leftSalt =
      if (hot.isEmpty) lit(0)
      else when(isHot, SkewJoin.contentSalt(left, buckets)).otherwise(lit(0))
    val rightSalts =
      if (hot.isEmpty) array(lit(0))
      else when(isHot, lit((0 until buckets).toArray)).otherwise(array(lit(0)))

    val lu = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_left", lit(1))
      .withColumn("__asof_salt", leftSalt)
    // the matched right row travels as ONE struct, so the carry-forward
    // attaches THE nearest right row wholesale: a genuine NULL in that
    // row's value stays null (per-column last(ignoreNulls) used to
    // resurrect an OLDER row's value under it — and could even stitch a
    // match from DIFFERENT right rows column by column, which no ASOF
    // semantics anywhere permit). One window expression instead of one
    // per value column, too.
    val ru = right.select(
      col(key), col(rightTs).as("__asof_ts"),
      struct(rightVals.map(col): _*).as("__asof_row"))
      .withColumn("__asof_left", lit(0))
      .withColumn("__asof_salt", explode(rightSalts))

    // backward walks timestamps ascending (latest prior value wins);
    // forward walks them descending (earliest later value wins). Right rows
    // order before left rows at equal ts either way, so same-instant
    // observations are visible in both directions.
    val tsOrder = if (forward) col("__asof_ts").desc else col("__asof_ts").asc
    val w = Window.partitionBy(col(key), col("__asof_salt"))
      .orderBy(tsOrder, col("__asof_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lu.unionByName(ru, allowMissingColumns = true)
      .withColumn("__asof_row", last(col("__asof_row"), ignoreNulls = true).over(w))
      .filter(col("__asof_left") === 1)
    rightVals.foldLeft(matched) { (df, c) =>
        df.withColumn("asof_" + c, col("__asof_row").getField(c))
      }
      .drop("__asof_ts", "__asof_left", "__asof_salt", "__asof_row")
  }
}
