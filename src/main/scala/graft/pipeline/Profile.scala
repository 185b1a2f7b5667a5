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

  /** NULL keys are legitimate (the exact operator groups them) but a
    * catalyst map buffer cannot hold a null KEY, so they ride the summary
    * as a NUL-character sentinel and decode on the way out. A real key
    * whose rendered form is exactly "\u0000" would alias with null inside
    * the candidate summary — at worst an extra candidate (the exact
    * re-count still separates them via null-safe equality).
    */
  private val NullKeySentinel = "\u0000"

  /** [[heavyHitters]] for key spaces too large for the exact groupBy (whose
    * aggregate state is one entry per distinct key): candidates come from a
    * bounded [[graft.functions.MisraGries]] summary (per-partition candidate
    * heaps merged into one ≤ `capacity`-entry table — a bounded driver
    * collect, the centroid-table class), then a SECOND pass re-counts ONLY
    * the candidates exactly — a broadcast semi join at the scan plus an
    * aggregation over ≤ capacity keys. Two bounded-memory passes replace
    * one unbounded-memory pass.
    *
    * Exactness: the MG bound guarantees every key with true frequency
    * > n / capacity is a candidate, so whenever the k-th heavy hitter
    * clears that bar the result is IDENTICAL to [[heavyHitters]] — which is
    * what lets the driver query share the exact operator's oracle. Sized
    * short (adversarially small capacity), recall degrades gracefully: the
    * result is still the exact counts of the candidates found
    * (spec-asserted ≥ k recall on a Zipf fixture).
    *
    * For a single-pass ESTIMATE instead (streams, no second scan), see
    * [[approxHeavyHittersOnePass]].
    */
  def approxHeavyHitters(
      df: DataFrame,
      keyCol: String,
      k: Int = 20,
      capacity: Int = 65536): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")
    val spark = df.sparkSession
    import spark.implicits._
    val mg = udaf(new graft.functions.MisraGries(capacity))
    val candidates = df
      .select(coalesce(col(keyCol).cast("string"), lit(NullKeySentinel)).as("__k"))
      .agg(mg(col("__k")).as("cand"))
      .head().getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
      .map(s => if (s == NullKeySentinel) null else s)
    val candDf = candidates.toDF("__cand")
    // null-safe equality: a plain = in the semi join would silently drop
    // the null-key group the exact operator reports
    df.join(broadcast(candDf), col(keyCol).cast("string") <=> col("__cand"), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(keyCol).cast("string"))
      .limit(k)
  }

  /** One-pass approximate top-k: Misra–Gries candidates and a count-min
    * sketch (Spark's built-in `count_min_sketch` aggregate — codegen'd
    * partials, mergeable binary) computed in the SAME aggregation, then the
    * candidates' frequencies estimated from the sketch driver-side. One
    * scan, bounded state everywhere — the form for when a second pass is
    * unavailable (a stream's foreachBatch profile) or the corpus scan
    * dominates. Counts are CMS estimates: never below the true frequency,
    * above it by at most eps·n with probability ≥ confidence. Keys are
    * reported as strings (the sketch hashes the rendered key).
    */
  def approxHeavyHittersOnePass(
      df: DataFrame,
      keyCol: String,
      k: Int = 20,
      capacity: Int = 65536,
      eps: Double = 0.0001,
      confidence: Double = 0.99): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")
    val spark = df.sparkSession
    import spark.implicits._
    val mg = udaf(new graft.functions.MisraGries(capacity))
    val row = df
      .select(coalesce(col(keyCol).cast("string"), lit(NullKeySentinel)).as("__k"))
      .agg(
        mg(col("__k")).as("cand"),
        expr(s"count_min_sketch(__k, ${eps}d, ${confidence}d, 42)").as("cms"))
      .head()
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(row.getAs[Array[Byte]](1))
    row.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
      .map(key => (key, sketch.estimateCount(key)))
      .sortBy { case (key, est) => (-est, key) }
      .take(k)
      .map { case (key, est) => (if (key == NullKeySentinel) null else key, est) }
      .toDF(keyCol, "est_rows")
  }

  /** Categorical-distribution drift between two corpus snapshots — the
    * monitoring sweep a continuously-ingested corpus runs per batch (did
    * the language mix shift? is one source suddenly dominating?): one row
    * per key value with counts, shares, and the share ratio
    * `share_b / share_a` (NULL where the key is absent from `a` — a new
    * key, the loudest drift of all; 0 where absent from `b`). The ratio is
    * a division of two exact-integer IEEE divisions — bitwise replayable,
    * no log/rounding — and keys far from ratio 1 are the drifted ones
    * (the log-free form of a KL contribution, the [[TextAnalysis]] lift
    * precedent).
    *
    * Shape: one tiny aggregation per side (key-cardinality-sized), a full
    * outer join of the two, totals broadcast back in-plan — the corpus is
    * scanned once per side and nothing corpus-sized shuffles.
    */
  def distributionDrift(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val ca = a.groupBy(col(keyCol)).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(keyCol)).agg(count(lit(1)).as("n_b"))
    val ta = a.agg(count(lit(1)).as("__t_a"))
    val tb = b.agg(count(lit(1)).as("__t_b"))
    ca.join(cb, Seq(keyCol), "full_outer")
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col(keyCol),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        (coalesce(col("n_a"), lit(0L)).cast("double") / col("__t_a").cast("double")).as("share_a"),
        (coalesce(col("n_b"), lit(0L)).cast("double") / col("__t_b").cast("double")).as("share_b"))
      .withColumn("ratio",
        when(col("share_a") > 0, col("share_b") / col("share_a")))
  }

  /** Retention cohort matrix — per (first-seen day, day offset) distinct
    * active users: the standard engagement table, and for a data pipeline
    * the crawl-freshness analog (how much of a source's day-0 population
    * is still producing on day k). `maxOffset` bounds the matrix width.
    *
    * Shape: activity collapses to DISTINCT (user, day) FIRST (one shuffle
    * sized user×days, not events); the first-seen day is a user-keyed
    * aggregation over that same frame, the join back rides the user
    * clustering, and the output aggregation is matrix-sized. All date
    * arithmetic is integer days — bitwise replayable.
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      maxOffset: Int = 7): DataFrame = {
    require(maxOffset >= 0, s"maxOffset must be >= 0, got $maxOffset")
    val days = events
      .select(col(userCol).as("__u"), date_trunc("day", col(tsCol)).as("__day"))
      .distinct()
    val cohorts = days.groupBy(col("__u")).agg(min(col("__day")).as("cohort_day"))
    days.join(cohorts, Seq("__u"))
      .select(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("day_offset"), col("__u"))
      .filter(col("day_offset") <= maxOffset)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("__u")).as("n_users"))
  }
}
