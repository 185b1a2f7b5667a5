package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-mixture resampling — hit a TARGET mixture of sources/languages
  * (the "mix web : code : books at 70 : 20 : 10" step of training-data
  * curation) by deterministically downsampling each group. Where
  * [[Sampling.stratifiedSample]] applies per-group rates the caller already
  * knows, this computes the rates FROM the corpus: the output is the
  * largest downsample-only corpus whose group proportions match `weights`.
  *
  * Let m = min over groups of count_g / w_g (w normalized). The target size
  * per group is w_g · floor(m); the binding group (the argmin) keeps
  * ~everything, every other group downsamples to proportion. Membership is
  * the same pure-function-of-id rule as [[Sampling]] (16-bit md5 threshold)
  * — retry-stable, partition-independent, replayable by any engine.
  *
  * Scale shape: one tiny aggregate (one row per group) joined back
  * broadcast-style, then a map-side hash-threshold filter — the corpus
  * itself is never shuffled. Groups absent from `weights` are dropped;
  * weight groups absent from the corpus make the mixture infeasible
  * (m = 0 ⇒ empty result) rather than silently skewed.
  */
object Mixture {

  def resampleToMixture(
      df: DataFrame,
      groupCol: String,
      weights: Map[String, Double],
      idCol: String): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0), s"weights must be positive, got $weights")
    val reserved = Set("__w", "__cnt", "__m", "__thr")
    require(!df.columns.exists(reserved),
      s"input columns collide with Mixture's reserved names: ${df.columns.filter(reserved).mkString(", ")}")
    val total = weights.values.sum
    val spark = df.sparkSession
    import spark.implicits._
    // normalized weights as a literal frame (k rows, k = #groups)
    val wdf = weights.toSeq.sortBy(_._1).map { case (g, w) => (g, w / total) }
      .toDF(groupCol, "__w")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
    // left join FROM weights: a weight group missing from the corpus gets
    // count 0 and forces m = 0 (infeasible mixture ⇒ empty, loudly)
    val joined = wdf.join(counts, Seq(groupCol), "left")
      .select(col(groupCol), col("__w"),
        coalesce(col("__cnt"), lit(0L)).as("__cnt"))
    // m and the per-group thresholds stay IN the plan (scalar agg row
    // cross-joined back) — no driver collect
    val m = joined.agg(floor(min(col("__cnt").cast("double") / col("__w"))).as("__m"))
    // the count-0 guard doubles as the ANSI divide-by-zero guard (Spark 4
    // errors on /0 even for doubles); an infeasible mixture (m = 0) zeroes
    // every threshold anyway
    val thresholds = joined.crossJoin(m)
      .select(col(groupCol),
        when(col("__cnt") > 0,
          floor(col("__w") * col("__m") / col("__cnt").cast("double") * lit(65536.0)))
          .otherwise(lit(0L))
          .cast("int").as("__thr"))
    applyThresholds(df, thresholds, groupCol, idCol)
  }

  /** [[resampleToMixture]] weighted by TOKENS instead of documents — the
    * form a compute budget actually speaks ("70% of training tokens from
    * web, 20% code, 10% books"): the output is the largest downsample-only
    * corpus whose expected per-group TOKEN totals match `weights`. Same
    * construction with token sums in place of row counts — m = min over
    * groups of tokens_g / w_g, each group keeps documents with probability
    * w_g·m / tokens_g, so its expected kept-token total is w_g·m (document
    * sampling hits a token target in expectation; the draw stays a pure
    * function of id, so it replays and composes exactly like the
    * count-weighted form). Same scale shape: one tiny aggregate broadcast
    * back, map-side threshold filter, corpus never shuffled.
    */
  def resampleToTokenMixture(
      df: DataFrame,
      groupCol: String,
      tokensCol: String,
      weights: Map[String, Double],
      idCol: String): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0), s"weights must be positive, got $weights")
    val reserved = Set("__w", "__tok", "__m", "__thr")
    require(!df.columns.exists(reserved),
      s"input columns collide with Mixture's reserved names: ${df.columns.filter(reserved).mkString(", ")}")
    val total = weights.values.sum
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.sortBy(_._1).map { case (g, w) => (g, w / total) }
      .toDF(groupCol, "__w")
    val sums = df.groupBy(col(groupCol))
      .agg(sum(col(tokensCol).cast("long")).as("__tok"))
    val joined = wdf.join(sums, Seq(groupCol), "left")
      .select(col(groupCol), col("__w"),
        coalesce(col("__tok"), lit(0L)).as("__tok"))
    val m = joined.agg(floor(min(col("__tok").cast("double") / col("__w"))).as("__m"))
    val thresholds = joined.crossJoin(m)
      .select(col(groupCol),
        when(col("__tok") > 0,
          floor(col("__w") * col("__m") / col("__tok").cast("double") * lit(65536.0)))
          .otherwise(lit(0L))
          .cast("int").as("__thr"))
    applyThresholds(df, thresholds, groupCol, idCol)
  }

  /** TEMPERATURE resampling — the α knob multilingual/multi-source LLM
    * mixes use (keep probability ∝ n_g^(α−1): α = 1 natural distribution,
    * α → 0 uniform): the output is the largest downsample-only corpus
    * whose expected group sizes are proportional to n_g^α. Weights derive
    * from the corpus itself, so unlike [[resampleToMixture]] no external
    * weight map is needed.
    *
    * Constructed SUM-FREE for determinism: with s_g = n_g^α, the scale is
    * m = min_h(n_h / s_h) (the smallest group keeps everything) and group
    * g keeps documents with probability s_g·m / n_g — only per-group
    * powers, divisions, and an order-independent min, no float summation
    * whose accumulation order could vary between runs or engines. At
    * α = 0.5 the power is computed as `sqrt` (correctly-rounded IEEE on
    * every engine, so an external oracle replays the row set bitwise);
    * other α use `pow` (deterministic within the JVM; cross-engine replay
    * is subject to the platform's pow ulp). Same scale shape as the other
    * mixers: one tiny aggregate broadcast back, map-side md5 threshold
    * filter, the corpus never shuffles.
    */
  def resampleToTemperature(
      df: DataFrame,
      groupCol: String,
      alpha: Double,
      idCol: String): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    // alpha = 1 IS the natural distribution: provably keeps every row
    // (s = n ⇒ every threshold is 65536, above the 16-bit hash range) —
    // skip the aggregate/join machinery entirely
    if (alpha == 1.0) return df
    val reserved = Set("__cnt", "__s", "__m", "__thr")
    require(!df.columns.exists(reserved),
      s"input columns collide with Mixture's reserved names: ${df.columns.filter(reserved).mkString(", ")}")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
    val sCol =
      if (alpha == 0.5) sqrt(col("__cnt").cast("double"))
      else pow(col("__cnt").cast("double"), lit(alpha))
    val scored = counts.select(col(groupCol), col("__cnt"), sCol.as("__s"))
    // no divide guard needed (unlike the weighted mixers): groups come
    // FROM the corpus, so __cnt >= 1 and __s > 0 always
    val m = scored.agg(min(col("__cnt").cast("double") / col("__s")).as("__m"))
    val thresholds = scored.crossJoin(m)
      .select(col(groupCol),
        floor(col("__s") * col("__m") / col("__cnt").cast("double") * lit(65536.0))
          .cast("int").as("__thr"))
    applyThresholds(df, thresholds, groupCol, idCol)
  }

  /** The shared application tail of every mixer: broadcast the per-group
    * 16-bit thresholds back and keep rows whose id-hash clears them —
    * membership stays a pure function of id.
    */
  private def applyThresholds(
      df: DataFrame, thresholds: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.join(broadcast(thresholds), Seq(groupCol))
      .filter(Sampling.md5Uniform(col(idCol)) < col("__thr"))
      .drop("__thr")
}
