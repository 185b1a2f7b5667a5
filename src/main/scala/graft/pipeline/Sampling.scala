package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling — the corpus down-selection steps of a
  * training-data pipeline (rebalance languages/sources, cap a dominant
  * domain, draw an eval slice). Spark's own `sample`/`sampleBy` draw from
  * per-partition RNGs, so membership changes with partitioning, ordering,
  * and stage retries; these operators make membership a PURE FUNCTION of
  * row content, like [[Splits]]:
  *
  *   - retry-stable and engine-replayable (md5 of the id's decimal string
  *     — any engine can audit membership row by row);
  *   - map-side only for [[stratifiedSample]] — no shuffle at any scale;
  *   - adding documents later never changes earlier rows' membership.
  */
object Sampling {

  /** 16-bit uniform hash in [0, 65536) from `md5(id)` — the same
    * cross-engine construction as [[Splits.md5Bucket]], without the modulo
    * (thresholding wants the raw value: `u < round(f * 65536)` keeps
    * fraction f with granularity 1/65536 and zero bucket-aliasing).
    */
  def md5Uniform(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int")

  /** Per-stratum deterministic Bernoulli sample: keep a row of stratum s
    * with probability `fractions(s)` (strata absent from the map keep
    * `default`). Sampling granularity is 1/65536 — fractions round to the
    * nearest 1/65536. Map-side only: a `when` chain over the stratum
    * column and one hash comparison, fully codegen'd, no shuffle — at
    * 100 TB this is a free rider on whatever scan feeds it.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      default: Double = 0.0): DataFrame = {
    require((fractions.values.toSeq :+ default).forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0, 1], got ${fractions.values.mkString(", ")} default $default")
    val threshold = fractions.foldLeft(lit(math.round(default * 65536).toInt)) {
      case (rest, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(math.round(f * 65536).toInt)).otherwise(rest)
    }
    df.filter(md5Uniform(col(idCol)) < threshold)
  }

  /** Deterministic quota: the `k` rows of each group with the SMALLEST
    * `md5(id)` hex digest (ties broken by id), i.e. a uniform-without-
    * replacement draw of exactly min(k, |group|) rows per group that any
    * engine can replay by sorting the same md5 strings. The canonical
    * "cap every source/language at N documents" rebalancing step.
    *
    * One shuffle on `groupCol` + per-partition sort (a rank window). The
    * skew caveat of any per-group window applies — a group with billions
    * of rows sorts on one task. At that scale, pre-filter with
    * [[stratifiedSample]] at a generous fraction (say `10k / n_group`)
    * first, then take the quota from the survivors: the top-k by hash of
    * the survivors equals the top-k of the group as long as the pre-filter
    * keeps ≥ k rows, because the hash threshold keeps exactly the smallest
    * hashes.
    */
  def quotaPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("__rn"), "__rn is reserved by quotaPerGroup")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Fill a TOTAL budget of `budget` rows fairly across groups
    * (water-filling): every group keeps min(size, level) rows where the
    * level is the largest equal share the budget allows — small groups
    * keep everything and their unused share spills over to larger groups,
    * so exactly `min(budget, total)` rows come back. The classic "fill a
    * 10M-doc training mix across sources without starving small ones".
    *
    * The allocation is computed IN-PLAN over the group-size aggregate
    * (G rows — the [[graft.pipeline.Mixture]] precedent): ascending-size
    * prefix scan finds the groups that fit fully (`sᵢ·(G−i+1) + cum_{i−1}
    * ≤ B` is monotone in i, so the fully-kept set is a prefix), the rest
    * take `⌊remaining/⌈groups left⌉⌋` with the integer remainder going to
    * the first groups in (size, name) order — pure integer arithmetic,
    * bitwise replayable. Membership within a group is the same
    * smallest-md5 draw as [[quotaPerGroup]] (retry-stable, and the same
    * prefilter remedy applies to billion-row groups).
    */
  def budgetWaterfall(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.contains("__rn"), "__rn is reserved by budgetWaterfall")
    val byAsc = Window.orderBy(col("__s"), col("__g"))
    val all = Window.partitionBy()
    val sizes = df.groupBy(col(groupCol).as("__g")).agg(count(lit(1)).as("__s"))
      .withColumn("__i", row_number().over(byAsc))
      .withColumn("__cum", sum(col("__s")).over(byAsc))
      .withColumn("__gn", count(lit(1)).over(all))
    // a group fits fully iff giving it (and implicitly every later, larger
    // group) its own size still fits the budget
    val fits = col("__s") * (col("__gn") - col("__i") + 1) +
      (col("__cum") - col("__s")) <= budget
    val alloc = sizes
      .withColumn("__full", fits)
      // budget spent on the full prefix / groups beyond it
      .withColumn("__spent", max(when(col("__full"), col("__cum")).otherwise(0L)).over(all))
      .withColumn("__left", greatest(lit(0L), lit(budget) - col("__spent")))
      .withColumn("__ng", sum(when(col("__full"), 0L).otherwise(1L)).over(all))
      .withColumn("__lvl", when(col("__ng") > 0, expr("__left div __ng")).otherwise(lit(0L)))
      .withColumn("__rem", when(col("__ng") > 0, col("__left") % col("__ng")).otherwise(lit(0L)))
      // rank among the NON-full groups in the same ascending order
      .withColumn("__j", sum(when(col("__full"), 0L).otherwise(1L)).over(byAsc))
      .withColumn("__take",
        when(col("__full"), col("__s"))
          .otherwise(col("__lvl") + when(col("__j") <= col("__rem"), 1L).otherwise(0L)))
      .select(col("__g"), col("__take"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(alloc), col(groupCol) === col("__g"))
      .filter(col("__rn") <= col("__take"))
      .drop("__rn", "__g", "__take")
  }

  /** Weighted sample WITHOUT replacement, `k` rows per group, inclusion
    * probability ∝ `weightCol` (A-ES exponential keys): each row draws
    * `w_key = ln(u) / w` from its deterministic uniform
    * `u = (md5Uniform(id) + ½) / 65536 ∈ (0, 1)`, and the k LARGEST keys
    * per group win — the Efraimidis–Spirakis reservoir order, so a row's
    * odds scale with its weight ("sample documents ∝ token count" without
    * replacement). Membership stays a pure function of (id, weight):
    * retry-stable, partitioning-independent, engine-replayable.
    *
    * Scale shape: selection runs through the bounded
    * [[graft.functions.TopKByScore]] aggregate — at most k (key, id) pairs
    * per partition reach the one group-keyed exchange, so a
    * billion-row group ships k rows, not a sorted billion (the window
    * form's skew caveat never applies). Selected ids join back to the
    * input for the full rows; the key rides along as `w_key` for audit.
    * Keys are rounded to 9 decimals BEFORE ranking with ties broken by
    * id, so the cut does not hinge on cross-engine `ln` ulp disagreement.
    * Rows with weight ≤ 0 or NULL are never selected.
    */
  def weightedSamplePerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("w_key"), "w_key is reserved by weightedSamplePerGroup")
    val u = (md5Uniform(col(idCol)).cast("double") + lit(0.5)) / lit(65536.0)
    val key = round(log(u) / col(weightCol).cast("double"), 9)
    val scored = df.filter(col(weightCol).cast("double") > 0)
      .select(col(groupCol), col(idCol).as("__sid"), key.as("__wkey"))
    val topk = udaf(new graft.functions.TopKByScore(k))
    // the join-back keys on (group, id), not id alone — ids only need to be
    // unique WITHIN a group, so an id reused across groups never leaks a
    // selection from one group onto another group's rows
    val picked = scored.groupBy(col(groupCol).as("__sg"))
      .agg(topk(col("__wkey"), col("__sid")).as("__top"))
      .select(col("__sg"), explode(col("__top")).as("__p"))
      .select(col("__sg"), col("__p._2").as("__sid"), col("__p._1").as("w_key"))
    df.join(picked,
        df(idCol) === picked("__sid") && df(groupCol) === picked("__sg"))
      .drop("__sid", "__sg")
  }
}
