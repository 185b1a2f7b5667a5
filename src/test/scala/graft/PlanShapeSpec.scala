package graft

import org.apache.spark.sql.execution.SimpleMode

/** Locks the physical-plan shapes the round-2 audit established — a perf
  * regression (lost broadcast, lost top-k pruning, lost partial agg) fails
  * here even while results stay correct.
  */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.explainString(SimpleMode)

  test("crawl frontier plans the bloom seen-gate and no cartesian joins") {
    // the composition query's plan must show the map-side bloom probe
    // (dropSeenBefore's split predicate) and the broadcast exact-confirm;
    // a lost bloom would silently turn the seen-drop into join-only work
    try {
      val p = planOf("q_crawl_frontier")
      p should include("might_contain")
      p should include("BroadcastHashJoin")
      p should not include "CartesianProduct"
    } finally {
      spark.catalog.clearCache()
      pipeline.Dedup.clearCaches()
    }
  }

  test("multi-way join broadcasts the dimension sides") {
    val p = planOf("q_join_multi")
    p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") should be >= 3
    p should include("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    planOf("q_sort_limit") should include("TakeOrderedAndProject")
  }

  test("ranked window prunes to top-5 before the shuffle") {
    planOf("q_window_rank") should include("WindowGroupLimit")
  }

  test("grouped aggregate is partial before the exchange") {
    planOf("q_agg_group") should include("partial_count")
  }

  test("scalar filters reach the parquet scan") {
    planOf("q_scalar_math") should include("PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,200)]")
  }

  test("bucketed join is co-located: no exchange anywhere in the plan") {
    val p = planOf("q_join_bucketed")
    p should include("SortMergeJoin")
    p should not include "Exchange hashpartitioning"
    p should not include "BroadcastExchange"
  }

  test("driver smoke: entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("attribution interval join is an equi-join on user, never a cartesian") {
    // the time bounds ride the SMJ/SHJ as a post-join condition; only the
    // user_id equi-key partitions — a BNLJ here would be corpus × corpus
    val p = planOf("q_stream_attribution")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("duplicated-span top-k plans as TakeOrderedAndProject") {
    planOf("q_text_dupspans") should include("TakeOrderedAndProject")
  }

  test("hybrid search pools cut via TakeOrderedAndProject; no cartesian joins") {
    val p = planOf("q_text_search_hybrid")
    // both pools bound distributed before the rank windows run
    p.sliding("TakeOrderedAndProject".length)
      .count(_ == "TakeOrderedAndProject") should be >= 2
    p should not include "CartesianProduct"
  }

  test("html extraction runs inside whole-stage codegen off the parquet scan") {
    // the expressions codegen via the references-array call; a fallback to
    // interpreted eval would drop the scan out of the codegen stage
    val p = SparkEntry.queries("q_html_extract")(spark, dir)
      .queryExecution.executedPlan.toString
    // the * prefix is the whole-stage-codegen marker on the projection
    // that evaluates the extractor
    p should include("*(1) Project")
    p should not include "CodegenFallback"
    // and the scan reads only the two referenced columns
    planOf("q_html_extract") should include("ReadSchema: struct<doc_id:bigint,text:string>")
  }

  test("duplicated-span mining aggregates on span hashes, never span strings") {
    // the hash-first narrowing: the corpus-wide two-level aggregation keys
    // on the generator's 8-byte __h; span strings enter an exchange only
    // after the candidate semi join (boilerplate-sized stream). A plan
    // whose FIRST aggregate keys on `span` has regressed to shuffling raw
    // 10-gram strings — ~10x the exchange bytes at 100 TB.
    // anchored structurally on the plan TREE (not explain print order,
    // which AQE/version bumps can shuffle): the corpus-wide mining pass —
    // an aggregate with NO join below it — must key on the 8-byte __h;
    // any span-string-keyed aggregate may only run above a join, i.e.
    // over the candidate-narrowed (boilerplate-sized) survivor stream
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val plan = SparkEntry.queries("q_text_dupspans")(spark, dir)
      .queryExecution.sparkPlan
    val aggs = plan.collect { case a: BaseAggregateExec => a }
    def keyNames(a: BaseAggregateExec): Seq[String] =
      a.groupingExpressions.flatMap(_.references.map(_.name).toSeq)
    def hasJoinBelow(a: BaseAggregateExec): Boolean =
      a.children.exists(_.collectFirst { case j: BaseJoinExec => j }.nonEmpty)
    val corpusWide = aggs.filterNot(hasJoinBelow)
    corpusWide should not be empty
    all(corpusWide.map(keyNames)) should not contain "span"
    atLeast(1, corpusWide.map(keyNames)) should contain("__h")
    aggs.filter(a => keyNames(a).contains("span")).foreach { a =>
      withClue(s"span-keyed aggregate over a non-narrowed stream: $a") {
        hasJoinBelow(a) shouldBe true
      }
    }
    // and the span fan-out is the JVM-speed generator, not the interpreted
    // transform/slice HOF chain
    planOf("q_text_dupspans").toLowerCase should include("wordshinglehashes")
  }

  test("the corpus-wide embedding sweep is non-vacuous at every sf") {
    // the r12 registration returned 0 rows at sf0.01 (true on near-random
    // embeddings, but it verified nothing end-to-end); the in-query plants
    // guarantee rows whatever the corpus looks like
    SparkEntry.queries("q_dedup_embed")(spark, dir).count() should be > 0L
  }

  // The round-3 failure mode: native codegen expressions existed but the
  // dedup pipeline still planned the interpreted CodegenFallback
  // higher-order-function forms (transform/aggregate/zip_with — 75% of the
  // r3 bench). These assertions fail if a refactor silently reverts a hot
  // path to the SQL forms.
  test("ngram dedup plans the native shingle/jaccard/band expressions") {
    val p = planOf("q_dedup_ngram")
    p should include("shingle_hashes")
    p should include("jaccard_sorted")
    p should include("band_hashes")
    p should not include "transform("
    p should not include "aggregate("
  }

  test("minhash dedup plans the native agreement/band expressions") {
    val p = planOf("q_dedup_minhash")
    p should include("signature_agreement")
    p should include("band_hashes")
    p should not include "zip_with"
    p should not include "aggregate("
  }

  test("simhash dedup plans the two-level bucket keys") {
    val p = planOf("q_dedup_simhash")
    p should include("simhash_bucket_keys")
    // exact verify stays: prune-then-verify, reference physical.rs:257-263
    p should include("bit_count")
  }

  test("group centroids aggregate vectors natively — no posexplode fan-out") {
    // the r16 rewrite: one fixed-width VectorAvg buffer per group per
    // partition instead of fanning rows × dim through a (group, pos)
    // double-aggregation — a Generate here means the fan-out is back
    val p = pipeline.Similarity
      .groupCentroids(Tables.df(spark, dir, "embeddings"), "label")
      .queryExecution.explainString(SimpleMode)
    p should not include "Generate"
    p should not include "posexplode"
    p should not include "collect_list"
    // diversity composes the same centroid pass; its whole registered plan
    // must stay fan-out-free (its output is already scalar per group)
    val pd = planOf("q_embed_diversity")
    pd should not include "Generate"
    pd should not include "posexplode"
  }

  // The r9 lesson that regressed in r13 (q_embed_centroid/q_embed_hashdoc):
  // the driver's pandas-based oracle compare sorts result columns and
  // crashes on array-typed cells ("unhashable type: numpy.ndarray"), so a
  // registered query may only emit atomic top-level columns. Project
  // vectors to scalar rows (posexplode) or strings (array_join) first.
  test("no registered query emits array/map/struct top-level columns") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df =
          try fn(spark, dir)
          catch { case e: Throwable => fail(s"$name failed to build: $e") }
        df.schema.fields.collect {
          case f
              if f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[MapType] ||
                f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    spark.catalog.clearCache()
    pipeline.Dedup.clearCaches()
    pipeline.Dedup.clearCheckpoints()
    offenders shouldBe empty
  }
}
