package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** PageRank over a link graph — the domain-centrality signal web-scrape
  * curation ranks sources by (crawl frontiers, per-host quality priors,
  * spam demotion all key off it). Iterative power method with damping and
  * full dangling-mass redistribution, fixed iteration count so the result
  * is a deterministic function of the edge set.
  *
  * Per iteration: ranks join out-degrees (rank share per edge), one
  * dst-keyed aggregation of shares, dangling mass from a scalar aggregate
  * broadcast back with the vertex count — two corpus-sized exchanges, no
  * driver-side vertex state, same job-per-round shape as
  * [[Dedup.connectedComponents]]'s pointer jumping (and the same bucketed
  * edge-table lever applies if the per-round edge re-shuffle ever
  * dominates). Each iteration's ranks are persisted via the shared cache
  * registry: both downstream consumers (dangling aggregate, contribution
  * join) read the materialized frame, and the lineage stays one
  * iteration deep instead of exponential.
  *
  * Ranks sum to 1 every iteration (dangling redistribution closes the
  * leak), so the output is a probability vector regardless of graph shape.
  */
object PageRank {

  /** (id, rank) for every vertex of the graph, after `iterations` rounds
    * from the uniform start. Edges are deduplicated; self-loops are legal
    * (a self-loop feeds rank back to its own vertex).
    *
    * `initialRanks` warm-starts the power method from a previous result —
    * the incremental story: after a crawl delta perturbs the graph, seed
    * from yesterday's ranks and converge in a round or two instead of
    * from-scratch iterations. Vertices absent from the seed (new hosts)
    * enter at the uniform share; the seeded vector is renormalized to a
    * probability vector in-plan, so the sum-to-1 invariant holds from
    * round one whatever the seed.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      damping: Double = 0.85,
      initialRanks: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0, 1), got $damping")
    val e = Dedup.cache(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct())
    val verts = Dedup.cache(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
    val nV = verts.agg(count(lit(1)).as("n_v"))
    val outDeg = Dedup.cache(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))

    var ranks = initialRanks match {
      case None =>
        verts.crossJoin(broadcast(nV))
          .select(col("id"), (lit(1.0) / col("n_v").cast("double")).as("rank"))
      case Some(init) =>
        val seeded = Dedup.cache(verts
          .join(init.select(col("id"), col("rank").as("__seed")), Seq("id"), "left")
          .crossJoin(broadcast(nV))
          .select(col("id"),
            coalesce(col("__seed"), lit(1.0) / col("n_v").cast("double")).as("__raw")))
        val total = seeded.agg(sum(col("__raw")).as("__tot"))
        seeded.crossJoin(broadcast(total))
          .select(col("id"), (col("__raw") / col("__tot")).as("rank"))
    }
    for (_ <- 1 to iterations) {
      val withDeg = Dedup.cache(ranks
        .join(outDeg, ranks("id") === outDeg("src"), "left")
        .select(col("id"), col("rank"), col("deg")))
      val dangling = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      val shares = withDeg.filter(col("deg").isNotNull)
        .select(col("id"), (col("rank") / col("deg").cast("double")).as("share"))
      val contribs = e.join(shares, e("src") === shares("id"))
        .groupBy(col("dst")).agg(sum(col("share")).as("contrib"))
      ranks = verts.join(contribs, verts("id") === contribs("dst"), "left")
        .crossJoin(broadcast(nV)).crossJoin(broadcast(dangling))
        .select(verts("id"),
          (lit(1.0 - damping) / col("n_v").cast("double") +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              col("dm") / col("n_v").cast("double"))).as("rank"))
    }
    ranks
  }
}
