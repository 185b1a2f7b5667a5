package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Synchronous label propagation (LPA) — community detection over a link
  * graph, the density-seeking complement to
  * [[Dedup.connectedComponents]]'s pure-connectivity clustering (CC merges
  * anything touching; LPA splits a connected graph into densely-linked
  * neighborhoods — host communities, topical clusters). Deterministic by
  * construction: labels start as vertex ids, each round every vertex
  * adopts the label most frequent among its neighbors with ties broken
  * toward the SMALLEST label, and the round count is fixed — no RNG, no
  * visit-order dependence (synchronous updates read only last round's
  * labels), pure integer arithmetic end to end.
  *
  * Per round: one join of the symmetrized edge list against last round's
  * labels, one (vertex, label) count aggregation, one `max_by` argmax per
  * vertex — the neighbor-histogram argmax rides the same aggregation, no
  * per-vertex window sort. Labels cache per round (lineage one round
  * deep); the per-round edge re-shuffle shares the CC/PageRank
  * bucketed-edge-table remedy if a real graph ever dominates. Isolated
  * vertices and self-loop-only neighbors keep their own label (self-loops
  * are dropped — a vertex does not vote for itself).
  */
object LabelPropagation {

  /** (id, community) for every vertex after `iterations` synchronous
    * rounds. Edges are treated as undirected (symmetrized) and
    * deduplicated.
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 2,
      initialLabels: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val directed = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val e = Dedup.cache(directed
      .unionAll(directed.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct())
    val verts =
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
    // warm start (the PageRank incremental story, and — labels being pure
    // integer functions of last round's labels — EXACT here: cold(a + b)
    // == warm(cold(a), b) bit for bit); vertices absent from the seed
    // (new hosts) start as their own community
    var labels = Dedup.cache(initialLabels match {
      case None => verts.select(col("id"), col("id").as("label"))
      case Some(init) =>
        verts.join(init.select(col("id"), col("community").as("__seed")),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("__seed"), col("id")).as("label"))
    })
    for (_ <- 1 to iterations) {
      val votes = e.join(labels, e("src") === labels("id"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max_by(col("label"), struct(col("c"), -col("label"))).as("__new"))
      labels = Dedup.cache(labels
        .join(votes, labels("id") === votes("dst"), "left")
        .select(labels("id"), coalesce(col("__new"), labels("label")).as("label")))
    }
    labels.select(col("id"), col("label").as("community"))
  }
}
