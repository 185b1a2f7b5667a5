package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-snapshot versioning — what changed between two materializations
  * of the same dataset (yesterday's crawl vs today's): per-id status
  * `added` / `removed` / `changed` / `unchanged`. The audit step before an
  * incremental pipeline decides what to reprocess, and the provenance
  * record a training run keeps about its inputs.
  */
object Snapshot {

  /** One row per id present in either snapshot, with the diff status.
    * Content comparison is by `contentCol` equality (pass a precomputed
    * hash column to diff 10-100 KB documents without shipping text — the
    * md5 the [[TextAnalysis.fingerprints]] operator emits is the intended
    * key at scale).
    *
    * Shape: ONE full-outer join keyed on `idCol` — both sides shuffle by
    * id once, everything else is map-side. With both snapshots written
    * bucketed by id (the [[Search.writeInvertedIndex]] layout discipline),
    * the join is exchange-free end to end. Ids are assumed unique within a
    * snapshot (the corpus contract everywhere in this library); duplicate
    * ids would cross-multiply through the join like any keyed join.
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String = "doc_id",
      contentCol: String = "text"): DataFrame = {
    val o = oldSnap.select(col(idCol).as("__o_id"), col(contentCol).as("__o_c"))
    val n = newSnap.select(col(idCol).as("__n_id"), col(contentCol).as("__n_c"))
    o.join(n, col("__o_id") === col("__n_id"), "full_outer")
      .select(
        coalesce(col("__o_id"), col("__n_id")).as(idCol),
        when(col("__o_id").isNull, "added")
          .when(col("__n_id").isNull, "removed")
          .when(col("__o_c") <=> col("__n_c"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** The summary form: status → row count (four rows at most) — the
    * per-batch monitoring number.
    */
  def diffCounts(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String = "doc_id",
      contentCol: String = "text"): DataFrame =
    diff(oldSnap, newSnap, idCol, contentCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
}
