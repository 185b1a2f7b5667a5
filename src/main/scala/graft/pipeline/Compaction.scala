package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}

/** Output-file sizing — the small-files control every 100 TB pipeline
  * needs: a job that writes from 10,000 tasks emits 10,000 files per
  * partition directory, and the NEXT job pays an open/seek/footer-parse per
  * file (plus a metastore listing that dwarfs the read). The fix is sizing
  * the write's partition count from the DATA volume, not the task count.
  *
  * [[compact]] estimates the frame's bytes from Catalyst's own statistics
  * (for a parquet scan that is the on-disk file volume, propagated through
  * filters/projections by the optimizer) and repartitions to
  * `ceil(bytes * sizeFactor / targetBytes)` — round-robin, so output files
  * are even-sized. [[compactByRange]] does the same arithmetic with a
  * range partitioning, preserving a sort-clustering (zone-map/min-max
  * friendly layout for downstream predicate skipping) at the cost of a
  * sampling pass to compute range bounds.
  *
  * `sizeFactor` calibrates estimate→output skew: re-encoding already
  * compressed parquet ≈ 1.0; writing a filtered/projected subset of wide
  * rows < 1; exploding/joining upstream > 1. The estimate is planning-time
  * and free — no extra job; AQE's `coalescePartitions` solves the adjacent
  * problem (too many SHUFFLE partitions) but not a final write's file
  * count, which only the partition count at write time controls.
  */
object Compaction {

  /** Partition count that lands `df` in ~`targetBytes` output files. */
  def targetPartitions(df: DataFrame, targetBytes: Long, sizeFactor: Double = 1.0): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(sizeFactor > 0, s"sizeFactor must be positive, got $sizeFactor")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    math.max(1, math.ceil(bytes.toDouble * sizeFactor / targetBytes).toInt)
  }

  /** Round-robin repartition to the target file count (even file sizes,
    * destroys ordering).
    */
  def compact(df: DataFrame, targetBytes: Long, sizeFactor: Double = 1.0): DataFrame =
    df.repartition(targetPartitions(df, targetBytes, sizeFactor))

  /** Range repartition to the target file count on `cols` — keeps rows
    * clustered by the leading columns so downstream scans can skip files
    * on min/max statistics.
    */
  def compactByRange(
      df: DataFrame,
      targetBytes: Long,
      cols: Seq[Column],
      sizeFactor: Double = 1.0): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    df.repartitionByRange(targetPartitions(df, targetBytes, sizeFactor), cols: _*)
  }
}
