package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequency summary — the bounded-memory candidate generator
  * behind [[graft.pipeline.Profile.approxHeavyHitters]], for key spaces too
  * large for the exact groupBy top-k (whose hash-aggregate state is one
  * entry per DISTINCT key — a non-starter on, say, trillions of URLs).
  *
  * The buffer holds at most `capacity` (key, weight) entries. As an
  * `Aggregator` it participates in PARTIAL aggregation: each map task
  * reduces its slice to one bounded summary (the per-partition candidate
  * heap), and the exchange carries O(partitions × capacity) entries total —
  * never a per-distinct-key row.
  *
  * Guarantees (the classic MG bound, additive across merges — Agarwal et
  * al., "Mergeable Summaries", PODS '12): every key's summary weight
  * undercounts its true frequency by at most n / capacity, and therefore
  * EVERY key with true frequency > n / capacity is present in the summary.
  * Sizing rule for top-k recall: pick capacity > n / count(k-th hitter);
  * since the k-th heavy hitter is what you are looking for, in practice
  * pick the largest capacity whose summary still fits comfortably in a
  * task (a 2²⁰-entry summary of 32-byte keys is ~48 MB — fine; the point
  * is bounding state independent of the key-space size).
  *
  * reduce on a full buffer is the textbook decrement-all (O(capacity),
  * amortized O(1) per row — each decrement pays for a prior increment);
  * merge is sum-union then subtract the (capacity+1)-th largest weight,
  * which preserves the additive error bound.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    buf.get(key) match {
      case Some(w) => buf.updated(key, w + 1L)
      case None if buf.size < capacity => buf.updated(key, 1L)
      case None =>
        // full and key absent: decrement every counter (the new key's
        // implicit 1 cancels with its own decrement) and drop the zeros
        buf.collect { case (k, w) if w > 1L => k -> (w - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (k, w)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + w)
    }
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest weight: at most `capacity`
      // entries can exceed it, and every surviving weight keeps the
      // undercount-≤-n/capacity invariant
      val cut = combined.valuesIterator.toArray.sortBy(-_).apply(capacity)
      combined.collect { case (k, w) if w > cut => k -> (w - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (k, w) => (-w, k) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
