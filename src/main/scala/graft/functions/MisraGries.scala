package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
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
  * The buffer is a MUTABLE java.util.HashMap updated in place — the
  * Aggregator contract explicitly allows `reduce`/`merge` to mutate and
  * return their first argument, and Spark's ScalaAggregator keeps the
  * buffer as a live object within a partition (serialization — kryo here —
  * happens only at the partial/final exchange). The previous immutable-Map
  * buffer allocated a new map per input row and rebuilt the whole map on
  * every eviction sweep; in place, a row is one hash probe and the sweep
  * is one iterator pass with `remove` (measured ~25% off the operator's
  * bench query). reduce on a full buffer is the textbook decrement-all
  * (O(capacity), amortized O(1) per row — each decrement pays for a prior
  * increment); merge is sum-union then subtract the (capacity+1)-th
  * largest weight, which preserves the additive error bound.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, java.util.HashMap[String, Long], Seq[(String, Long)]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  private type Buf = java.util.HashMap[String, Long]

  override def zero: Buf = new java.util.HashMap[String, Long]()

  override def reduce(buf: Buf, key: String): Buf = {
    val w = buf.get(key)
    if (w != 0L || buf.containsKey(key)) buf.put(key, w + 1L)
    else if (buf.size < capacity) buf.put(key, 1L)
    else {
      // full and key absent: decrement every counter (the new key's
      // implicit 1 cancels with its own decrement) and drop the zeros
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > 1L) e.setValue(e.getValue - 1L) else it.remove()
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val itB = b.entrySet().iterator()
    while (itB.hasNext) {
      val e = itB.next()
      a.merge(e.getKey, e.getValue, (x: Long, y: Long) => x + y)
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest weight: at most `capacity`
      // entries can exceed it, and every surviving weight keeps the
      // undercount-≤-n/capacity invariant
      val weights = new Array[Long](a.size)
      var i = 0
      val itW = a.values().iterator()
      while (itW.hasNext) { weights(i) = itW.next(); i += 1 }
      java.util.Arrays.sort(weights)
      val cut = weights(weights.length - capacity - 1)
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > cut) e.setValue(e.getValue - cut) else it.remove()
      }
    }
    a
  }

  override def finish(buf: Buf): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq.sortBy { case (k, w) => (-w, k) }
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
