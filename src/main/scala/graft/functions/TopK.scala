package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate over (score, id) pairs — the aggregation-side
  * answer to "k best per group" that a rank window cannot give you: an
  * `Aggregator` participates in PARTIAL aggregation, so each map task
  * reduces its slice of a group to at most k pairs before the shuffle,
  * and the exchange carries O(partitions × k) rows per group instead of
  * every scored row. A window, by contrast, must shuffle the entire group
  * to one task and sort it. Same result set (ties broken by smaller id,
  * spec-asserted equal to the window plan) — different scaling law.
  *
  * The buffer is kept sorted best-first and capped at k, so `reduce` is an
  * O(k) insert (with an O(1) reject of sub-threshold rows — the common
  * case once the buffer fills) and `merge` an O(k) sorted merge. Output is
  * the sorted (score desc, id asc) pair list; explode it for per-row
  * results.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  // total over NaN (java.lang.Double ordering ranks NaN greatest, matching
  // Spark SQL's sort order for double, so the aggregate agrees with the
  // row_number window variant even on NaN cosines from zero vectors)
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length >= k && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      ((pre :+ x) ++ post).take(k)
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && better(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
