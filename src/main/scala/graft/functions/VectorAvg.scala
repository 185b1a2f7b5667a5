package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Dimension-wise mean of an `array<double>` column — the aggregation-side
  * answer to "centroid per group" that the posexplode plan cannot give
  * cheaply: ONE fixed-width (sums, counts) buffer per group per partition,
  * updated in place with a tight primitive loop, instead of fanning every
  * row into `dim` (group, pos, value) rows and hash-aggregating the
  * product (rows × dim CPU before the r16 rewrite — q_embed_diversity's
  * 4.7 s isolation floor on 2,000 vectors was exactly that fan-out).
  *
  * As an `Aggregator` it participates in partial aggregation: each map
  * task reduces its slice of a group to one dim-length buffer, so the
  * exchange carries `partitions × groups × dim` doubles — the same
  * row-count-independent shuffle bound the posexplode plan had, minus the
  * fan-out. Value parity with the old plan: elements are summed widened to
  * double and divided by the per-dimension count, exactly `avg(value)` per
  * (group, pos).
  *
  * Per-dimension counts (not one scalar count) keep the ragged-input
  * semantics of the posexplode form: a shorter vector simply contributes
  * to fewer dimensions, and a dimension's mean divides by the number of
  * vectors that actually reached it. Null vectors are skipped like any
  * aggregate skips null input. A group with only null vectors yields an
  * empty array (the posexplode plan dropped such groups in its join; no
  * corpus feeds one — documented, not load-bearing).
  */
class VectorAvg
    extends Aggregator[Seq[Double], (Array[Double], Array[Long]), Seq[Double]] {

  override def zero: (Array[Double], Array[Long]) =
    (Array.emptyDoubleArray, Array.emptyLongArray)

  private def grown(
      b: (Array[Double], Array[Long]), n: Int): (Array[Double], Array[Long]) =
    if (b._1.length >= n) b
    else (java.util.Arrays.copyOf(b._1, n), java.util.Arrays.copyOf(b._2, n))

  override def reduce(
      buf: (Array[Double], Array[Long]), v: Seq[Double]): (Array[Double], Array[Long]) =
    if (v == null) buf
    else {
      val b = grown(buf, v.length)
      var i = 0
      // IndexedSeq in practice (encoder-decoded ArrayData); indexed loop
      // avoids per-element iterator allocation in the per-row hot path
      while (i < v.length) { b._1(i) += v(i); b._2(i) += 1L; i += 1 }
      b
    }

  override def merge(
      a: (Array[Double], Array[Long]), b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    val (small, big) = if (a._1.length <= b._1.length) (a, b) else (b, a)
    val m = grown(big, small._1.length)
    var i = 0
    while (i < small._1.length) { m._1(i) += small._1(i); m._2(i) += small._2(i); i += 1 }
    m
  }

  override def finish(b: (Array[Double], Array[Long])): Seq[Double] = {
    val out = new Array[Double](b._1.length)
    var i = 0
    while (i < out.length) { out(i) = b._1(i) / b._2(i); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    ExpressionEncoder[(Array[Double], Array[Long])]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
