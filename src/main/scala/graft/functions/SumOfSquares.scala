package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF demonstrating the `Aggregator[IN, BUF, OUT]` extension point
  * (SURVEY.md §2 Tier C "UDF / UDAF / UDTF"; the reference snapshots
  * aggregate UDFs in `parameterized_statement.rs:144-146`).
  *
  * Partial-aggregatable by construction (reduce + merge), so Spark plans a
  * map-side combine before the shuffle — the property that matters at scale.
  */
object SumOfSquares extends Aggregator[Double, Double, Double] {
  override def zero: Double = 0.0
  override def reduce(b: Double, a: Double): Double = b + a * a
  override def merge(b1: Double, b2: Double): Double = b1 + b2
  override def finish(r: Double): Double = r
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  def column(c: Column): Column = udaf(SumOfSquares).apply(c)
}
