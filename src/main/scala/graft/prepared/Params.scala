package graft.prepared

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.execution.SparkPlan

/** Placeholder detection and substitution (engine-neutral equivalent of the
  * reference's `replace_placeholders`, `src/param_resolver.rs:77-100`, and
  * `contains_placeholder`, `src/rule.rs:16-30`).
  *
  * Substitution is a pure tree rewrite producing an immutable bound plan —
  * there is no shared mutable filter expression and therefore no
  * single-partition restriction (the reference needs `target_partitions=1`,
  * its `README.md:56`; this design does not).
  */
object Params {

  /** True iff the expression tree contains at least one [[ParamPlaceholder]]. */
  def containsPlaceholder(e: Expression): Boolean =
    e.exists(_.isInstanceOf[ParamPlaceholder])

  /** All placeholder ids appearing in an expression tree. */
  def placeholderIds(e: Expression): Seq[String] =
    e.collect { case ParamPlaceholder(id, _) => id }.distinct

  /** All placeholder ids appearing anywhere in a physical plan. */
  def placeholderIds(plan: SparkPlan): Seq[String] = {
    val b = Seq.newBuilder[String]
    plan.foreach { node =>
      node.expressions.foreach(e => b ++= placeholderIds(e))
    }
    b.result().distinct
  }

  /** Error message parity with the reference (`src/param_resolver.rs:90-94`). */
  private def missing(id: String): Nothing =
    throw new IllegalArgumentException(
      s"Placeholder '$id' was not provided a value")

  /** Replace every [[ParamPlaceholder]] in the expression with a literal from
    * `params`; error on a missing id.
    */
  def substitute(e: Expression, params: Map[String, Any]): Expression =
    e.transform { case ParamPlaceholder(id, dt) =>
      params.get(id) match {
        case Some(v) => Literal.create(v, dt)
        case None    => missing(id)
      }
    }

  /** Bind a cached physical plan: clone-and-substitute every placeholder with
    * a literal. Fails fast if any referenced placeholder has no value.
    */
  def bind(plan: SparkPlan, params: Map[String, Any]): SparkPlan = {
    placeholderIds(plan).foreach(id => if (!params.contains(id)) missing(id))
    plan.transformAllExpressions { case ParamPlaceholder(id, dt) =>
      Literal.create(params(id), dt)
    }
  }

  /** Assert no placeholder remains (used by DynamicFilterExec before run). */
  def requireBound(e: Expression): Unit =
    placeholderIds(e).headOption.foreach(missing)
}
