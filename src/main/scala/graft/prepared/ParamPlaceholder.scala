package graft.prepared

import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Unevaluable}
import org.apache.spark.sql.types.DataType

/** A SQL parameter placeholder (`$1`, `$2`, …) that survives analysis,
  * optimization, and physical planning, to be replaced by a concrete
  * [[org.apache.spark.sql.catalyst.expressions.Literal]] at execute time.
  *
  * Spark's own parameter markers (`:name` / `?`) are bound during analysis
  * (`BindParameters`) and cannot reach the physical plan, so the prepared
  * statement path substitutes them with this expression right after parsing.
  *
  * Engine-neutral equivalent of the reference's `Expr::Placeholder` carried
  * into the physical layer (reference: `src/physical.rs:99-121`,
  * `src/rule.rs:16-30`). Unlike the reference, the type is always known at
  * prepare time (explicit `paramTypes` or inferred), so no typed-NULL trick
  * is needed.
  *
  * `Unevaluable` + non-foldable keeps constant folding and codegen away from
  * it; `resolved = true` (leaf with a concrete type) lets it pass analysis.
  */
case class ParamPlaceholder(id: String, dataType: DataType)
    extends LeafExpression
    with Unevaluable {
  override def nullable: Boolean = true
  override lazy val resolved: Boolean = true
  override def toString: String = s"placeholder($id)"
  override def sql: String = id
}
