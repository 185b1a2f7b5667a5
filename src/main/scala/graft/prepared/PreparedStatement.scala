package graft.prepared

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.graft.Internals

/** A prepared statement: SQL parsed, analyzed, optimized, and physically
  * planned exactly once; `execute(params)` re-binds placeholder values into a
  * clone of the cached physical plan and runs it, skipping the entire
  * Catalyst pipeline on the hot path.
  *
  * Engine-neutral equivalent of the reference's `ParameterizedStatement`
  * (`src/parameterized_statement.rs:12-163`), with two deliberate design
  * changes (SURVEY.md §7):
  *
  *   - Binding is a pure clone-and-substitute on the driver
  *     (`transformAllExpressions`), not an update of a shared mutable filter
  *     expression — so concurrent executes and multi-partition plans are
  *     safe (the reference requires `target_partitions = 1`, README.md:56).
  *   - No UDF snapshotting side channel: Spark function expressions live
  *     directly in the cached plan tree.
  *
  * Parquet pruning parity: after binding, conjuncts of any dynamic filter are
  * re-pushed into descendant parquet scans (`ScanRebind`), so row-group
  * pruning sees the concrete literals — the moral equivalent of the
  * reference's `DynamicFilterPhysicalExpr.update` pushdown
  * (`src/physical.rs:240-264`).
  */
class PreparedStatement(
    val spark: SparkSession,
    val sql: String,
    val physicalPlan: SparkPlan,
    val output: Seq[Attribute],
    adaptiveLogical: Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = None) {

  /** Placeholder ids this statement expects (e.g. "$1", "$2"). */
  lazy val parameterIds: Seq[String] = Params.placeholderIds(physicalPlan)

  /** True when this statement was prepared with `adaptive = true` — each
    * execute re-plans from the cached analyzed plan under AQE instead of
    * re-binding the frozen physical plan (see
    * [[PreparedStatements.prepare]] for the trade).
    */
  def isAdaptive: Boolean = adaptiveLogical.isDefined

  /** Bind `params` and return a lazy DataFrame over the bound plan.
    *
    * Static mode (default): no Catalyst work here — one cheap plan-tree
    * clone of the cached physical plan, then straight to execution when an
    * action runs. Adaptive mode: literals substitute into the cached
    * analyzed plan, which re-plans through the optimizer + AQE.
    */
  def execute(params: Map[String, Any] = Map.empty): DataFrame = adaptiveLogical match {
    case Some(logical) =>
      Internals.ofRows(spark, Params.bindLogical(logical, params))
    case None =>
      Internals.dfFromPhysical(spark, boundPlan(params))
  }

  /** Bind + re-push scan predicates, stamping the measured bind time onto
    * every [[graft.plans.DynamicFilterExec]]'s `bindTime` SQLMetric (set
    * AFTER the rebind — a rebind that copies the exec would re-create its
    * metric accumulators and lose an earlier stamp). The exec posts the
    * value to the SQL listener when execution starts. Public: the returned
    * tree is the statement's per-execution plan, the inspection point for
    * metrics and plan-shape assertions (static mode only).
    */
  def boundPlan(params: Map[String, Any]): SparkPlan = {
    val start = System.nanoTime()
    val bound = Params.bind(physicalPlan, params)
    val pruned = ScanRebind.rebind(bound)
    val elapsed = System.nanoTime() - start
    pruned.foreach {
      case d: graft.plans.DynamicFilterExec => d.longMetric("bindTime").set(elapsed)
      case _ => ()
    }
    pruned
  }

  /** Convenience: positional binding — args(0) -> "$1", args(1) -> "$2", … */
  def execute(args: Any*): DataFrame =
    execute(args.zipWithIndex.map { case (v, i) => s"$$${i + 1}" -> v }.toMap)

  /** Hot-path collect: bind and run the physical plan directly, skipping the
    * DataFrame wrapper entirely (the reference's execute() likewise streams
    * record batches straight from the physical plan,
    * `parameterized_statement.rs:64-87`).
    */
  def executeCollect(params: Map[String, Any]): Array[Row] = adaptiveLogical match {
    case Some(_) => execute(params).collect()
    case None    => Internals.collectPhysical(boundPlan(params))
  }
}
