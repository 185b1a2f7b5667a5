package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.types.IntegerType

import graft.plans.{DynamicFilterExec, DynamicFilterNode, DynamicFilterStrategy}
import graft.prepared.ParamPlaceholder

/** Ports of the reference planner unit tests
  * (`/root/reference/datafusion-dynamic-filter/src/planner.rs:48-163`).
  */
class DynamicFilterStrategySpec extends SparkTestBase {

  private val id = AttributeReference("id", IntegerType)()
  private val rel = LocalRelation(id)
  private val cond = EqualTo(id, ParamPlaceholder("$1", IntegerType))

  // planner.rs:48-89 — the node plans to the physical exec
  test("DynamicFilterNode plans to DynamicFilterExec") {
    DynamicFilterStrategy(DynamicFilterNode(cond, rel)) match {
      case Seq(DynamicFilterExec(c, _)) => c shouldBe cond
      case other                        => fail(s"expected one DynamicFilterExec, got $other")
    }
  }

  // planner.rs:91-120 — other plans are not claimed by the strategy
  test("non-matching plans produce Nil") {
    DynamicFilterStrategy(rel) shouldBe Nil
    DynamicFilterStrategy(Filter(EqualTo(id, Literal(1)), rel)) shouldBe Nil
  }

  // planner.rs:122-163 — the predicate survives into the exec
  test("predicate preserved into the exec") {
    val pred = And(
      GreaterThan(id, ParamPlaceholder("$1", IntegerType)),
      LessThan(id, ParamPlaceholder("$2", IntegerType)))
    DynamicFilterStrategy(DynamicFilterNode(pred, rel)) match {
      case Seq(exec: DynamicFilterExec) => exec.condition shouldBe pred
      case other                        => fail(s"unexpected $other")
    }
  }

  // physical.rs:345-405 — exec tree surgery preserves the condition
  test("withNewChildren preserves the condition") {
    val Seq(exec: DynamicFilterExec) =
      DynamicFilterStrategy(DynamicFilterNode(cond, rel)): @unchecked
    val swapped = exec.withNewChildren(exec.children)
    swapped.asInstanceOf[DynamicFilterExec].condition shouldBe cond
  }

  // physical.rs:27, :266-268 — the reference exec carries an
  // ExecutionPlanMetricsSet; ours populates numOutputRows from tasks and
  // bindTime from the driver-side parameter substitution
  test("SQLMetrics populated after an execute") {
    import org.apache.spark.sql.graft.Internals
    spark.range(0, 100).selectExpr("id").createOrReplaceTempView("metrics_t")
    val st = graft.prepared.PreparedStatements.prepare(
      spark, "SELECT id FROM metrics_t WHERE id >= $1")
    val plan = st.boundPlan(Map("$1" -> 90L))
    val exec = plan.collectFirst { case d: DynamicFilterExec => d }
      .getOrElse(fail(s"no DynamicFilterExec in\n$plan"))
    Internals.collectPhysical(plan) should have length 10
    exec.metrics("numOutputRows").value shouldBe 10L
    exec.metrics("bindTime").value should be > 0L
  }
}
