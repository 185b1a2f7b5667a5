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
}
