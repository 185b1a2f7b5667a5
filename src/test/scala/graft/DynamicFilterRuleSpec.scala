package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.plans.{DynamicFilterNode, DynamicFilterRule}
import graft.prepared.{ParamPlaceholder, Params}

/** Ports of the reference optimizer-rule unit tests
  * (`/root/reference/datafusion-dynamic-filter/src/rule.rs:78-193`).
  */
class DynamicFilterRuleSpec extends SparkTestBase {

  private val id = AttributeReference("id", IntegerType)()
  private val name = AttributeReference("name", StringType)()
  private val rel = LocalRelation(id, name)

  private def ph(n: Int) = ParamPlaceholder(s"$$$n", IntegerType)

  // rule.rs:91-105 — a filter without placeholders is untouched
  test("non-placeholder filter is not transformed") {
    val plan = Filter(EqualTo(id, Literal(5)), rel)
    DynamicFilterRule(plan) shouldBe plan
  }

  // rule.rs:107-123 — a placeholder filter becomes the opaque node
  test("placeholder filter is rewritten to DynamicFilterNode") {
    val plan = Filter(EqualTo(id, ph(1)), rel)
    DynamicFilterRule(plan) match {
      case DynamicFilterNode(cond, child) =>
        cond shouldBe EqualTo(id, ph(1))
        child shouldBe rel
      case other => fail(s"expected DynamicFilterNode, got $other")
    }
  }

  // rule.rs:125-151 — the predicate survives the rewrite intact
  test("predicate is preserved through the rewrite") {
    val pred = And(GreaterThanOrEqual(id, ph(1)), LessThanOrEqual(id, ph(2)))
    DynamicFilterRule(Filter(pred, rel)) match {
      case DynamicFilterNode(cond, _) => cond shouldBe pred
      case other                      => fail(s"expected DynamicFilterNode, got $other")
    }
  }

  // rule.rs:153-172 — placeholder detection through nested AND
  test("placeholder detected in nested AND") {
    val pred = And(GreaterThan(id, ph(1)), LessThan(id, ph(2)))
    Params.containsPlaceholder(pred) shouldBe true
    DynamicFilterRule(Filter(pred, rel)) shouldBe a[DynamicFilterNode]
  }

  // rule.rs:174-192 — placeholder detection through OR
  test("placeholder detected in OR") {
    val pred = Or(EqualTo(id, ph(1)), EqualTo(id, Literal(7)))
    Params.containsPlaceholder(pred) shouldBe true
    DynamicFilterRule(Filter(pred, rel)) shouldBe a[DynamicFilterNode]
  }

  test("no placeholder means containsPlaceholder is false") {
    Params.containsPlaceholder(Or(EqualTo(id, Literal(1)), EqualTo(id, Literal(2)))) shouldBe false
  }

  // graft improvement over the reference: static conjuncts stay in a plain
  // Filter below the dynamic node, keeping full Catalyst treatment
  test("static conjuncts split out of the dynamic node") {
    val static = EqualTo(name, Literal("x"))
    val dynamic = EqualTo(id, ph(1))
    DynamicFilterRule(Filter(And(static, dynamic), rel)) match {
      case DynamicFilterNode(cond, Filter(staticCond, `rel`)) =>
        cond shouldBe dynamic
        staticCond shouldBe static
      case other => fail(s"expected DynamicFilterNode over Filter, got $other")
    }
  }
}
