package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.prepared.{ParamPlaceholder, Params}

/** Ports of the reference substitution unit tests
  * (`/root/reference/datafusion-dynamic-filter/src/param_resolver.rs:102-179`).
  * The reference's UDF-side-channel tests have no analog: binding here is a
  * pure driver-side tree rewrite (SURVEY.md §7 design decision 2).
  */
class ParamsSpec extends SparkTestBase {

  private val id = AttributeReference("id", IntegerType)()

  // param_resolver.rs:126-140 — single placeholder substituted
  test("substitute a single placeholder") {
    val e = EqualTo(id, ParamPlaceholder("$1", IntegerType))
    Params.substitute(e, Map("$1" -> 42)) shouldBe EqualTo(id, Literal(42))
  }

  // param_resolver.rs:142-154 — multiple placeholders substituted
  test("substitute multiple placeholders") {
    val e = And(
      GreaterThanOrEqual(id, ParamPlaceholder("$1", IntegerType)),
      LessThanOrEqual(id, ParamPlaceholder("$2", IntegerType)))
    Params.substitute(e, Map("$1" -> 1, "$2" -> 9)) shouldBe
      And(GreaterThanOrEqual(id, Literal(1)), LessThanOrEqual(id, Literal(9)))
  }

  // param_resolver.rs:156-168 — missing param errors, naming the placeholder
  test("missing parameter raises with the placeholder name") {
    val e = EqualTo(id, ParamPlaceholder("$1", IntegerType))
    val ex = intercept[IllegalArgumentException] {
      Params.substitute(e, Map("$2" -> 42))
    }
    ex.getMessage should include("'$1' was not provided a value")
  }

  // param_resolver.rs:170-178 — expressions without placeholders untouched
  test("non-placeholder expressions are untouched") {
    val e = EqualTo(id, Literal(3))
    Params.substitute(e, Map("$1" -> 42)) shouldBe e
  }

  test("placeholderIds collects distinct ids") {
    val e = And(
      EqualTo(id, ParamPlaceholder("$1", IntegerType)),
      Or(
        EqualTo(id, ParamPlaceholder("$2", IntegerType)),
        EqualTo(id, ParamPlaceholder("$1", IntegerType))))
    Params.placeholderIds(e) should contain theSameElementsAs Seq("$1", "$2")
  }

  test("string-typed placeholder binds a string literal") {
    val name = AttributeReference("name", StringType)()
    val e = EqualTo(name, ParamPlaceholder("$1", StringType))
    Params.substitute(e, Map("$1" -> "bob")) shouldBe
      EqualTo(name, Literal.create("bob", StringType))
  }
}
