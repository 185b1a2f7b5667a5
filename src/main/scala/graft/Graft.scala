package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.Internals

import graft.plans.{DynamicFilterRule, DynamicFilterStrategy}

/** Runtime installation of the graft extensions into an existing session.
  *
  * Sessions built by the caller can use
  * `.withExtensions(new graft.plans.GraftExtensions)`; for sessions we don't
  * construct (the driver's Verify/Bench sessions), the same rule + strategy
  * are injected through the public `spark.experimental` hooks. Idempotent.
  */
object Graft {
  def install(spark: SparkSession): Unit = synchronized {
    val exp = Internals.classicSession(spark).experimental
    if (!exp.extraOptimizations.contains(DynamicFilterRule))
      exp.extraOptimizations = exp.extraOptimizations :+ DynamicFilterRule
    if (!exp.extraStrategies.contains(DynamicFilterStrategy))
      exp.extraStrategies = exp.extraStrategies :+ DynamicFilterStrategy
    registerFunctions(spark)
  }

  /** Expose the custom codegen expressions to `spark.sql` text (the
    * reference registers its UDFs into the session context the same way —
    * `parameterized_statement.rs:30-49`): a SQL user gets the native
    * expressions, not a UDF shim. Idempotent (createOrReplace).
    */
  def registerFunctions(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    val reg = Internals.classicSession(spark).sessionState.functionRegistry
    def one(name: String)(b: Expression => Expression): Unit =
      reg.createOrReplaceTempFunction(name, {
        case Seq(x) => b(x)
        case args => throw new IllegalArgumentException(
          s"$name expects 1 argument, got ${args.length}")
      }, "internal")
    def two(name: String)(b: (Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, {
        case Seq(x, y) => b(x, y)
        case args => throw new IllegalArgumentException(
          s"$name expects 2 arguments, got ${args.length}")
      }, "internal")
    two("cosine_similarity")(graft.functions.CosineSimilarity(_, _))
    two("dot_product")(graft.functions.DotProduct(_, _))
    one("simhash64")(graft.functions.SimHash64(_))
    one("rolling_hash")(graft.functions.RollingHash(_))
    one("html_text")(graft.functions.HtmlText(_))
    one("html_main_text")(e => graft.functions.HtmlMainText(e))
    one("html_links")(graft.functions.HtmlLinks(_))
    // DuckDB's name for the same NFC form — SQL text ports both ways
    one("nfc_normalize")(graft.functions.UnicodeNormalize(_, "NFC"))
    one("nfkc_normalize")(graft.functions.UnicodeNormalize(_, "NFKC"))
    // second arg must be a literal int (the gram size is a plan-time shape)
    reg.createOrReplaceTempFunction("repetition_profile",
      repetitionProfileBuilder, "internal")
  }

  /** SQL builder for `repetition_profile`, shared by both registries
    * ([[registerFunctions]] and [[graft.plans.GraftExtensions]]). The
    * fallbacks are SPLIT so two-arguments-but-wrong-type reports the type
    * constraint, not a bogus "got 2 argument(s)" arity complaint.
    */
  private[graft] val repetitionProfileBuilder:
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = {
    case Seq(x, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
      graft.functions.RepetitionProfile(x, n)
    case Seq(_, other) => throw new IllegalArgumentException(
      "repetition_profile expects a LITERAL INT gram size as its second " +
        s"argument (a plan-time shape), got ${other.sql}")
    case args => throw new IllegalArgumentException(
      "repetition_profile expects 2 arguments (tokens array, literal int n), " +
        s"got ${args.length}")
  }
}
