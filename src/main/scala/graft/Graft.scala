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
  }
}
