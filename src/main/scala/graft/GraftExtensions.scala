package graft

import graft.plans.{ArrayDot, GraftStrategies, NfcNormalize, QbicChecksum, RewriteDotProduct, RewriteTopKWindow}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Engine extension point: registers graft's native Catalyst expressions
  * so they're callable from SQL and `call_function` in any session built
  * with `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Kept deliberately tiny (SURVEY §7): built-in operators cover the rest,
  * and every custom surface is one more thing Catalyst can't reason about.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("qbic_checksum"),
      QbicChecksum.info, exprs => QbicChecksum(exprs.head)))
    ext.injectFunction((FunctionIdentifier("array_dot"),
      ArrayDot.info, exprs => ArrayDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      NfcNormalize.info, exprs => NfcNormalize(exprs.head)))
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectOptimizerRule(_ => RewriteTopKWindow)
    ext.injectPlannerStrategy(_ => GraftStrategies)
  }
}

object GraftExtensions {
  /** Imperative registration for sessions already built (tests, shells). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("qbic_checksum"),
      QbicChecksum.info, exprs => QbicChecksum(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("array_dot"),
      ArrayDot.info, exprs => ArrayDot(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfc_normalize"),
      NfcNormalize.info, exprs => NfcNormalize(exprs.head))
  }
}
