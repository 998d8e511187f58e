package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.RollingHash

/** SparkSessionExtensions entry point — registers the library's native
  * Catalyst expressions into the function registry, the idiomatic
  * injection path (`--conf spark.sql.extensions=graft.GraftExtensions`
  * or `.config(...)` at session build). No custom optimizer rules or
  * strategies are injected: SURVEY §4 — Catalyst's standard rewrites
  * cover everything this engine needs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.rollingHashDescriptor)
}

object GraftExtensions {
  private[graft] val rollingHashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    (children: Seq[Expression]) => RollingHash(children.head))

  /** Idempotent imperative registration — for sessions built without
    * the extensions conf (e.g. an external harness session). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val (id, info, builder) = rollingHashDescriptor
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
