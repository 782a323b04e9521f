package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.LongDotProduct

/** SQL-surface registration for graft's custom Catalyst expressions.
  *
  * Cluster use: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (the standard injection point), after which plain SQL can call
  * `graft_dot(a, b)`. [[GraftExtensions.register]] installs the same
  * functions on an already-built session (local tools, tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftExtensions.graftDot)
}

object GraftExtensions {
  private val graftDot = (
    new FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[LongDotProduct].getName, "graft_dot"),
    (exprs: Seq[Expression]) => LongDotProduct(exprs.head, exprs(1)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      graftDot._1, graftDot._2, graftDot._3)
}
