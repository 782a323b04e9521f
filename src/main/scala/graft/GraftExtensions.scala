package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Expression, ExpressionInfo, Multiply, Sqrt, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types.DoubleType
import graft.functions.expressions.{LongDotProduct, LshBucket}
import graft.plans.TopKStrategy

/** SQL-surface registration for graft's custom operators.
  *
  * Cluster use: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (the standard injection point), after which plain SQL can call the
  * vector kernels and the planner can execute [[graft.plans.TopKPerKeyNode]]
  * (the sort-free top-k-per-key physical operator that
  * [[graft.plans.TopK.topKPerKey]] inserts).
  * [[GraftExtensions.register]] installs the same surface on an
  * already-built session (local tools, tests).
  *
  * Functions:
  *  - `graft_dot(a, b)` — exact int64 dot product (codegen'd kernel)
  *  - `graft_sqnorm(v)` — Σ vᵢ² as int64
  *  - `graft_quantize(e)` — float embedding → ×1000 int64 fixed point
  *  - `graft_lsh_bucket(v)` — 8-hyperplane/256-bucket LSH bucket id
  *  - `graft_cosine(a, b)` — cosine from exact int64 dot/norms
  *
  * Builders return plain Catalyst trees (parsed templates with the
  * argument spliced in) — a Column-DSL round-trip would leave lazy
  * `ColumnNodeExpression` wrappers in the tree, which are Unevaluable
  * outside plan-attached analysis.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(e.injectFunction)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftExtensions {

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[LongDotProduct].getName, name),
      builder)

  /** Parse a SQL formula and splice `args(i)` in for `__argi`. Inside
    * lambda bodies the parser wraps identifiers as
    * `UnresolvedNamedLambdaVariable` (the analyzer later demotes
    * unbound ones back to attributes), so match both shapes. */
  private def template(sql: String, args: Seq[Expression]): Expression =
    CatalystSqlParser.parseExpression(sql).transformUp {
      case a: UnresolvedAttribute if a.name.startsWith("__arg") =>
        args(a.name.stripPrefix("__arg").toInt)
      case v: UnresolvedNamedLambdaVariable
          if v.nameParts.lengthIs == 1 && v.nameParts.head.startsWith("__arg") =>
        args(v.nameParts.head.stripPrefix("__arg").toInt)
    }

  // Same formulas as graft.functions.Similarity.{quantize, lshBucket} —
  // identical arithmetic, verified equal in ExtensionsSpec.
  private val quantizeSql =
    "transform(__arg0, x -> cast(round(cast(x as double) * 1000, 0) as bigint))"

  private val all = Seq(
    fn("graft_dot", exprs => LongDotProduct(exprs.head, exprs(1))),
    fn("graft_sqnorm", exprs => LongDotProduct(exprs.head, exprs.head)),
    fn("graft_quantize", exprs => template(quantizeSql, exprs)),
    fn("graft_lsh_bucket", exprs => LshBucket(exprs.head)),
    fn("graft_cosine", exprs => {
      val dot = LongDotProduct(exprs.head, exprs(1))
      val na = LongDotProduct(exprs.head, exprs.head)
      val nb = LongDotProduct(exprs(1), exprs(1))
      Divide(Cast(dot, DoubleType), Sqrt(Cast(Multiply(na, nb), DoubleType)))
    }))

  def register(spark: SparkSession): Unit = {
    all.foreach(f =>
      spark.sessionState.functionRegistry.registerFunction(f._1, f._2, f._3))
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }
}
