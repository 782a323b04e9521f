package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Hyperplane-LSH bucket id of an `array<bigint>` quantized embedding:
  * `planes` sign bits ⇒ 2^planes buckets, drawn from band `band`'s
  * disjoint plane family (global plane index `band·planes + j`).
  *
  * Bit j of the result is 1 iff Σ_d v[d]·w(p,d) ≥ 0 with integer plane
  * weights w(p,d) = (p·73856093 + d·19349663) mod 97 − 48 for global
  * plane p (d is 1-based, at most 64 dims) — exactly the arithmetic of
  * the composed `aggregate(zip_with(...))` form and of the DuckDB
  * oracle ([[graft.functions.Similarity.lshBucketSql]]).
  *
  * Block sizes scale as n/2^planes, so the plane count is the knob
  * that keeps within-block self-joins bounded as the corpus grows
  * (n/256 is NOT bounded at 100 TB; 16+ planes with OR'd bands keeps
  * block size tractable without giving up recall). Multiple bands use
  * DISJOINT plane families so their collision events are independent.
  *
  * The composed form walks two HigherOrderFunction closures per
  * element and allocates a 64-element array per plane per row — and
  * breaks whole-stage codegen. This expression is one fused
  * planes×64-iteration integer loop that stays inside the codegen'd
  * stage (same motivation as [[LongDotProduct]]).
  */
case class LshBucket(child: Expression, planes: Int = 8, band: Int = 0)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 62, s"planes must be in [1,62], got $planes")
  require(band >= 0, s"band must be >= 0, got $band")

  override def dataType: DataType = LongType

  private def planeSum(v: ArrayData, p: Long): Long = {
    val n = math.min(v.numElements(), 64)
    var s = 0L
    var d = 1
    while (d <= n) {
      s += v.getLong(d - 1) * ((p * 73856093L + d * 19349663L) % 97 - 48)
      d += 1
    }
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    var bucket = 0L
    var j = 0
    while (j < planes) {
      if (planeSum(v, band.toLong * planes + j) >= 0) bucket += 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val base = band.toLong * planes
      s"""
         |int $n = java.lang.Math.min($v.numElements(), 64);
         |long $bucket = 0L;
         |for (int $j = 0; $j < $planes; $j++) {
         |  long $s = 0L;
         |  for (int $d = 1; $d <= $n; $d++) {
         |    $s += $v.getLong($d - 1) * (((${base}L + $j) * 73856093L + $d * 19349663L) % 97L - 48L);
         |  }
         |  if ($s >= 0L) $bucket += 1L << $j;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
