package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 16-bit packed wire format for quantized embedding vectors.
  *
  * The ×1000-quantized fixed-point components ([[graft.functions.Similarity.quantize]])
  * of any unit-ish embedding fit comfortably in int16, but ride the
  * band-join shuffles as `array<bigint>` — ~550 B/row of UnsafeArray
  * where 128 B of payload exist. At the sf30 probe those vector
  * payloads ARE the dedup_semantic shuffle (12 of the top stages, two
  * sides × six bands); at 100 TB they are the dominant wire cost of
  * every vector self-join. [[PackShorts]] packs the long array into a
  * little-endian 2-byte-per-component binary ONCE on the cached
  * signature table, and [[PackedDotProduct]] computes the exact same
  * int64 dot product straight off the packed bytes, so the join
  * shuffles ~4× fewer bytes and the cosine stays bit-identical (same
  * integers, same order).
  *
  * Range guard: packing is only chosen when the per-dataset profile
  * (one capital job) measured max|component| ≤ 32767 — i.e. source
  * floats within ±32.7, true for any normalized embedding. Out of
  * range, callers keep the exact `array<bigint>` path; if data drifts
  * under a stale profile, [[PackShorts]] throws rather than truncate.
  */
case class PackShorts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      if (x < -32768L || x > 32767L)
        throw new IllegalArgumentException(
          s"PackShorts: component $x out of int16 range (stale pack profile?)")
      out(2 * i) = (x & 0xff).toByte
      out(2 * i + 1) = ((x >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n * 2];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $a.getLong($i);
         |  if ($x < -32768L || $x > 32767L)
         |    throw new IllegalArgumentException(
         |      "PackShorts: component " + $x + " out of int16 range (stale pack profile?)");
         |  $out[2 * $i] = (byte) ($x & 0xff);
         |  $out[2 * $i + 1] = (byte) (($x >> 8) & 0xff);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact int64 dot product over two [[PackShorts]]-packed binaries —
  * bit-identical to [[LongDotProduct]] over the unpacked arrays. */
case class PackedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  @inline private def shortAt(b: Array[Byte], i: Int): Long =
    ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toLong

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length) / 2
    var i = 0
    var sum = 0L
    while (i < n) {
      sum += shortAt(x, i) * shortAt(y, i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length) / 2;
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xa = (short) (($a[2 * $i] & 0xff) | ($a[2 * $i + 1] << 8));
         |  long $xb = (short) (($b[2 * $i] & 0xff) | ($b[2 * $i + 1] << 8));
         |  $sum += $xa * $xb;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
