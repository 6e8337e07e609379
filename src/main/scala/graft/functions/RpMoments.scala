package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-projection moment kernel for q119's Johnson–Lindenstrauss
  * distortion audit: per vector, the projected squared norm
  * `p2 = Σ_k (Σ_j code_j · sgn(j,k))²` and the raw squared norm
  * `c2 = Σ_j code_j²` in ONE codegen'd pass, where
  * `code_j = floor(x_j · quant + 0.5)` is the exact integer
  * quantization both engines share.
  *
  * The composable form — posexplode to (vec, j) rows, broadcast-join a
  * (j, k, sgn) frame, two grouped integer sums — is correct but pays an
  * explode factor of `dim · kdim` (64·16 = 1024 rows per vector through
  * the join: ~1.3 G rows at the 100× replica, the r12 warm sweep's
  * 14.3 s line). Here the ±1 signs live in one flat `long[]` reference
  * object and the generated code is a two-deep tight loop emitting TWO
  * longs per vector — the downstream exchange is the ≤ ~60-bucket
  * histogram, nothing else.
  *
  * Sign derivation matches the relational frame bit-for-bit: +1 iff the
  * first hex digit of md5("rp:j:k") is 0–7, else −1 (RpMomentsSpec pins
  * kernel == composed form; the q119 oracle still derives the signs
  * relationally in SQL, so the hash match cross-checks the matrix).
  *
  * Arithmetic is exact BIGINT throughout — immune to float-addition
  * order across engines/partitions, same rationale as the q58/q119
  * int-code move. Accepts `array<double>` or `array<float>` input
  * (floats are read through the same `x → double` widening the CAST
  * applies, so no intermediate cast array is materialized).
  *
  * Null semantics match the relational form: a null ELEMENT contributes
  * to neither sum (SQL `sum` skips nulls); a null/empty vector yields
  * p2 = c2 = 0, which the caller's `c2 > 0` guard drops exactly like
  * the SQL NULL comparison. Output: `array<bigint>` of [p2, c2].
  */
case class RpMoments(child: Expression, kdim: Int, dim: Int, quant: Int)
    extends UnaryExpression {

  require(kdim >= 1 && kdim <= 64, s"graft_rp_moments kdim must be in [1, 64], got $kdim")
  require(dim >= 1 && dim <= 4096, s"graft_rp_moments dim must be in [1, 4096], got $dim")

  // flat [j][k] ±1 matrix, built once per expression from md5("rp:j:k")
  @transient private lazy val signs: Array[Long] = {
    val m = new Array[Long](dim * kdim)
    val md = java.security.MessageDigest.getInstance("MD5")
    var j = 0
    while (j < dim) {
      var k = 0
      while (k < kdim) {
        val hex = md.digest(s"rp:$j:$k".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        m(j * kdim + k) = if (hex.charAt(0) <= '7') 1L else -1L
        k += 1
      }
      j += 1
    }
    m
  }

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rp_moments requires array<double> or array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "graft_rp_moments"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var c2 = 0L
    val p = new Array[Long](kdim)
    var j = 0
    while (j < n) {
      if (!v.isNullAt(j)) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        val code = math.floor(x * quant + 0.5).toLong
        c2 += code * code
        if (j < dim) {
          val off = j * kdim
          var k = 0
          while (k < kdim) { p(k) += code * signs(off + k); k += 1 }
        }
      }
      j += 1
    }
    var p2 = 0L
    var k = 0
    while (k < kdim) { p2 += p(k) * p(k); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(Array(p2, c2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("rpSigns", signs, "long[]")
      val getter = if (isFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      val n = ctx.freshName("n")
      val c2 = ctx.freshName("c2")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val code = ctx.freshName("code")
      val off = ctx.freshName("off")
      val p2 = ctx.freshName("p2")
      s"""
         |int $n = $v.numElements();
         |long $c2 = 0L;
         |long[] $p = new long[$kdim];
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($v.isNullAt($j)) continue;
         |  long $code = (long) java.lang.Math.floor($getter($j) * $quant + 0.5);
         |  $c2 += $code * $code;
         |  if ($j < $dim) {
         |    int $off = $j * $kdim;
         |    for (int $k = 0; $k < $kdim; $k++) {
         |      $p[$k] += $code * $m[$off + $k];
         |    }
         |  }
         |}
         |long $p2 = 0L;
         |for (int $k = 0; $k < $kdim; $k++) $p2 += $p[$k] * $p[$k];
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(new long[]{$p2, $c2});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RpMoments =
    copy(child = newChild)
}
