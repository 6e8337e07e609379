package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Sign-random-hyperplane LSH signature kernel: all `tables` bucket codes
  * of a double vector in ONE codegen'd pass over a primitive plane
  * matrix.
  *
  * The composable form — `tables × planes` separate
  * `when(graft_dot(v, <literal array>) > 0, 1 << i)` columns — pays per
  * dot: a boxed `GenericArrayData` literal walk, expression-dispatch
  * overhead, and (out of whole-stage codegen, e.g. under a Generate) a
  * fully interpreted evaluation; measured ~150× slower than this kernel
  * at q39's 192 dots/row. Here the ±1 planes live in one flat
  * `double[]` reference object and the generated code is a three-deep
  * tight loop writing an `int[]` — no allocation beyond the result.
  *
  * Plane components are the md5-parity scheme of
  * `SimilarityQueries.planeComponent` (hex digit of md5("j:d")):
  * deterministic and engine-independent, so oracle SQL can inline the
  * same planes (see q29/q39 twins).
  *
  * Bit convention: bit i of table t's code is set iff
  * `dot(v, plane(seed + t*planes + i)) > 0` (strictly — a zero dot
  * leaves the bit clear), matching the composed `when(dot > 0, …)` form
  * and the oracle's `CASE WHEN list_dot_product(…) > 0`.
  *
  * Null semantics: null vector, wrong length, or any null element → null
  * (stricter than the composed form, which folds null dots to bit 0;
  * near-dup inputs are non-null fixed-width vectors, and LshSignCodesSpec
  * pins agreement with the composed form on well-formed input).
  */
case class LshSignCodes(
    child: Expression,
    seed: Int,
    tables: Int,
    planes: Int,
    dim: Int)
    extends UnaryExpression {

  // flat [table*planes + i][dim] ±1 matrix, built once per expression
  @transient private lazy val matrix: Array[Double] = {
    val m = new Array[Double](tables * planes * dim)
    var j = 0
    while (j < tables * planes) {
      var d = 0
      while (d < dim) {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${seed + j}:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
        m(j * dim + d) = if ("13579bdf".contains(hex.charAt(0))) 1.0 else -1.0
        d += 1
      }
      j += 1
    }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_codes requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_lsh_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var d = 0
    while (d < dim) { if (v.isNullAt(d)) return null; d += 1 }
    val codes = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var code = 0
      var i = 0
      while (i < planes) {
        val off = (t * planes + i) * dim
        var s = 0.0
        var k = 0
        while (k < dim) { s += v.getDouble(k) * matrix(off + k); k += 1 }
        if (s > 0) code |= 1 << i
        i += 1
      }
      codes(t) = code
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("lshPlanes", matrix, "double[]")
      val codes = ctx.freshName("codes")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val code = ctx.freshName("code")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $d = 0; $d < $dim; $d++) {
         |    if ($v.isNullAt($d)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    int[] $codes = new int[$tables];
         |    for (int $t = 0; $t < $tables; $t++) {
         |      int $code = 0;
         |      for (int $i = 0; $i < $planes; $i++) {
         |        int $off = ($t * $planes + $i) * $dim;
         |        double $s = 0.0;
         |        for (int $k = 0; $k < $dim; $k++) {
         |          $s += $v.getDouble($k) * $m[$off + $k];
         |        }
         |        if ($s > 0) $code |= 1 << $i;
         |      }
         |      $codes[$t] = $code;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |      .fromPrimitiveArray($codes);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignCodes =
    copy(child = newChild)
}
