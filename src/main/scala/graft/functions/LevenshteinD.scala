package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Levenshtein distance kernel.
  *
  * The builtin `levenshtein` runs its DP over decoded code points,
  * paying UTF-8 character machinery per cell; on a fuzzy-match join the
  * distance dominates the query (q47: ~360k pairs × ~33² cells). For
  * pure-ASCII operands — the overwhelmingly common case for
  * identifier/name matching — a two-row DP over raw bytes is equivalent
  * (1 byte = 1 code point) and ~3× faster. Non-ASCII operands delegate
  * to the builtin's code-point implementation, so results are ALWAYS
  * identical to `levenshtein` (LevenshteinDSpec pins agreement,
  * including multi-byte inputs).
  *
  * Both kernels first strip the common prefix and suffix (the standard
  * identity lev(xa, xb) = lev(a, b)): prefix-blocked fuzzy joins
  * guarantee ≥ 6 shared leading bytes, so trimming deletes a third of
  * the DP before it starts.
  */
object LevBytes {

  private def allAscii(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) { if (b(i) < 0) return false; i += 1 }
    true
  }

  /** Exact edit distance; byte DP when both sides are ASCII. */
  def dist(a: UTF8String, b: UTF8String): Int = {
    val ba = a.getBytes
    val bb = b.getBytes
    if (!allAscii(ba) || !allAscii(bb)) return a.levenshteinDistance(b)
    // trim common prefix/suffix — zero edit contribution
    var off = 0
    var endA = ba.length
    var endB = bb.length
    while (off < endA && off < endB && ba(off) == bb(off)) off += 1
    while (endA > off && endB > off && ba(endA - 1) == bb(endB - 1)) { endA -= 1; endB -= 1 }
    // two-row DP over the shorter side for minimal working-set
    val (s, sLen, t, tLen) =
      if (endA - off <= endB - off) (ba, endA - off, bb, endB - off)
      else (bb, endB - off, ba, endA - off)
    val m = sLen
    if (m == 0) return tLen
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= tLen) {
      cur(0) = i
      val ti = t(off + i - 1)
      j = 1
      while (j <= m) {
        val sub = prev(j - 1) + (if (s(off + j - 1) == ti) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        cur(j) = math.min(sub, math.min(del, ins))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  /** Banded (Ukkonen) edit distance under a bound: exact when the
    * distance is ≤ k, else k+1. A threshold-filtered fuzzy join
    * (`dist <= k`) only ever reads exact values ≤ k, so the capped
    * answer is indistinguishable — and the DP touches only the
    * 2k+1-wide diagonal band with an early exit once a whole row
    * exceeds k. */
  def distBounded(a: UTF8String, b: UTF8String, k: Int): Int = {
    if (k < 0) return 0
    val inf = k + 1
    val ba = a.getBytes
    val bb = b.getBytes
    if (!allAscii(ba) || !allAscii(bb)) {
      val d = a.levenshteinDistance(b, k)
      return if (d < 0) inf else d
    }
    var off = 0
    var endA = ba.length
    var endB = bb.length
    while (off < endA && off < endB && ba(off) == bb(off)) off += 1
    while (endA > off && endB > off && ba(endA - 1) == bb(endB - 1)) { endA -= 1; endB -= 1 }
    val (s, sLen, t, tLen) =
      if (endA - off <= endB - off) (ba, endA - off, bb, endB - off)
      else (bb, endB - off, ba, endA - off)
    val m = sLen
    val n = tLen
    if (n - m > k) return inf
    if (m == 0) return n // ≤ k by the length check
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      cur(0) = if (i <= k) i else inf
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      val ti = t(off + i - 1)
      var rowMin = cur(0)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (s(off + j - 1) == ti) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        val v = math.min(sub, math.min(del, ins))
        cur(j) = if (v > inf) inf else v
        if (cur(j) < rowMin) rowMin = cur(j)
        j += 1
      }
      if (rowMin > k) return inf
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    math.min(prev(m), inf)
  }
}

/** `graft_lev(a, b)` — drop-in for `levenshtein(a, b)` with the ASCII
  * byte fast path. The 3-arg form `graft_lev(a, b, k)` runs the banded
  * bounded kernel: exact distance when ≤ k, else k+1. */
case class LevenshteinD(left: Expression, right: Expression, bound: Option[Int] = None)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lev requires (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_lev"

  override protected def nullSafeEval(a: Any, b: Any): Any = bound match {
    case Some(k) => LevBytes.distBounded(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)
    case None => LevBytes.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = bound match {
    case Some(k) =>
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LevBytes.distBounded($a, $b, $k)")
    case None =>
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LevBytes.dist($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevenshteinD =
    copy(left = newLeft, right = newRight)
}
