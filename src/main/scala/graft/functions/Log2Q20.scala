package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `graft_log2q20(num, den)` — 2²⁰·log₂(num/den) in Q20 fixed point
  * (accurate to ~2⁻²⁰, deterministic to the bit) for rationals
  * num/den ≥ 1, by pure 64-bit integer arithmetic:
  *
  *  1. exponent: shift `den` up until num < 2·den — e dyadic doublings;
  *  2. mantissa: the classic shift-subtract long division produces
  *     X = ⌊num·2³⁰ / (den·2ᵉ)⌋ ∈ [2³⁰, 2³¹) without ever leaving Long;
  *  3. 20 square-and-extract steps (the CORDIC-family binary-log
  *     recurrence): X ← X²/2³⁰, emit 1 and halve iff X ≥ 2³¹ — each
  *     emitted bit is the next fraction bit of log₂(mantissa).
  *
  * Truncation at each squaring loses < 2⁻³⁰ relative, and step i's
  * error is weighted 2⁻⁽ⁱ⁺¹⁾ in the result, so the total bias is
  * below 2⁻²⁹ of a nat — the value is log₂ to ~10⁻⁶, and, unlike
  * libm `log`, bit-identical on any platform because only integer
  * ops run. The DuckDB oracle replays the identical recurrence as a
  * linear chain of single-reference CTEs (see [[Log2Kernel.cteChain]]
  * — NOT lateral aliases: DuckDB expands those by textual
  * substitution, and the squaring step's double self-reference makes
  * that expansion 2²⁰-exponential; chained CTEs splice at the plan
  * level and stay linear), so both engines floor the same bits.
  *
  * Contract: 1 ≤ den ≤ num < 2⁶², else null (the caller guards).
  * Where [[LnSmallKernel]] quantizes to 4 mantissa classes (enough
  * for perplexity gating), this kernel is the precise form scaling
  * exponents are fit with (q163's Heaps-law β).
  */
object Log2Kernel {

  /** Q20 log₂(num/den); requires 1 ≤ den ≤ num < 2⁶². */
  def q20(num: Long, den: Long): Long = {
    var e = 0L
    var d = den
    while (d <= (num >> 1)) { d <<= 1; e += 1 }
    // X = floor(num * 2^30 / d) by shift-subtract: num/d ∈ [1, 2)
    var x = 1L
    var r = num - d
    var i = 0
    while (i < 30) {
      r <<= 1
      x <<= 1
      if (r >= d) { r -= d; x |= 1L }
      i += 1
    }
    // 20 square-and-extract fraction bits
    var frac = 0L
    i = 0
    while (i < 20) {
      x = (x * x) >> 30
      val b = x >>> 31
      if (b == 1L) x >>= 1
      frac = (frac << 1) | b
      i += 1
    }
    (e << 20) | frac
  }

  /** DuckDB twin: a linear chain of CTE steps over relation `src`,
    * computing `${p}_q20` for every (p, num, den) in `pairs` in one
    * shared pass (all pairs advance together per step — 22 CTEs
    * total, each referenced exactly once so DuckDB's inliner splices
    * plans linearly). `num`/`den` must be BIGINT expressions over
    * `src`'s columns satisfying the kernel contract. Returns the CTE
    * text (leading comma included) and names the final CTE `out`,
    * which carries `src.*` plus each pair's `${p}_q20` BIGINT. */
  def cteChain(src: String, out: String,
               pairs: Seq[(String, String, String)]): String = {
    def all(f: ((String, String, String)) => String) =
      pairs.map(f).mkString(",\n    ")
    val init =
      s""", ${out}_s0 AS (
         |  SELECT *,
         |    ${all { case (p, num, den) =>
               s"""CASE WHEN CAST($den AS HUGEINT)
                  |              * CAST(power(2, length(bin($num)) - length(bin($den))) AS HUGEINT)
                  |            <= CAST($num AS HUGEINT)
                  |       THEN length(bin($num)) - length(bin($den))
                  |       ELSE length(bin($num)) - length(bin($den)) - 1 END AS ${p}_e""".stripMargin }}
         |  FROM $src
         |), ${out}_s0b AS (
         |  SELECT *,
         |    ${all { case (p, num, den) =>
               s"""CAST((CAST($num AS HUGEINT) * 1073741824)
                  |         // (CAST($den AS HUGEINT) * CAST(power(2, ${p}_e) AS HUGEINT))
                  |         AS BIGINT) AS ${p}_x0,
                  |    CAST(0 AS BIGINT) AS ${p}_f0""".stripMargin }}
         |  FROM ${out}_s0
         |)""".stripMargin
    val steps = (0 until 20).map { i =>
      val from = if (i == 0) s"${out}_s0b" else s"${out}_s$i"
      s""", ${out}_s${i + 1} AS (
         |  SELECT *,
         |    ${all { case (p, _, _) =>
               s"""CASE WHEN ((${p}_x$i * ${p}_x$i) >> 30) >= 2147483648
                  |         THEN ((${p}_x$i * ${p}_x$i) >> 30) >> 1
                  |         ELSE (${p}_x$i * ${p}_x$i) >> 30 END AS ${p}_x${i + 1},
                  |    (${p}_f$i << 1)
                  |      + (CASE WHEN ((${p}_x$i * ${p}_x$i) >> 30) >= 2147483648
                  |              THEN 1 ELSE 0 END) AS ${p}_f${i + 1}""".stripMargin }}
         |  FROM $from
         |)""".stripMargin
    }.mkString("\n")
    val fin =
      s""", $out AS (
         |  SELECT *,
         |    ${all { case (p, _, _) =>
               s"(CAST(${p}_e AS BIGINT) << 20) + ${p}_f20 AS ${p}_q20" }}
         |  FROM ${out}_s20
         |)""".stripMargin
    s"$init\n$steps\n$fin"
  }
}

case class Log2Q20(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_log2q20 requires (bigint, bigint), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  // contract nulls (see below) can occur even for non-null inputs
  override def nullable: Boolean = true

  override def prettyName: String = "graft_log2q20"

  /** The documented contract — 1 ≤ den ≤ num < 2⁶² — is enforced HERE,
    * not left to callers: outside it the kernel's exponent loop never
    * terminates (den ≤ 0) or the shift-subtract yields garbage via a
    * negative remainder (num < den), and this is a session-registered
    * SQL function any query can call unguarded. */
  @inline private def inContract(n: Long, d: Long): Boolean =
    d >= 1L && n >= d && n < (1L << 62)

  override protected def nullSafeEval(num: Any, den: Any): Any = {
    val n = num.asInstanceOf[Long]
    val d = den.asInstanceOf[Long]
    if (inContract(n, d)) Log2Kernel.q20(n, d) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, d) =>
      s"""if ($d >= 1L && $n >= $d && $n < (1L << 62)) {
         |  ${ev.value} = graft.functions.Log2Kernel.q20($n, $d);
         |} else {
         |  ${ev.isNull} = true;
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Log2Q20 =
    copy(left = newLeft, right = newRight)
}
