package graft.plans

import graft.functions.{DotProductD, LevenshteinD, LnSmall, Log2Q20, LshSignCodes, Md5Keyed, MinHashHex, OuterMoments, RpMoments, TopKLongs}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SparkSessionExtensions): registers graft's
  * native expressions as SQL functions. Install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (done by Verify/Bench/tests) or `withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Evaluate a function argument that MUST be an integer literal
    * (permutation counts, plane counts, distance bounds — values baked
    * into the expression at plan time). A non-foldable argument (a
    * column, say) would otherwise die inside `eval()` with an opaque
    * Unevaluable/ClassCast error mid-analysis; surface the standard
    * NON_FOLDABLE_INPUT / UNEXPECTED_INPUT_TYPE analysis errors naming
    * the function and argument instead. */
  private def intLit(fn: String, argName: String, e: Expression): Int = {
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
        messageParameters = Map(
          "sqlExpr" -> s""""$fn"""",
          "inputName" -> s"`$argName`",
          "inputType" -> "\"INT\"",
          "inputExpr" -> s""""${e.sql}""""),
        cause = None)
    e.eval() match {
      case n: Number => n.intValue
      case _ =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE",
          messageParameters = Map(
            "sqlExpr" -> s""""$fn"""",
            "paramIndex" -> s"`$argName`",
            "requiredType" -> "\"INT\"",
            "inputSql" -> s""""${e.sql}"""",
            "inputType" -> s""""${e.dataType.catalogString}""""),
          cause = None)
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductD(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_codes"),
      new ExpressionInfo(classOf[LshSignCodes].getName, "graft_lsh_codes"),
      (children: Seq[Expression]) => {
        // (v, seed, tables, planes, dim) — trailing four are int literals
        def lit(name: String, e: Expression) = intLit("graft_lsh_codes", name, e)
        LshSignCodes(children(0), lit("seed", children(1)), lit("tables", children(2)),
          lit("planes", children(3)), lit("dim", children(4)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lev"),
      new ExpressionInfo(classOf[LevenshteinD].getName, "graft_lev"),
      (children: Seq[Expression]) =>
        // optional 3rd arg: distance bound k (int literal) → banded kernel
        LevenshteinD(children(0), children(1),
          children.drop(2).headOption.map(intLit("graft_lev", "k", _)))))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_keyed"),
      new ExpressionInfo(classOf[Md5Keyed].getName, "graft_md5_keyed"),
      (children: Seq[Expression]) =>
        Md5Keyed(children(0), intLit("graft_md5_keyed", "n", children(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_ln_small"),
      new ExpressionInfo(classOf[LnSmall].getName, "graft_ln_small"),
      (children: Seq[Expression]) => LnSmall(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_log2q20"),
      new ExpressionInfo(classOf[Log2Q20].getName, "graft_log2q20"),
      (children: Seq[Expression]) => Log2Q20(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_hex"),
      new ExpressionInfo(classOf[MinHashHex].getName, "graft_minhash_hex"),
      (children: Seq[Expression]) =>
        MinHashHex(children(0), intLit("graft_minhash_hex", "n", children(1)))
          .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_outer_moments"),
      new ExpressionInfo(classOf[OuterMoments].getName, "graft_outer_moments"),
      (children: Seq[Expression]) =>
        OuterMoments(children(0), intLit("graft_outer_moments", "d", children(1)))
          .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_rp_moments"),
      new ExpressionInfo(classOf[RpMoments].getName, "graft_rp_moments"),
      (children: Seq[Expression]) => {
        // (v, kdim, dim, quant) — trailing three are int literals
        def lit(name: String, e: Expression) = intLit("graft_rp_moments", name, e)
        RpMoments(children(0), lit("kdim", children(1)), lit("dim", children(2)),
          lit("quant", children(3)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKLongs].getName, "graft_topk"),
      (children: Seq[Expression]) =>
        TopKLongs(children(0), intLit("graft_topk", "k", children(1)))
          .toAggregateExpression()))
    ext.injectOptimizerRule(_ => new FuseDotProduct)
  }
}
