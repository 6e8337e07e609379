package graft.plans

import graft.functions.{DotProductD, LevenshteinD, LshSignCodes, Md5Keyed}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SparkSessionExtensions): registers graft's
  * native expressions as SQL functions. Install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (done by Verify/Bench/tests) or `withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
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
        def intLit(e: Expression): Int = e.eval().asInstanceOf[Number].intValue
        LshSignCodes(children(0), intLit(children(1)), intLit(children(2)),
          intLit(children(3)), intLit(children(4)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lev"),
      new ExpressionInfo(classOf[LevenshteinD].getName, "graft_lev"),
      (children: Seq[Expression]) =>
        // optional 3rd arg: distance bound k (int literal) → banded kernel
        LevenshteinD(children(0), children(1),
          children.drop(2).headOption.map(_.eval().asInstanceOf[Number].intValue))))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_keyed"),
      new ExpressionInfo(classOf[Md5Keyed].getName, "graft_md5_keyed"),
      (children: Seq[Expression]) =>
        Md5Keyed(children(0), children(1).eval().asInstanceOf[Number].intValue)))
    ext.injectOptimizerRule(_ => new FuseDotProduct)
  }
}
