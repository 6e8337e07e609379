package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Vector math over array<double> columns. Uses the native codegen'd
  * `graft_dot` expression (graft.functions.DotProductD) when the
  * session has GraftExtensions installed, else the composable
  * higher-order-function form — numerically identical (both fold
  * left-to-right in index order). */
object VectorMath {

  def dot(s: SparkSession, a: String, b: String): Column =
    if (s.catalog.functionExists("graft_dot")) expr(s"graft_dot($a, $b)")
    else expr(
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")

  def norm(s: SparkSession, v: String): Column = sqrt(dot(s, v, v))
}
