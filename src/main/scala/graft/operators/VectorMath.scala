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

  /** Cosine similarity with the zero-norm contract: when either side
    * has zero norm (an all-zero embedding in the corpus, or a derived
    * centroid whose members cancel) the ratio is 0/0 — undefined.
    * Degrade deterministically to 0.0 ("similar to nothing" — the
    * convention that stays safe under `sim >= t` gates and DESC top-k
    * ordering, where a NULL would sort FIRST) instead of Spark's ANSI
    * DIVIDE_BY_ZERO error / DuckDB's IEEE NaN. Surfaced by the 100×
    * replica sweep's degenerate-denominator audit. */
  def cosine(s: SparkSession, a: String, b: String, na: Column, nb: Column): Column =
    when(na * nb === lit(0.0), lit(0.0)).otherwise(dot(s, a, b) / (na * nb))

  /** Oracle-side (DuckDB) twin of [[cosine]] — same zero-norm contract,
    * same expression shape, for the hand-written oracle texts. */
  def cosineSql(a: String, b: String, na: String, nb: String): String =
    s"CASE WHEN $na * $nb = 0 THEN 0.0 ELSE list_dot_product($a, $b) / ($na * $nb) END"
}
