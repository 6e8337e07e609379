package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic-window breadth + skew-mitigation patterns.
  */
object WindowSkewQueries {

  // ---------------------------------------------------------------- q43
  /** Exact interpolated percentiles (OLAP staple; Spark `percentile` and
    * DuckDB `quantile_cont` both interpolate at rank p·(n−1)). The
    * approximate-sketch variant for 100 TB is `approx_percentile` —
    * registered as q53 below with a rank-error-contract oracle. */
  private def q43(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      // ONE array-percentile call per column: each scalar percentile()
      // maintains its own per-group value buffer, so asking for three
      // quantiles of l_quantity separately would buffer (and merge) the
      // column three times
      .agg(
        expr("percentile(l_quantity, array(0.25D, 0.5D, 0.9D))").as("qs"),
        expr("percentile(l_extendedprice, 0.5)").as("mp"))
      .select(col("l_returnflag"),
        Det.rate(col("qs")(0)).as("p25"),
        Det.rate(col("qs")(1)).as("p50"),
        Det.rate(col("qs")(2)).as("p90"),
        Det.money(col("mp")).as("median_price"))
      .orderBy(col("l_returnflag"))

  private val q43Sql =
    """SELECT l_returnflag,
      | floor((quantile_cont(l_quantity, 0.25)) * 1e6 + 0.5) / 1e6 AS p25,
      | floor((quantile_cont(l_quantity, 0.5)) * 1e6 + 0.5) / 1e6 AS p50,
      | floor((quantile_cont(l_quantity, 0.9)) * 1e6 + 0.5) / 1e6 AS p90,
      | floor((quantile_cont(l_extendedprice, 0.5)) * 100.0 + 0.5) / 100.0 AS median_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Approximate percentiles, oracle-checked by CONTRACT (VERDICT r1
    * "what's missing" #5 — same trick as q16's HLL bound): the
    * approx_percentile sketch value is engine-specific (and its
    * partition-merge order even run-specific), but its rank-error
    * guarantee is checkable. For each (group, p) we compute the fraction
    * of rows strictly below / at-or-below the approximate value and
    * assert p lies within [frac_lt − ε, frac_le + ε] (ε = 0.01 ≫ the
    * 1/accuracy = 1e-4 guarantee; frac_le−frac_lt absorbs the
    * discrete-value mass at the quantile). The emitted row carries the
    * EXACT interpolated percentile (both engines compute it identically)
    * plus the bound boolean, so DuckDB's side is `true` and any
    * out-of-contract sketch flips the hash.
    *
    * 100 TB note: this q is the validation harness; production uses the
    * approx column alone — one pass, fixed-size mergeable sketches, no
    * full sort — where q43's exact percentile would need a per-group
    * global sort. */
  private val Ps = Seq(0.25, 0.5, 0.9)

  private def q53(s: SparkSession, dir: String): DataFrame = {
    val pArr = Ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("rf"), col("l_quantity").cast("double").as("x"))
    val approx = li.groupBy(col("rf"))
      .agg(expr(s"approx_percentile(x, $pArr, 10000)").as("av"),
        expr(s"percentile(x, $pArr)").as("ev"))
      .select(col("rf"), posexplode(arrays_zip(col("av"), col("ev"))).as(Seq("pi", "z")))
      .select(col("rf"), col("pi"),
        element_at(typedLit(Ps), col("pi") + 1).as("p"),
        col("z.av").as("av"), col("z.ev").as("ev"))
    li.join(broadcast(approx), Seq("rf"))
      .groupBy(col("rf"), col("p"))
      .agg(
        first(col("ev")).as("ev"),
        first(col("av")).as("av"),
        count(lit(1)).as("n"),
        sum(when(col("x") < col("av"), 1L).otherwise(0L)).as("n_lt"),
        sum(when(col("x") <= col("av"), 1L).otherwise(0L)).as("n_le"))
      .select(
        col("rf"), col("p"),
        Det.rate(col("ev")).as("exact_pct"),
        ((col("n_lt").cast("double") / col("n") <= col("p") + 0.01) &&
          (col("n_le").cast("double") / col("n") >= col("p") - 0.01)).as("within_tol"))
      .orderBy(col("rf"), col("p"))
  }

  private val q53Sql: String = {
    val branches = Ps.map(p =>
      s"""SELECT l_returnflag AS rf, $p AS p,
         | floor((quantile_cont(l_quantity, $p)) * 1e6 + 0.5) / 1e6 AS exact_pct,
         | true AS within_tol
         |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY rf, p")
  }

  // ---------------------------------------------------------------- q44
  /** Window-function suite: rank / ntile / running sum / lag delta per
    * customer order history, all over ONE window partitioning (a single
    * sort per customer serves every function — Catalyst collapses same-
    * spec windows into one Window operator). */
  private def q44(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"),
        ntile(4).over(w).cast("long").as("quartile"),
        Det.money(sum(col("o_totalprice")).over(wRows)).as("running_total"),
        Det.money(coalesce(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), lit(0.0)))
          .as("delta_prev"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q44Sql =
    """SELECT o_custkey, o_orderkey,
      | row_number() OVER w AS rn,
      | rank() OVER w AS rk,
      | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      | floor((sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |        ROWS UNBOUNDED PRECEDING)) * 100.0 + 0.5) / 100.0 AS running_total,
      | floor((coalesce(o_totalprice - lag(o_totalprice, 1) OVER w, 0)) * 100.0 + 0.5) / 100.0 AS delta_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q45
  /** Two-stage salted aggregation — the hot-key mitigation pattern.
    * events has only 5 event_type values, so a single-stage final agg
    * lands each key on one reducer; salting by pmod(event_id, 8) spreads
    * each hot key over 8 reducers in stage 1 and merges 5×8 partials in
    * stage 2. (For plain count/sum Spark's map-side partial aggregation
    * already absorbs most of this; the pattern is essential when the
    * per-key state is large — collect_list/distinct — or on skewed JOIN
    * keys, where AQE skew-join or key salting is the fix.) Result is
    * algebraically identical to a direct GROUP BY, which is the oracle. */
  private def q45(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("value")).as("ps"))
      .groupBy(col("event_type"))
      .agg(sum(col("pc")).as("n"), Det.rnd(sum(col("ps")), 4).as("sum_value"))
      .orderBy(col("event_type"))

  private val q45Sql =
    """SELECT event_type, count(*) AS n,
      | floor((sum(value)) * 1e4 + 0.5) / 1e4 AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q43_percentiles", Some(q43Sql), q43),
    QuerySpec("q44_window_suite", Some(q44Sql), q44),
    QuerySpec("q45_skew_salted", Some(q45Sql), q45),
    QuerySpec("q53_approx_percentile", Some(q53Sql), q53),
  )
}
