package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic-window breadth + skew-mitigation patterns.
  */
object WindowSkewQueries {

  // ---------------------------------------------------------------- q43
  /** Exact interpolated percentiles (OLAP staple; both engines
    * interpolate at rank p·(n−1)) — BUCKETED TWO-PASS selection, never
    * buffering raw values per group:
    *
    *  - pass A shuffles only coarse (group, col, bucket) counts; a
    *    cumulative count over that tiny table gives each bucket its
    *    global rank interval [c_start, c_end) and locates, per target
    *    rank klo = ⌊p(n−1)⌋ / khi = ⌈·⌉, the bucket containing it;
    *  - pass B re-scans, keeps only rows inside a chosen bucket (a
    *    ~1/|buckets| sliver), sorts within (group, col, bucket), and
    *    lifts local row numbers by c_start to global ranks — the rows
    *    at klo/khi ARE the bracketing values, and
    *    v_lo + (r−klo)·(v_hi−v_lo) is the interpolation both engines
    *    define.
    *
    * Scale: the old `percentile()` form buffered every raw value in one
    * task per group (~2·10⁹ values/group at 100×). Here nothing ever
    * holds more than one bucket's rows (~n/|buckets|; recurse the same
    * two passes inside a pathological bucket if a skewed domain needs
    * it), and the only full-data work is two codegen'd scans. For
    * one-pass streaming percentiles the sketch path is q53. */
  private def q43(s: SparkSession, dir: String): DataFrame = {
    // Pass A — coarse bucket counts: both measure columns unpivot into
    // (g, c, bucket) rows and ONLY bucket counts shuffle (map-side
    // combine collapses each partition to its distinct buckets — a few
    // hundred rows total). A cumulative count over the tiny bucket
    // table locates, for each target rank, the bucket that contains it
    // and that bucket's starting global rank.
    def unpivoted(width: Double) = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"),
        explode(array(
          struct(lit("q").as("c"), col("l_quantity").cast("double").as("v")),
          struct(lit("m").as("c"), col("l_extendedprice").cast("double").as("v"))))
          .as("e"))
      .select(col("g"), col("e.c").as("c"), col("e.v").as("v"),
        // qty is a ~50-value integer domain → unit buckets; price
        // spans ~[900, 105k] → ~100 buckets of 1000
        when(col("e.c") === "q", col("e.v"))
          .otherwise(floor(col("e.v") / width)).cast("long").as("bk"))
    val W = 1000.0
    val part = Window.partitionBy(col("g"), col("c"))
    val buckets = unpivoted(W).groupBy(col("g"), col("c"), col("bk"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("c_end", sum(col("cnt")).over(part.orderBy(col("bk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("c_start", col("c_end") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(part))
    def covers(k: Column) = k >= col("c_start") && k < col("c_end")
    // `chosen` is consumed three times (qtyBracket, the sliver
    // broadcast, the probe broadcast) and its lineage contains the full
    // pass-A scan — without a pin, each consumer could re-run pass A
    // and the documented two-scan budget becomes optimizer luck. The
    // frame is bounded (|groups|·|cols|·|ps|·≤2 covering buckets, a few
    // dozen rows), so collect it once into a LocalRelation instead of
    // persist(): same single pass-A execution, zero cache entries to
    // leak in a long-lived session (the drift-monitor collect-once
    // precedent), and the downstream broadcasts become driver-local.
    val chosen = {
      val chosenPlan = buckets
        .select(col("g"), col("c"), col("bk"), col("c_start"), col("c_end"), col("n"),
          explode(typedLit(Seq(0.25, 0.5, 0.9))).as("p"))
        .filter(col("c") === "q" || col("p") === 0.5) // price: median only
        .withColumn("r", col("p") * (col("n") - 1))
        .withColumn("klo", floor(col("r")).cast("long"))
        .withColumn("khi", ceil(col("r")).cast("long"))
        .filter(covers(col("klo")) || covers(col("khi")))
      s.createDataFrame(java.util.Arrays.asList(chosenPlan.collect(): _*),
        chosenPlan.schema)
    }
    // qty's unit buckets mean pass A already holds its values
    // (bk == v), so the quantity percentiles come straight off the
    // chosen buckets with no second scan
    val qtyBracket = chosen.filter(col("c") === "q")
      .groupBy(col("g"), col("c"), col("p"), col("r"), col("klo"))
      .agg(max(when(covers(col("klo")), col("bk").cast("double"))).as("vlo"),
        max(when(covers(col("khi")), col("bk").cast("double"))).as("vhi"))
    // Pass B (price only) — re-scan, keep only rows inside a chosen
    // bucket (a ~1/|buckets| sliver), and number them within (g, bk):
    // the bucket's c_start lifts the local row number to the global
    // rank, so the two bracketing values select directly. Ties share
    // v, so row_number nondeterminism among equal values is harmless.
    val priceRows = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"), lit("m").as("c"),
        col("l_extendedprice").cast("double").as("v"))
      .withColumn("bk", floor(col("v") / W).cast("long"))
    val slivers = priceRows.join(
        broadcast(chosen.filter(col("c") === "m")
          .select(col("g"), col("c"), col("bk"), col("c_start")).distinct()),
        Seq("g", "c", "bk"))
      .withColumn("idx",
        col("c_start") - 1 + row_number().over(
          Window.partitionBy(col("g"), col("bk")).orderBy(col("v"))))
    val probes = chosen.filter(col("c") === "m")
      .select(col("g").as("pg"), col("p"), col("r"), col("klo"), col("khi"))
      .distinct() // a probe can appear once per covering bucket
    val priceBracket = slivers.join(broadcast(probes),
        col("g") === col("pg") &&
          (col("idx") === col("klo") || col("idx") === col("khi")))
      .groupBy(col("g"), col("c"), col("p"), col("r"), col("klo"))
      .agg(max(when(col("idx") === col("klo"), col("v"))).as("vlo"),
        max(when(col("idx") === col("khi"), col("v"))).as("vhi"))
    val bracket = qtyBracket.unionByName(priceBracket)
      .select(col("g"), col("c"), col("p"),
        (col("vlo") + (col("r") - col("klo")) * (col("vhi") - col("vlo")))
          .as("value"))
    def pick(c: String, p: Double) =
      max(when(col("c") === c && col("p") === p, col("value")))
    bracket.groupBy(col("g"))
      .agg(pick("q", 0.25).as("q25"), pick("q", 0.5).as("q50"),
        pick("q", 0.9).as("q90"), pick("m", 0.5).as("mp"))
      .select(col("g").as("l_returnflag"),
        Det.rate(col("q25")).as("p25"),
        Det.rate(col("q50")).as("p50"),
        Det.rate(col("q90")).as("p90"),
        Det.money(col("mp")).as("median_price"))
      .orderBy(col("l_returnflag"))
  }

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
    QuerySpec("q44_window_suite", Some(q44Sql), q44, aqe = false),
    QuerySpec("q45_skew_salted", Some(q45Sql), q45),
    QuerySpec("q53_approx_percentile", Some(q53Sql), q53),
  )
}
