package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator suite — every kernel from SURVEY.md §2
  * instantiated over the driver testdata tables (FIXTURES.md §2.1), each
  * with a DuckDB oracle twin.
  *
  * Scale notes (100 TB): every aggregation here is a declarative
  * groupBy/agg so Catalyst plans partial (map-side) + final hash
  * aggregation — only per-group partials shuffle. Dimension tables
  * (nation 25 rows, region 5) are explicitly `broadcast()`; fact-fact
  * joins (lineitem ⋈ orders) are left to Catalyst/AQE which picks
  * sort-merge with skew handling at scale.
  */
object RelationalQueries {

  /** orders.o_orderstatus → WLD result enum (battle_filters.py:38-49 shape:
    * a 3-way CASE over a comparison/status). */
  private def orderResult: Column =
    when(col("o_orderstatus") === "F", "win")
      .when(col("o_orderstatus") === "O", "loss")
      .otherwise("draw")

  private def lineResult: Column =
    when(col("l_returnflag") === "A", "win")
      .when(col("l_returnflag") === "R", "loss")
      .otherwise("draw")

  private def netPrice: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  private def wldSelect: Seq[Column] = Seq(
    col("games"), col("wins"), col("losses"), col("draws"), Wld.winRate)

  // ---------------------------------------------------------------- q01
  /** Global summary — user_analytics.py:210-234: zero group keys, WLD
    * counts + rate. */
  private def q01(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(orderResult.as("result"))
      .agg(Wld.counts(col("result")).head, Wld.counts(col("result")).tail: _*)
      .select(wldSelect: _*)

  private val q01Sql =
    """SELECT count(*) AS games,
      | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
      | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS losses,
      | CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O') THEN 1 ELSE 0 END) AS BIGINT) AS draws,
      | floor((CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS win_rate
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Grouped WLD aggregation (TPC-H Q1 flavor) — the §2.5 kernel with
    * 2-column group keys; partial aggregation shuffles ~6 groups, not rows. */
  private def q02(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("games"),
        Det.money(sum(col("l_quantity"))).as("sum_qty"),
        Det.money(sum(netPrice)).as("revenue"),
        Det.rate(avg(col("l_discount"))).as("avg_disc"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q02Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS games,
      | floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
      | floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
      | floor((avg(l_discount)) * 1e6 + 0.5) / 1e6 AS avg_disc
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Filter + normalize projection (battle_filters.py:100-124 shape):
    * predicate pushed to the parquet scan, CASE-derived result column. */
  private def q03(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") && col("l_quantity") < 25)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        lineResult.as("result"),
        Det.money(netPrice).as("net_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q03Sql =
    """SELECT l_orderkey, l_linenumber,
      | CASE WHEN l_returnflag = 'A' THEN 'win' WHEN l_returnflag = 'R' THEN 'loss' ELSE 'draw' END AS result,
      | floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS net_price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_quantity < 25
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Star join orders ⋈ customer ⋈ nation ⋈ region (deck_type.py:16
    * broadcast-dimension lookup generalized). nation/region broadcast;
    * orders ⋈ customer left to AQE (sort-merge at 100 TB). */
  private def q04(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("orders_cnt"),
        Det.money(sum(col("o_totalprice"))).as("revenue"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("finished"))
      .orderBy(col("r_name"), col("n_name"))

  private val q04Sql =
    """SELECT r_name, n_name, count(*) AS orders_cnt,
      | floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS revenue,
      | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q05
  /** Priority rule cascade (classify_deck, deck_type.py:85-152 shape):
    * ordered CASE over row features → class, then per-class stats. */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val segClass =
      when(col("c_acctbal") < 0, "debt")
        .when(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000, "big_building")
        .when(col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"), "industrial")
        .otherwise("other")
    Tables.customer(s, dir)
      .select(segClass.as("segment_class"), col("c_acctbal"))
      .groupBy(col("segment_class"))
      .agg(count(lit(1)).as("n"), Det.rnd(avg(col("c_acctbal")), 4).as("avg_bal"))
      .orderBy(col("segment_class"))
  }

  private val q05Sql =
    """SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
      |            WHEN c_mktsegment = 'BUILDING' AND c_acctbal > 5000 THEN 'big_building'
      |            WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN 'industrial'
      |            ELSE 'other' END AS segment_class,
      | count(*) AS n, floor((avg(c_acctbal)) * 1e4 + 0.5) / 1e4 AS avg_bal
      |FROM customer GROUP BY 1 ORDER BY segment_class""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Share-of-total + sample_ok flag (meta_llm_tables.py:8-76). The
    * total is a 1-row broadcast over the already-aggregated tiny table
    * (#segments rows), not the fact table — safe at any scale. */
  private def q06(s: SparkSession, dir: String): DataFrame =
    Share.of(
        Tables.customer(s, dir)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("games")),
        "games", "share")
      .withColumn("sample_ok", col("games") >= 20)
      .orderBy(col("games").desc, col("c_mktsegment"))

  private val q06Sql =
    """SELECT c_mktsegment, count(*) AS games,
      | floor((CAST(count(*) AS DOUBLE) / sum(count(*)) OVER ()) * 1e6 + 0.5) / 1e6 AS share,
      | count(*) >= 20 AS sample_ok
      |FROM customer GROUP BY c_mktsegment
      |ORDER BY games DESC, c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Symmetric matchup matrix (meta_analytics.py:41-102): customer-nation
    * vs supplier-nation, every row counted once from each side. The POV
    * doubling is a single-pass explode of a 2-element struct array —
    * no self-union rescan (the Spark-first form of the reference's
    * `pd.concat` doubling). */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val cn = Tables.nation(s, dir).select(col("n_nationkey").as("cn_key"), col("n_name").as("cn_name"))
    val sn = Tables.nation(s, dir).select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))
    // nation NAMES attach AFTER the aggregate (nationkey → name is a
    // bijection on the 25-row dim): the fact-side pipeline carries two
    // ints instead of two strings through the explode and hashes int
    // group keys over ~n²·|res| cells, and two of the six broadcast
    // stages move to the 625-row aggregate
    val base = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("ak"), col("s_nationkey").as("bk"), lineResult.as("res"))
    base
      .select(explode(array(
        struct(col("ak"), col("bk"), col("res")),
        struct(col("bk").as("ak"), col("ak").as("bk"), Wld.flip(col("res")).as("res")))).as("p"))
      .select(col("p.ak").as("ak"), col("p.bk").as("bk"), col("p.res").as("res"))
      .groupBy(col("ak"), col("bk"))
      .agg(Wld.counts(col("res")).head, Wld.counts(col("res")).tail: _*)
      .join(broadcast(cn), col("ak") === col("cn_key"))
      .join(broadcast(sn), col("bk") === col("sn_key"))
      .select(Seq(col("cn_name").as("side_a"), col("sn_name").as("side_b")) ++ wldSelect: _*)
      .orderBy(col("side_a"), col("side_b"))
  }

  private val q07Sql =
    """WITH base AS (
      |  SELECT cn.n_name AS a, sn.n_name AS b,
      |         CASE WHEN l_returnflag = 'A' THEN 'win' WHEN l_returnflag = 'R' THEN 'loss' ELSE 'draw' END AS res
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |), sym AS (
      |  SELECT a, b, res FROM base
      |  UNION ALL
      |  SELECT b AS a, a AS b,
      |         CASE WHEN res = 'win' THEN 'loss' WHEN res = 'loss' THEN 'win' ELSE res END AS res
      |  FROM base
      |)
      |SELECT a AS side_a, b AS side_b, count(*) AS games,
      | CAST(sum(CASE WHEN res = 'win' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
      | CAST(sum(CASE WHEN res = 'loss' THEN 1 ELSE 0 END) AS BIGINT) AS losses,
      | CAST(sum(CASE WHEN res NOT IN ('win','loss') THEN 1 ELSE 0 END) AS BIGINT) AS draws,
      | floor((CAST(sum(CASE WHEN res = 'win' THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS win_rate
      |FROM sym GROUP BY a, b ORDER BY side_a, side_b""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Top-k with unique tiebreak (§2.7): aggregate lineitem BEFORE the part
    * join (partial agg shrinks the join input), then TakeOrderedAndProject. */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val pr = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(Det.money(sum(netPrice)).as("revenue"))
    pr.join(Tables.part(s, dir).select(col("p_partkey"), col("p_name")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("p_partkey"))
      .limit(10)
  }

  private val q08Sql =
    """SELECT p_partkey, p_name, revenue FROM (
      |  SELECT p_partkey, p_name, floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_partkey, p_name
      |) pr ORDER BY revenue DESC, p_partkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Per-group recency limit (meta_workflow.py:329-331 "take 10 most
    * recent per player"): row_number window with a total order. */
  private def q09(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc))
        .cast("long"))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_id"), col("event_type"))
      .orderBy(col("user_id"), col("rn"))

  private val q09Sql =
    """SELECT user_id, rn, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) t WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin

  // ---------------------------------------------------------------- q10/q11
  /** Anti join (fetched-tag exclusion, meta_workflow.py:321-323). */
  private def q10(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val q10Sql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Semi join — customers with at least one order. */
  private def q11(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"), Det.money(col("c_acctbal")).as("acctbal"))
      .orderBy(col("c_custkey"))

  private val q11Sql =
    """SELECT c_custkey, c_mktsegment, floor((c_acctbal) * 100.0 + 0.5) / 100.0 AS acctbal FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Full-outer count merge + zero-fill against a domain table
    * (meta_workflow.py:401-415 + meta_analytics.py:194-197). */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("k")).agg(count(lit(1)).as("nc"))
    val p = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("k2")).agg(count(lit(1)).as("ns"))
    val merged = c.join(p, col("k") === col("k2"), "full_outer")
      .select(coalesce(col("k"), col("k2")).as("k"), col("nc"), col("ns"))
    Tables.nation(s, dir)
      .join(broadcast(merged), col("n_nationkey") === col("k"), "left")
      .select(col("n_name"),
        coalesce(col("nc"), lit(0L)).as("customers"),
        coalesce(col("ns"), lit(0L)).as("suppliers"))
      .orderBy(col("n_name"))
  }

  private val q12Sql =
    """WITH c AS (SELECT c_nationkey AS k, count(*) AS nc FROM customer GROUP BY 1),
      |     s AS (SELECT s_nationkey AS k, count(*) AS ns FROM supplier GROUP BY 1),
      |     m AS (SELECT coalesce(c.k, s.k) AS k, nc, ns FROM c FULL OUTER JOIN s ON c.k = s.k)
      |SELECT n_name,
      | CAST(coalesce(nc, 0) AS BIGINT) AS customers,
      | CAST(coalesce(ns, 0) AS BIGINT) AS suppliers
      |FROM nation LEFT JOIN m ON n_nationkey = m.k
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Unpivot of a 1-row summary into {metric, value} rows
    * (user_workflow.py:39-43). */
  private def q13(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .agg(
        count(lit(1)).cast("double").as("games"),
        countDistinct(col("o_custkey")).cast("double").as("buyers"),
        Det.money(sum(col("o_totalprice"))).as("revenue"),
        Det.rnd(avg(col("o_totalprice")), 4).as("avg_price"))
      .unpivot(Array.empty[Column], Array(col("games"), col("buyers"), col("revenue"), col("avg_price")),
        "metric", "value")
      .orderBy(col("metric"))

  private val q13Sql =
    """WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS games,
      |                  CAST(count(DISTINCT o_custkey) AS DOUBLE) AS buyers,
      |                  floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS revenue,
      |                  floor((avg(o_totalprice)) * 1e4 + 0.5) / 1e4 AS avg_price FROM orders)
      |SELECT 'avg_price' AS metric, avg_price AS value FROM s
      |UNION ALL SELECT 'buyers' AS metric, buyers FROM s
      |UNION ALL SELECT 'games' AS metric, games FROM s
      |UNION ALL SELECT 'revenue' AS metric, revenue FROM s
      |ORDER BY metric""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Role-tagged best∪worst union (user_workflow.py:120-205). Reference
    * quirk preserved: "worst" is the reversal of the sorted list ≡ the
    * opposite total sort (SURVEY §2.7). */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val pr = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(Det.money(sum(netPrice)).as("revenue"))
    val best = pr.orderBy(col("revenue").desc, col("p_partkey")).limit(5)
      .withColumn("role", lit("best"))
    val worst = pr.orderBy(col("revenue").asc, col("p_partkey")).limit(5)
      .withColumn("role", lit("worst"))
    best.unionByName(worst)
      .select(col("role"), col("p_partkey"), col("revenue"))
      .orderBy(col("role"), col("p_partkey"))
  }

  private val q14Sql =
    """WITH pr AS (SELECT l_partkey AS p_partkey, floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
      |            FROM lineitem GROUP BY 1),
      |     best AS (SELECT p_partkey, revenue FROM pr ORDER BY revenue DESC, p_partkey LIMIT 5),
      |     worst AS (SELECT p_partkey, revenue FROM pr ORDER BY revenue ASC, p_partkey LIMIT 5)
      |SELECT role, p_partkey, revenue FROM (
      |  SELECT 'best' AS role, p_partkey, revenue FROM best
      |  UNION ALL
      |  SELECT 'worst' AS role, p_partkey, revenue FROM worst
      |) u ORDER BY role, p_partkey""".stripMargin

  // ---------------------------------------------------------------- q15/q16
  /** Exact distinct aggregation ⊕ (SURVEY §2.5 distinct-agg row). */
  private def q15(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  private val q15Sql =
    """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** HLL sketch distinct ⊕ — approx_count_distinct. At 100 TB this replaces
    * the expensive exact distinct shuffle with fixed-size mergeable sketches.
    * The sketch value is engine-specific, so the oracle-checkable contract is
    * the error bound, not the estimate: emit per-group exact, n, and
    * `within_tol = |approx-exact|/exact <= 0.10` (rsd=0.02 ⇒ 5σ margin;
    * rsd=0.01 would need p=14 / 16K registers whose out-of-codegen
    * update+merge path costs ~1 s at this scale for no extra value);
    * DuckDB's side is trivially `true`, so any out-of-bound sketch flips the
    * hash and fails the gate. Exact distinct here exists only to state the
    * bound — production callers use the approx column alone. */
  private def q16(s: SparkSession, dir: String): DataFrame =
    // Shape note: do NOT co-plan countDistinct with approx_count_distinct
    // in one agg — the distinct-agg rewrite keys the partial aggregate by
    // (event_type, user_id) and allocates a 16 KB rsd=0.01 HLL buffer per
    // distinct user (gigabytes of state). Instead dedup on the pair
    // first, then take exact = count, n = sum of per-pair counts, and the
    // HLL over the already-distinct user ids — an HLL sketch depends only
    // on the distinct value set, so the estimate is identical, and the
    // expensive sketch updates run on the deduped rows.
    Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("exact_users"),
        sum(col("c")).as("n"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .select(
        col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx") - col("exact_users")).cast("double") /
          col("exact_users") <= 0.10).as("within_tol"))
      .orderBy(col("event_type"))

  private val q16Sql =
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      | count(*) AS n, true AS within_tol
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q17/q18
  /** Rollup ⊕ — subtotal hierarchy; 'ALL' coalesce keeps null-ordering
    * identical across engines. */
  private def q17(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), Det.money(sum(col("l_quantity"))).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))

  private val q17Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      | count(*) AS n, floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  private def q18(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), Det.money(sum(col("l_quantity"))).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))

  private val q18Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      | count(*) AS n, floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Deterministic exact-k sample (sampling.py:5-31 analogue). The
    * reference's unseeded random.sample is replaced by a value-hash order
    * — pseudo-random, engine-independent, and oracle-checkable (md5 is
    * bit-identical in Spark and DuckDB), unlike rand(seed) whose output
    * depends on partition layout. */
  private def q19(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
      .limit(10)
      .select(col("c_custkey"), col("c_name"))

  private val q19Sql =
    """SELECT c_custkey, c_name FROM customer
      |ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey LIMIT 10""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q01_global_summary", Some(q01Sql), q01),
    QuerySpec("q02_wld_agg", Some(q02Sql), q02),
    QuerySpec("q03_filter_project", Some(q03Sql), q03, aqe = false),
    QuerySpec("q04_star_join", Some(q04Sql), q04),
    QuerySpec("q05_rule_classify", Some(q05Sql), q05),
    QuerySpec("q06_share_of_total", Some(q06Sql), q06),
    QuerySpec("q07_symmetric_matchups", Some(q07Sql), q07, aqe = false),
    QuerySpec("q08_topk_revenue", Some(q08Sql), q08),
    QuerySpec("q09_window_recency", Some(q09Sql), q09),
    QuerySpec("q10_anti_join", Some(q10Sql), q10),
    QuerySpec("q11_semi_join", Some(q11Sql), q11),
    QuerySpec("q12_fullouter_zerofill", Some(q12Sql), q12),
    QuerySpec("q13_unpivot_summary", Some(q13Sql), q13),
    QuerySpec("q14_role_union", Some(q14Sql), q14),
    QuerySpec("q15_distinct_exact", Some(q15Sql), q15),
    QuerySpec("q16_distinct_approx", Some(q16Sql), q16),
    QuerySpec("q17_rollup", Some(q17Sql), q17),
    QuerySpec("q18_cube", Some(q18Sql), q18),
    QuerySpec("q19_hash_sample", Some(q19Sql), q19),
  )
}
