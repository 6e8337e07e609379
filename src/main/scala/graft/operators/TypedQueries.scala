package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pivot + typed per-group operators (API-surface breadth). */
object TypedQueries {

  // ---------------------------------------------------------------- q50
  /** Relational pivot with an explicit value list (explicit values keep
    * the output schema deterministic and skip the extra distinct-values
    * job Spark otherwise runs). Missing (priority, status) combinations
    * stay null in both engines (sum over empty). */
  private def q50(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(Det.money(sum(col("o_totalprice"))))
      .orderBy(col("o_orderpriority"))

  private val q50Sql =
    """SELECT o_orderpriority,
      | floor((sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)) * 100.0 + 0.5) / 100.0 AS F,
      | floor((sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END)) * 100.0 + 0.5) / 100.0 AS O,
      | floor((sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END)) * 100.0 + 0.5) / 100.0 AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Typed KeyValueGroupedDataset.mapGroups — genuine per-group
    * imperative logic (the "RDD-tier" escape hatch, used sparingly per
    * SURVEY §7): per-user inter-arrival gap statistics with an exact
    * interpolated median, matching DuckDB's quantile_cont formula.
    * Scale: groups are single users (bounded state); the shuffle is the
    * same hash-partition a groupBy would do. */
  final case class UserGaps(user_id: Long, n_events: Long, median_gap_s: Option[Double])

  private def quantileCont(sorted: Array[Double], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  private def q51(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .mapGroups { (uid, rows) =>
        val tsMs = rows.map(_._2.getTime).toArray.sorted
        if (tsMs.length < 2) UserGaps(uid, tsMs.length.toLong, None)
        else {
          val gaps = tsMs.sliding(2).map(p => (p(1) - p(0)) / 1000.0).toArray
          val med = quantileCont(gaps.sorted, 0.5)
          UserGaps(uid, tsMs.length.toLong, Some(math.floor(med * 1e4 + 0.5) / 1e4))
        }
      }
      .toDF()
      .orderBy(col("user_id"))
  }

  private val q51Sql =
    """WITH g AS (
      |  SELECT user_id,
      |         (epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) / 1000.0 AS gap_s
      |  FROM events
      |)
      |SELECT user_id, count(*) AS n_events,
      |       floor((quantile_cont(gap_s, 0.5)) * 1e4 + 0.5) / 1e4 AS median_gap_s
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q50_pivot", Some(q50Sql), q50),
    QuerySpec("q51_typed_mapgroups", Some(q51Sql), q51, aqe = false),
  )
}
