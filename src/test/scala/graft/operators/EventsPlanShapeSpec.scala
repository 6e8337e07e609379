package graft.operators

import graft.SparkSpec

/** Plan pins for the events scan path.
  *
  * Until round 7 the events loader DERIVED `ts` from nanos-as-long
  * `DIV` arithmetic, so no ts predicate could ever reach the parquet
  * reader. With the schema-dispatch loader ([[graft.Tables.events]])
  * the µs generation surfaces `ts` scan-native — these pins hold the
  * recovered pushdown so a future loader change can't silently regress
  * it back to a full-scan-then-filter shape. */
class EventsPlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = graft.QueryCatalog.all.find(_.name == name).get.fn(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("q107: the ts range predicate is pushed into the parquet scan") {
    val p = finalPlan("q107_pruned_window")
    assert(p.contains("PushedFilters:"), s"no pushdown metadata in plan:\n$p")
    assert(p.contains("GreaterThanOrEqual(ts,") && p.contains("LessThan(ts,"),
      s"ts range must reach the scan as pushed filters (row-group stats " +
        s"pruning; partition pruning on a date-partitioned table):\n$p")
    // and the scan must not read columns the query never touches
    assert(!p.contains("props#") || !p.substring(p.indexOf("ReadSchema"))
      .contains("props"), s"props must be pruned from the events scan:\n$p")
  }

  test("events scan-native ts: a bare range filter pushes and prunes columns") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp"))
      .select(col("event_id"), col("ts"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(ts,"),
      s"ts lower bound must push into the scan:\n$p")
    val read = p.substring(p.indexOf("ReadSchema"))
    assert(read.contains("event_id") && read.contains("ts") &&
      !read.contains("props") && !read.contains("event_type"),
      s"scan must read only the projected columns:\n$p")
  }
}
