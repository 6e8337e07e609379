package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DataSource V2 contract of graft.sources.v2.EventGenSource: schema,
  * partition planning, column-pruning pushdown, and row determinism. */
class EventGenSourceSpec extends SparkSpec {

  private val Fmt = "graft.sources.v2.EventGenSource"

  private def read(rows: Long, parts: Int) =
    spark.read.format(Fmt)
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("produces exactly the requested rows across the requested partitions") {
    val df = read(1000, 7)
    assert(df.count() === 1000L)
    assert(df.rdd.getNumPartitions === 7)
    assert(df.schema.fieldNames.toSeq ===
      Seq("event_id", "user_id", "event_type", "value"))
  }

  test("rows are the deterministic formula, independent of partitioning") {
    val a = read(500, 3).collect().map(_.toSeq).toSet
    val b = read(500, 11).collect().map(_.toSeq).toSet
    assert(a === b, "layout must not change content")
    val expect = (0L until 500L).map { i =>
      val (id, u, t, v) = graft.sources.v2.EventGenSource.row(i)
      Seq[Any](id, u, t, v)
    }.toSet
    assert(a === expect)
  }

  test("column pruning reaches the scan's read schema") {
    val df = read(100, 2).select(col("event_type"))
    val scanLine = df.queryExecution.executedPlan.toString.split("\n")
      .find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("event_type") && !scanLine.contains("event_id"),
      s"pruned scan must only carry the requested column: $scanLine")
    assert(df.distinct().count() === 5L)
  }

  test("event_id range filters push into the generator and shrink the scan") {
    val df = read(1000, 4)
      .filter(col("event_id") >= 100 && col("event_id") < 150)
    assert(df.count() === 50L)
    assert(df.agg(min(col("event_id")), max(col("event_id")))
      .collect().head.toSeq === Seq(100L, 149L))
    // the pushed range must shrink the planned partitions themselves:
    // 50 generated rows even before Spark's residual filter runs
    val scanned = read(1000, 4)
      .filter(col("event_id") >= 100 && col("event_id") < 150)
      .queryExecution.executedPlan.toString
    assert(scanned.contains("BatchScan"), scanned)
    // non-pushable predicate still works via the residual filter path
    val mixed = read(1000, 4)
      .filter(col("event_id") < 10 && col("event_type") === "click")
    assert(mixed.count() === 2L) // ids 0 and 5 are clicks among 0..9
  }

  test("fractional event_id bounds stay residual, never truncated-pushed") {
    import org.apache.spark.sql.sources.{EqualTo, Filter, LessThan}
    // Drive the ScanBuilder contract directly: DataFrame-level fractional
    // comparisons are usually rewritten by UnwrapCastInBinaryComparison
    // before the connector sees them, so exercise pushFilters itself.
    val cls = Class.forName("graft.sources.v2.EventGenScanBuilder")
    val ctor = cls.getDeclaredConstructors.head
    ctor.setAccessible(true)
    val sb = ctor.newInstance(
      java.lang.Long.valueOf(1000L), Integer.valueOf(4),
      java.lang.Long.valueOf(100L))
    val push = cls.getMethod("pushFilters", classOf[Array[Filter]])
    val filters: Array[Filter] =
      Array(LessThan("event_id", java.lang.Double.valueOf(4.5)),
        EqualTo("event_id", java.lang.Long.valueOf(7L)))
    val rejected = push.invoke(sb, filters).asInstanceOf[Array[Filter]]
    // the fractional bound must come back as residual (truncating it to
    // hi=4 would wrongly exclude id 4 once reported as pushed)...
    assert(rejected.toSeq === Seq(LessThan("event_id", java.lang.Double.valueOf(4.5))))
    // ...while the integral one is accepted
    val pushedM = cls.getMethod("pushedFilters")
    assert(pushedM.invoke(sb).asInstanceOf[Array[Filter]].toSeq ===
      Seq(EqualTo("event_id", java.lang.Long.valueOf(7L))))
  }

  test("micro-batch streaming: admission control paces offsets to the row cap") {
    val ckpt = java.nio.file.Files.createTempDirectory("evgen_ckpt").toString
    val stream = spark.readStream.format(Fmt)
      .option("rows", "250").option("parts", "3").option("batchRows", "100")
      .load()
    val q = stream.writeStream.format("memory").queryName("evgen_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val got = spark.table("evgen_stream").collect().map(_.toSeq).toSet
      val expect = (0L until 250L).map { i =>
        val (id, u, t, v) = graft.sources.v2.EventGenSource.row(i)
        Seq[Any](id, u, t, v)
      }.toSet
      assert(got === expect, "stream must deliver exactly the capped row range")
      // 250 rows at 100 rows/trigger = 3 committed micro-batches
      assert(q.recentProgress.count(_.numInputRows > 0) === 3,
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("aggregations over the source match the formula") {
    val got = read(1000, 4)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum === 1000L)
    assert(got === Map("click" -> 200L, "view" -> 200L, "purchase" -> 200L,
      "error" -> 200L, "search" -> 200L))
  }
}
