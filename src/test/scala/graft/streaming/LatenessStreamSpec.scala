package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** LatenessStream: settled per-rung rows equal batch q160 over the
  * same events, batching never matters (ordered arrival), and the
  * planted out-of-order stream reproduces q160's hand-computed
  * drops. */
class LatenessStreamSpec extends SparkSpec {

  import LatenessStream.{Ev, LatenessRow}
  import spark.implicits._

  private def settle(batches: Seq[Seq[Ev]], name: String): Map[Long, LatenessRow] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = LatenessStream.audit(spark, input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      spark.table(name).as[LatenessRow].collect()
        .groupBy(_.delay_sec).map { case (d, xs) => d -> xs.maxBy(_.n_events) }
    } finally query.stop()
  }

  private def corpus: Seq[Ev] =
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), unix_micros(col("ts")).as("tus"))
      .as[(Long, Long)].collect().sortBy(_._1).map { case (i, t) => Ev(i, t) }.toSeq

  test("settled rows equal batch q160 on the sf0.001 stream, any batching") {
    val docs = corpus
    val a = settle(Seq(docs), "late_one")
    val b = settle(docs.grouped(1234).toSeq, "late_many")
    assert(a === b)
    val batch = graft.QueryCatalog.all.find(_.name == "q160_watermark_lateness").get
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[Long]("delay_sec") -> r).toMap
    assert(a.keySet === batch.keySet)
    a.foreach { case (d, g) =>
      val r = batch(d)
      assert(g.n_events === r.getAs[Long]("n_events"))
      assert(g.out_of_order_events === r.getAs[Long]("out_of_order_events"))
      assert(g.dropped_events === r.getAs[Long]("dropped_events"))
      assert(g.dropped_ppm === r.getAs[Long]("dropped_ppm"))
      assert(g.max_late_sec === r.getAs[Long]("max_late_sec"))
    }
  }

  test("planted out-of-order arrivals: q160's hand-computed drops, live") {
    // the WatermarkLatenessSpec fixture as a stream, split mid-lateness
    val evs = Seq(
      Ev(1L, 1000L * 1000000), Ev(2L, 2000L * 1000000), Ev(3L, 1880L * 1000000),
      Ev(4L, 2100L * 1000000), Ev(5L, -1900L * 1000000), Ev(6L, 2200L * 1000000))
    val got = settle(Seq(evs.take(2), evs.slice(2, 5), evs.drop(5)), "late_plant")
    assert(got(60L).dropped_events === 2L)
    assert(got(60L).dropped_ppm === 333333L)
    Seq(300L, 900L, 3600L).foreach(d => assert(got(d).dropped_events === 1L, s"d=$d"))
    got.values.foreach { r =>
      assert(r.n_events === 6L)
      assert(r.out_of_order_events === 2L)
      assert(r.max_late_sec === 4000L)
    }
  }
}
