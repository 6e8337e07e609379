package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming KS: per-prefix parity with the batch q133 arithmetic,
  * micro-batch invariance of the settled report, and the no-reference
  * contract. */
class KsStreamSpec extends SparkSpec {

  import KsStream.{Obs, KsReport}
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")

  private def events: Seq[(String, Double, java.sql.Timestamp)] =
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"), col("ts"))
      .as[(String, Double, java.sql.Timestamp)].collect().toSeq

  private def refGrid: Map[String, IndexedSeq[(Long, Long)]] =
    events.filter(_._3.before(split)).groupBy(_._1).map { case (t, rows) =>
      t -> rows.map(r => KsStream.quant(r._2)).groupBy(identity)
        .map { case (v, xs) => v -> xs.size.toLong }.toIndexedSeq.sortBy(_._1)
    }

  /** q133's driver arithmetic verbatim (IncrementalOpsSpec's oracle). */
  private def batchKs(ref: Seq[Long], cur: Seq[Long]): Long = {
    val rq = ref.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val cq = cur.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val grid = (rq.keySet ++ cq.keySet).toSeq.sorted
    val (nr, nc) = (ref.size.toLong, cur.size.toLong)
    var cr = 0L; var cc = 0L; var best = 0L
    grid.foreach { v =>
      cr += rq.getOrElse(v, 0L); cc += cq.getOrElse(v, 0L)
      best = math.max(best, math.abs(cr * nc - cc * nr))
    }
    best * 1000000L / (nr * nc)
  }

  test("per-batch reports equal batch-q133 arithmetic over every prefix") {
    val ref = refGrid
    val cur = events.filter(r => !r._3.before(split))
      .sortBy(r => (r._1, r._2))
      .map(r => Obs(r._1, r._2))
    val batches = Seq(cur.take(40), cur.slice(40, 90), cur.drop(90))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val query = KsStream.reports(spark, input.toDS(), ref)
      .writeStream.format("memory").queryName("ks_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      var seen = Seq.empty[Obs]
      var rowsBefore = 0
      batches.filter(_.nonEmpty).foreach { b =>
        input.addData(b); query.processAllAvailable()
        seen = seen ++ b
        // this batch's emissions = rows beyond the previous count
        val all = spark.table("ks_stream").as[KsReport].collect()
        val emitted = all.drop(rowsBefore).map(r => r.event_type -> r).toMap
        rowsBefore = all.length
        // expected per touched type: KS of full prefix vs reference
        seen.groupBy(_.event_type).foreach { case (t, obs) =>
          if (b.exists(_.event_type == t)) {
            val refVals = events.filter(r => r._1 == t && r._3.before(split))
              .map(r => KsStream.quant(r._2))
            val curVals = obs.map(o => KsStream.quant(o.value))
            val exp =
              if (refVals.isEmpty) 0L
              else batchKs(refVals, curVals)
            val got = emitted(t)
            assert(got.n_cur === obs.size.toLong, s"type $t count")
            assert(got.ks_ppm === exp, s"type $t ks after ${seen.size} obs")
          }
        }
      }
    } finally query.stop()
  }

  test("micro-batch boundaries do not change the settled report") {
    val ref = refGrid
    val cur = events.filter(r => !r._3.before(split))
      .sortBy(r => (r._1, r._2)).map(r => Obs(r._1, r._2))
    def settle(batches: Seq[Seq[Obs]], name: String): Map[String, Long] = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Obs]
      val query = KsStream.reports(spark, input.toDS(), ref)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => input.addData(b); query.processAllAvailable() }
        spark.table(name).as[KsReport].collect()
          .groupBy(_.event_type)
          .map { case (t, rs) => t -> rs.maxBy(_.n_cur).ks_ppm }
      } finally query.stop()
    }
    val one = settle(Seq(cur), "ks_one")
    val many = settle(cur.grouped(37).toSeq, "ks_many")
    assert(one === many)
  }

  test("a type with no reference grid reports zero KS with its count") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val query = KsStream.reports(spark, input.toDS(), Map.empty)
      .writeStream.format("memory").queryName("ks_noref")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq(Obs("novel", 1.0), Obs("novel", 2.0)))
      query.processAllAvailable()
      val r = spark.table("ks_noref").as[KsReport].collect().head
      assert(r.n_cur === 2L && r.ks_ppm === 0L)
    } finally query.stop()
  }
}
