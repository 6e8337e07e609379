package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Online packing (q75's streaming twin): for an in-order source the
  * stream must reproduce the batch pack assignment exactly, including
  * when arrivals are split across micro-batches (state carries the
  * running token count over the boundary). */
class PackingStreamSpec extends SparkSpec {

  import PackingStream._

  private val dir = "/root/testdata/sf0.001"

  private def docToks: Seq[DocTok] =
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 8).as("bucket"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .collect().toSeq
      .map(r => DocTok(r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.doc_id)

  private def batchExpected: Map[(Long, Long), Long] = {
    // the batch rule recomputed driver-side: per bucket, running sum in
    // doc_id order, pack = start div 2048
    docToks.groupBy(_.bucket).toSeq.flatMap { case (b, ds) =>
      var cum = 0L
      ds.sortBy(_.doc_id).map { d =>
        val start = cum; cum += d.tok
        (b, d.doc_id) -> (start / 2048L)
      }
    }.toMap
  }

  private def runStream(batches: Seq[Seq[DocTok]]): Map[(Long, Long), Long] = {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[DocTok]
    val query = assignPacks(spark, input.toDS())
      .writeStream.format("memory").queryName(s"packs_${batches.length}")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      spark.table(s"packs_${batches.length}").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    } finally query.stop()
  }

  test("single micro-batch reproduces the batch q75 assignment") {
    assert(runStream(Seq(docToks)) === batchExpected)
  }

  test("pack state survives micro-batch boundaries") {
    val (first, second) = docToks.splitAt(docToks.length / 2)
    assert(runStream(Seq(first, second)) === batchExpected,
      "split arrival must not reset the running token count")
  }

  test("batch q75 aggregate agrees with the per-doc assignments") {
    val fromStream = runStream(Seq(docToks)).toSeq
      .groupBy { case ((b, _), p) => (b, p) }
      .view.mapValues(_.size.toLong).toMap
    val q75 = graft.QueryCatalog.all.find(_.name == "q75_sequence_packing").get
      .fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("pack")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(fromStream === q75)
  }
}
