package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming Count-Min: cell-state parity with a driver-side sketch
  * over any stream prefix, micro-batch-boundary invariance, scalar
  * bucket == the batch query's column bucket, and the CMS
  * never-underestimate invariant off the settled state. */
class SketchStreamSpec extends SparkSpec {

  import SketchStream.{Doc, CellUpdate}
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpus: Seq[Doc] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy(_._1).map { case (id, t) => Doc(id, t) }.toSeq

  private def driverCells(docs: Seq[Doc]): Map[(Int, Int), Long] =
    docs.flatMap(d => d.text.split(" ", -1).toSeq)
      .flatMap(tok => (0 until SketchStream.D).map(r =>
        (r, SketchStream.bucket(r, tok))))
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }

  private def runStream(batches: Seq[Seq[Doc]], name: String): Map[(Int, Int), Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = SketchStream.cells(spark, input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      // cell totals only grow, so the settled value is the max emission
      spark.table(name).as[CellUpdate].collect()
        .groupBy(u => (u.r, u.bkt))
        .map { case (k, xs) => k -> xs.map(_.n).max }
    } finally query.stop()
  }

  test("scalar bucket equals the batch conv(md5) column on real tokens") {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok")).distinct()
      .limit(200)
    val viaCol = toks.select(col("tok"),
      (conv(substring(md5(concat(lit("3:"), col("tok"))), 1, 12), 16, 10)
        .cast("bigint") % SketchStream.W).as("b"))
      .as[(String, Long)].collect()
    viaCol.foreach { case (tok, b) =>
      assert(SketchStream.bucket(3, tok).toLong === b, s"token $tok")
    }
  }

  test("settled stream cells equal the driver sketch after every prefix") {
    val docs = corpus
    val batches = Seq(docs.take(5), docs.slice(5, 9), docs.drop(9))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = SketchStream.cells(spark, input.toDS())
      .writeStream.format("memory").queryName("cms_prefix")
      .outputMode(OutputMode.Append()).start()
    try {
      var seen = Seq.empty[Doc]
      batches.foreach { b =>
        input.addData(b); query.processAllAvailable()
        seen = seen ++ b
        val settled = spark.table("cms_prefix").as[CellUpdate].collect()
          .groupBy(u => (u.r, u.bkt))
          .map { case (k, xs) => k -> xs.map(_.n).max }
        assert(settled === driverCells(seen), s"after ${seen.size} docs")
      }
    } finally query.stop()
  }

  test("micro-batch boundaries do not change the settled sketch") {
    val docs = corpus
    val one = runStream(Seq(docs), "cms_one")
    val many = runStream(docs.grouped(3).toSeq, "cms_many")
    assert(one === many)
  }

  test("estimates off the settled state never underestimate exact counts") {
    val docs = corpus
    val cells = driverCells(docs)
    val exact = docs.flatMap(_.text.split(" ", -1).toSeq)
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    exact.foreach { case (tok, c) =>
      assert(SketchStream.estimate(cells, tok) >= c, s"token $tok")
    }
  }
}
