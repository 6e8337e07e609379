package graft.streaming

import graft.SparkSpec
import graft.operators.TextQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** GrowthStream: per-source settled emissions equal batch q165 over
  * the streamed corpus bit-for-bit, micro-batch boundaries don't
  * matter, and hapax membership is retroactive across batches. */
class GrowthStreamSpec extends SparkSpec {

  import GrowthStream.{Doc, GrowthRow}
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpus: Seq[Doc] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
      .sortBy(_._1).map { case (id, s, t) => Doc(id, s, t) }.toSeq

  private def settle(batches: Seq[Seq[Doc]], name: String): Map[String, GrowthRow] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = GrowthStream.growth(spark, input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      // n_tokens only grows per source, so settled = max-token emission
      spark.table(name).as[GrowthRow].collect()
        .groupBy(_.source).map { case (s, xs) => s -> xs.maxBy(_.n_tokens) }
    } finally query.stop()
  }

  test("settled rows equal batch q165 on the sf0.001 corpus") {
    val docs = corpus
    val got = settle(Seq(docs.take(7), docs.slice(7, 13), docs.drop(13)), "growth_full")
    val batch = TextQueries.specs.find(_.name == "q165_good_turing").get
      .fn(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got.keySet === batch.keySet)
    got.foreach { case (src, g) =>
      val b = batch(src)
      assert(g.n_tokens === b.getAs[Long]("n_tokens"), src)
      assert(g.vocab === b.getAs[Long]("vocab"), src)
      assert(g.hapax === b.getAs[Long]("hapax"), src)
      assert(g.dis === b.getAs[Long]("dis"), src)
      assert(g.unseen_mass_ppm === b.getAs[Long]("unseen_mass_ppm"), src)
      assert(g.coverage_ppm === b.getAs[Long]("coverage_ppm"), src)
      assert(g.chao1_vocab === b.getAs[Long]("chao1_vocab"), src)
    }
  }

  test("micro-batch boundaries never change the settled rows") {
    val docs = corpus
    val a = settle(Seq(docs), "growth_one")
    val b = settle(docs.grouped(3).toSeq, "growth_many")
    assert(a === b)
  }

  test("hapax membership is retroactive across batches") {
    val b1 = Seq(Doc(1L, "s", "alpha beta"))
    val b2 = Seq(Doc(2L, "s", "alpha gamma"))
    val got = settle(Seq(b1, b2), "growth_retro")("s")
    // alpha seen twice -> dis; beta/gamma hapax
    assert(got.n_tokens === 4L)
    assert(got.vocab === 3L)
    assert(got.hapax === 2L)
    assert(got.dis === 1L)
    assert(got.chao1_vocab === 3L + 2L * 1L / (2L * 2L)) // 3 + 2/4 = 3
  }
}
