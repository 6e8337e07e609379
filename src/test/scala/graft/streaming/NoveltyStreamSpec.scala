package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** NoveltyStream: the ingest novelty gate — corpus-index probe,
  * cross-batch stream hits, deterministic within-batch order, same-doc
  * exclusion, and per-doc score equivalence with a plain-Scala
  * reimplementation of the arrival-time rule.
  */
class NoveltyStreamSpec extends SparkSpec {

  import NoveltyStream._
  import spark.implicits._

  // one 8-gram per 8 tokens; t("a", 8) = "a1 ... a8"
  private def t(p: String, n: Int): String = (1 to n).map(p + _).mkString(" ")

  private def runStream(
      batches: Seq[Seq[Doc]], corpus: Seq[(Long, String)]): Seq[GramVerdict] = {
    implicit val sqlCtx = spark.sqlContext
    val idx = corpusIndex(corpus.toDF("doc_id", "text"))
    val input = MemoryStream[Doc]
    val query = gramVerdicts(spark, input.toDS(), idx)
      .writeStream.format("memory").queryName("noveltystream")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      spark.table("noveltystream").as[GramVerdict].collect().toSeq
    } finally query.stop()
  }

  private val corpus = Seq(100L -> t("c", 8), 101L -> t("d", 10))

  test("corpus gram hits at arrival; fresh grams do not") {
    val out = runStream(Seq(Seq(Doc(1L, t("c", 8)), Doc(2L, t("z", 8)))), corpus)
    assert(out.find(_.doc_id == 1L).get.hit, "corpus copy hits")
    assert(!out.find(_.doc_id == 2L).get.hit, "fresh doc is novel")
  }

  test("cross-batch stream hit: the later doc hits, the earlier stays novel") {
    val out = runStream(Seq(
      Seq(Doc(3L, t("x", 8))),
      Seq(Doc(4L, t("x", 8)))), corpus)
    assert(!out.find(_.doc_id == 3L).get.hit, "first arrival is novel — no retroactivity")
    assert(out.find(_.doc_id == 4L).get.hit, "second arrival hits the first")
  }

  test("within one batch the doc_id order decides who hits") {
    val out = runStream(Seq(Seq(Doc(6L, t("y", 8)), Doc(5L, t("y", 8)))), corpus)
    assert(!out.find(_.doc_id == 5L).get.hit, "lower id arrives 'first'")
    assert(out.find(_.doc_id == 6L).get.hit)
  }

  test("a re-ingested copy of the SAME doc never hits itself") {
    val out = runStream(Seq(
      Seq(Doc(7L, t("w", 8))),
      Seq(Doc(7L, t("w", 8)))), corpus)
    assert(out.forall(!_.hit), "same-doc re-ingest is not regurgitation")
  }

  test("score matches a plain-Scala arrival-time recomputation over a mixed run") {
    def grams(text: String): Set[String] = {
      val tk = text.split(" ", -1)
      if (tk.length < 8) Set.empty
      else (0 to tk.length - 8).map(i => tk.slice(i, i + 8).mkString(" ")).toSet
    }
    val batches = Seq(
      Seq(Doc(10L, t("c", 8) + " " + t("m", 8)), Doc(11L, t("n", 9))),
      Seq(Doc(12L, t("m", 8) + " " + t("n", 8) + " " + t("q", 8))),
      Seq(Doc(13L, t("d", 10))))
    val corpusGrams = corpus.iterator.flatMap(c => grams(c._2)).toSet
    // arrival order: batch index, then doc_id within batch
    val arrivals = batches.zipWithIndex
      .flatMap { case (b, i) => b.sortBy(_.doc_id).map(d => (i, d)) }
    var seen = Map.empty[String, Long] // gram -> first-witness doc
    val expected = arrivals.map { case (_, d) =>
      val gs = grams(d.text)
      val hits = gs.count(g =>
        corpusGrams.contains(g) || seen.get(g).exists(_ != d.doc_id))
      gs.foreach(g => if (!seen.contains(g)) seen += g -> d.doc_id)
      val nov = math.floor((1.0 - hits.toDouble / gs.size) * 1e6 + 0.5) / 1e6
      (d.doc_id, gs.size.toLong, hits.toLong, nov, nov < 0.5)
    }.sortBy(_._1)
    val verdicts = runStream(batches, corpus)
    val got = score(spark.createDataFrame(verdicts)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq === expected)
  }
}
