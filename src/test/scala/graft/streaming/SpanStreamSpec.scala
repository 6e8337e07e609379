package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Incremental exact-substring dedup: corpus-probe hits, the planted
  * CROSS-BATCH duplicated span with retroactive first-copy emission,
  * same-doc repeats never counting, and exact equivalence with the
  * batch ≥2-distinct-docs rule over corpus ∪ stream. */
class SpanStreamSpec extends SparkSpec {

  import SpanStream._
  import spark.implicits._

  private val W = 3

  private def runStream(batches: Seq[Seq[DocText]], corpus: Seq[DocText]): Seq[DupWindow] = {
    implicit val sqlCtx = spark.sqlContext
    val idx = corpusIndex(corpus.toDF("doc_id", "text"), W)
    val input = MemoryStream[DocText]
    val query = dupWindows(spark, input.toDS(), idx, W)
      .writeStream.format("memory").queryName("spanstream")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      spark.table("spanstream").as[DupWindow].collect().toSeq
    } finally query.stop()
  }

  private val corpus = Seq(DocText(100L, "a b c d e"))

  test("corpus probe: a streamed window matching the corpus emits immediately") {
    val out = runStream(Seq(Seq(DocText(1L, "x y z a b c q"))), corpus)
    assert(out.map(d => (d.doc_id, d.pos)).toSet === Set((1L, 3L)))
  }

  test("cross-batch duplicated span: second copy triggers retroactive first-copy emission") {
    val batch1 = Seq(DocText(2L, "p q r s t u"))
    val batch2 = Seq(DocText(3L, "m m p q r s n n"))
    // shared token run "p q r s": doc2 windows 0,1; doc3 windows 2,3
    val out = runStream(Seq(batch1, batch2), corpus)
    assert(out.map(d => (d.doc_id, d.pos)).toSet ===
      Set((2L, 0L), (2L, 1L), (3L, 2L), (3L, 3L)))
    // span merge gives each doc ONE 4-token span (union of overlaps)
    val sp = spans(out.toDF(), W).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens"))).toSet
    assert(sp === Set((2L, 0L, 4L, 4L), (3L, 2L, 6L, 4L)))
  }

  test("same-doc repeats never count as duplication") {
    val out = runStream(Seq(Seq(DocText(4L, "k l m k l m"))), corpus)
    assert(out.isEmpty)
  }

  test("a third occurrence after establishment still emits; corpus self-match does not") {
    val out = runStream(Seq(
      Seq(DocText(2L, "p q r s")),      // first copy: silent
      Seq(DocText(3L, "z p q r s z")),  // establishes → retro 2 + now 3
      Seq(DocText(5L, "p q r s"))),     // already established → emits
      corpus)
    assert(out.map(d => (d.doc_id, d.pos)).toSet ===
      Set((2L, 0L), (2L, 1L), (3L, 1L), (3L, 2L), (5L, 0L), (5L, 1L)))
    // a corpus doc re-ingesting itself shares no SECOND distinct doc
    val self = runStream(Seq(Seq(DocText(100L, "a b c d e"))), corpus)
    assert(self.isEmpty)
  }

  test("batch equivalence: stream output equals the >=2-distinct-docs batch rule") {
    val batches = Seq(
      Seq(DocText(2L, "p q r s t u"), DocText(6L, "a b c w w w")),
      Seq(DocText(3L, "m m p q r s n n")),
      Seq(DocText(7L, "s t u v"), DocText(8L, "w w w w")))
    val out = runStream(batches, corpus)
    // batch recomputation over corpus ∪ all streamed docs
    val union = (corpus ++ batches.flatten).toDF("doc_id", "text")
    val wins = windowHashes(union, W)
    val streamedIds = batches.flatten.map(_.doc_id).toSet
    val expected = wins.as("w")
      .join(wins.select(col("wh"), col("doc_id").as("other")).distinct().as("o"),
        col("w.wh") === col("o.wh") && col("w.doc_id") =!= col("o.other"))
      .select(col("w.doc_id"), col("w.pos")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (d, _) => streamedIds.contains(d) }.toSet
    assert(out.map(d => (d.doc_id, d.pos)).toSet === expected)
    assert(expected.nonEmpty)
  }
}
