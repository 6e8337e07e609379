package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** BoilerStream: incremental same-source boilerplate detection —
  * corpus-probe, cross-batch retroactive flagging, the same-source and
  * same-doc exclusions, and exact equivalence with q110's batch rule
  * over any stream prefix.
  */
class BoilerStreamSpec extends SparkSpec {

  import BoilerStream._
  import spark.implicits._

  private val W = 3

  private def runStream(
      batches: Seq[Seq[SrcDoc]], corpus: Seq[SrcDoc]): Seq[BoilerSeg] = {
    implicit val sqlCtx = spark.sqlContext
    val idx = corpusIndex(corpus.toDF("doc_id", "source", "text"), W)
    val input = MemoryStream[SrcDoc]
    val query = boilerSegments(spark, input.toDS(), idx, W)
      .writeStream.format("memory").queryName("boilerstream")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      spark.table("boilerstream").as[BoilerSeg].collect().toSeq
    } finally query.stop()
  }

  private val corpus = Seq(
    SrcDoc(100L, "srcA", "c1 c2 c3 x1 x2 x3"),
    SrcDoc(101L, "srcB", "b1 b2 b3 y1 y2 y3"))

  test("corpus probe: a streamed chunk matching a same-source corpus chunk flags immediately") {
    val out = runStream(Seq(Seq(SrcDoc(1L, "srcA", "c1 c2 c3 a1 a2 a3"))), corpus)
    assert(out.map(b => (b.source, b.doc_id, b.seg)).toSet === Set(("srcA", 1L, 0L)))
  }

  test("the same chunk from a DIFFERENT source never flags") {
    // srcB streaming srcA's template chunk: template similarity across
    // sites is not boilerplate — the rule is per-source by design
    val out = runStream(Seq(Seq(SrcDoc(2L, "srcB", "c1 c2 c3 d1 d2 d3"))), corpus)
    assert(out.isEmpty)
  }

  test("cross-batch same-source repeat: second doc triggers retroactive first-copy flag") {
    val out = runStream(Seq(
      Seq(SrcDoc(3L, "srcA", "h1 h2 h3 u1 u2 u3")),
      Seq(SrcDoc(4L, "srcA", "h1 h2 h3 v1 v2 v3"))), corpus)
    assert(out.map(b => (b.doc_id, b.seg)).toSet === Set((3L, 0L), (4L, 0L)))
  }

  test("same-doc repetition alone never establishes; a later distinct doc does") {
    val rep = runStream(Seq(Seq(SrcDoc(5L, "srcA", "r1 r2 r3 r1 r2 r3"))), corpus)
    assert(rep.isEmpty, "df counts docs, not occurrences")
    val out = runStream(Seq(
      Seq(SrcDoc(5L, "srcA", "r1 r2 r3 r1 r2 r3")),
      Seq(SrcDoc(6L, "srcA", "r1 r2 r3 w1 w2 w3"))), corpus)
    // both of doc 5's instances flush retroactively, doc 6's flags live
    assert(out.map(b => (b.doc_id, b.seg)).toSet ===
      Set((5L, 0L), (5L, 1L), (6L, 0L)))
  }

  test("re-ingesting a not-yet-established doc never inflates the retro flush") {
    // doc 7 is crawled twice before any second distinct doc arrives; the
    // retroactive emission must flag each instance exactly ONCE (a seq
    // comparison — the set-based equivalence test can't see duplicates)
    val out = runStream(Seq(
      Seq(SrcDoc(7L, "srcA", "g1 g2 g3 u1 u2 u3")),
      Seq(SrcDoc(7L, "srcA", "g1 g2 g3 u1 u2 u3")),
      Seq(SrcDoc(8L, "srcA", "g1 g2 g3 w1 w2 w3"))), corpus)
    val flagged = out.map(b => (b.doc_id, b.seg))
    assert(flagged.sorted === flagged.distinct.sorted,
      s"duplicate emissions in retro flush: $flagged")
    assert(flagged.toSet === Set((7L, 0L), (8L, 0L)))
  }

  test("corpus doc re-ingesting itself shares no second distinct doc") {
    val out = runStream(Seq(Seq(SrcDoc(100L, "srcA", "c1 c2 c3 x1 x2 x3"))), corpus)
    assert(out.isEmpty)
  }

  test("batch equivalence: flagged set equals q110's >=2-distinct-docs rule over the prefix") {
    val batches = Seq(
      Seq(SrcDoc(10L, "srcA", "t1 t2 t3 a1 a2 a3"), SrcDoc(11L, "srcB", "t1 t2 t3 b1 b2 b3")),
      Seq(SrcDoc(12L, "srcA", "t1 t2 t3 c1 c2 c3 x1 x2 x3")),
      Seq(SrcDoc(13L, "srcB", "q1 q2 q3"), SrcDoc(14L, "srcB", "t1 t2 t3 q1 q2 q3")))
    val out = runStream(batches, corpus)
    // batch recomputation: same-source df >= 2 over corpus ∪ streamed
    val union = (corpus ++ batches.flatten).toDF("doc_id", "source", "text")
    val segs = segmentHashes(union, W)
    val flagged = segs.groupBy(col("source"), col("h"))
      .agg(countDistinct(col("doc_id")).as("df")).filter(col("df") >= 2)
      .select(col("source"), col("h"))
    val streamedIds = batches.flatten.map(_.doc_id).toSet
    val expected = segs.join(flagged, Seq("source", "h"))
      .select(col("source"), col("doc_id"), col("seg"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter { case (_, d, _) => streamedIds.contains(d) }.toSet
    assert(out.map(b => (b.source, b.doc_id, b.seg)).toSet === expected)
    assert(expected.nonEmpty)
    // the settled profile accounts exactly the flagged stream instances
    val prof = profile(out.toDF().where(col("doc_id").isin(streamedIds.toSeq: _*)), W)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("flagged_instances"), r.getAs[Long]("removed_tokens"))).toMap
    val bySrc = expected.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    bySrc.foreach { case (src, n) =>
      assert(prof(src) === ((n, n * W)), s"profile mismatch for $src")
    }
  }
}
