package graft.operators

import graft.SparkSpec

/** Hybrid RRF fusion invariants: score arithmetic, both-list boosting,
  * query-doc exclusion, bounded deterministic output. */
class RetrievalQueriesSpec extends SparkSpec {

  private lazy val rows = graft.QueryCatalog.all.find(_.name == "q94_hybrid_rrf").get
    .fn(spark, "/root/testdata/sf0.001").collect()

  test("rrf score is exactly the integer sum of the two rank contributions") {
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (lex, dense) = (r.getAs[Long]("lex_rank"), r.getAs[Long]("dense_rank"))
      val expect = (if (lex > 0) 1000000L / (60L + lex) else 0L) +
        (if (dense > 0) 1000000L / (60L + dense) else 0L)
      assert(r.getAs[Long]("rrf_score") === expect)
      assert(lex > 0 || dense > 0, "a fused doc must come from at least one list")
    }
  }

  test("the query doc is excluded and the output is rrf-sorted") {
    assert(!rows.exists(_.getAs[Long]("doc_id") == 0L))
    val scores = rows.map(_.getAs[Long]("rrf_score")).toSeq
    assert(scores === scores.sortBy(-_))
  }

  test("docs retrieved by both modalities outrank the tail of either single list") {
    val both = rows.filter(r =>
      r.getAs[Long]("lex_rank") > 0 && r.getAs[Long]("dense_rank") > 0)
    assert(both.nonEmpty, "the fixture corpus should have lexical+dense overlap")
    // any doc in both lists beats any doc whose single rank is worse
    // than both of its ranks — spot-check against the weakest fused doc
    val bestBoth = both.map(_.getAs[Long]("rrf_score")).max
    val singleTail = rows.filter(r =>
      r.getAs[Long]("lex_rank") == 0 || r.getAs[Long]("dense_rank") == 0)
      .map(_.getAs[Long]("rrf_score"))
    singleTail.foreach(sc => assert(bestBoth > sc || singleTail.isEmpty))
  }

  test("q143 packs the exact budget prefix of q94's own ranking") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected straight from q94's output (same function the query calls)
    val fused = rows.map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_score")))
      .sortBy { case (id, sc) => (-sc, id) }
    var cum = 0L
    val expected = fused.zipWithIndex.map { case ((id, sc), i) =>
      cum += toks(id)
      (i + 1L, id, sc, toks(id), cum, cum <= 512L)
    }
    val got = graft.QueryCatalog.all.find(_.name == "q143_context_pack").get
      .fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("ctx_rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rrf_score"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_tokens"), r.getAs[Boolean]("packed")))
    assert(got.toSeq === expected.toSeq)
    // packed is a PREFIX: once false, never true again; boundary exact
    val flags = got.map(_._6).toSeq
    assert(!flags.dropWhile(identity).contains(true), "packed must be a rank prefix")
    val packedTokens = got.filter(_._6).map(_._4).sum
    assert(packedTokens <= 512L)
    got.find(!_._6).foreach(first => assert(packedTokens + first._4 > 512L,
      "the first cut doc must genuinely overflow the budget"))
  }
}
