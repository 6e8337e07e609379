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
}
