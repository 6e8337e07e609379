package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The ≥10⁹-gram digest widening behind `spark.graft.wideDigest`:
  * with the flag on, every gram digest carries a second independent
  * 60-bit column and the q55/q122/q124 membership joins key on both.
  * While the narrow digest is collision-free over the corpus
  * vocabulary (pinned in ArtifactsSpec), both widths must produce
  * IDENTICAL results — that invariance is what makes the flag a safe
  * scale knob rather than a semantics change. */
class WideDigestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val queries = Seq("q55_decontamination", "q124_ngram_novelty",
    "q122_source_overlap")

  private def run(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSeq

  test("both digest widths produce identical q55/q122/q124 results") {
    val narrow = queries.map(q => q -> run(q)).toMap
    spark.conf.set("spark.graft.wideDigest", "1")
    try {
      Artifacts.reset()
      val wide = queries.map(q => q -> run(q)).toMap
      queries.foreach(q => assert(wide(q) === narrow(q), s"$q diverged"))
    } finally {
      spark.conf.unset("spark.graft.wideDigest")
      Artifacts.reset()
    }
  }

  test("wide mode carries the second digest column and keys the joins on it") {
    spark.conf.set("spark.graft.wideDigest", "1")
    try {
      Artifacts.reset()
      val g = CorpusQueries.docGrams8Build(spark, dir)
      assert(g.columns.toSeq === Seq("doc_id", "gh", "gh2"))
      // the two 60-bit halves are independent md5 segments: equal-gh
      // rows must agree on gh2 (same gram), distinct grams overwhelm-
      // ingly differ in both — check gh2 is not constant/degenerate
      assert(g.select(col("gh2")).distinct().count() > 1)
      // and the wide q55 plan actually joins on both columns
      val p = SparkEntry.queries("q55_decontamination")(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(p.contains("gh2"), s"wide join must key on gh2:\n$p")
    } finally {
      spark.conf.unset("spark.graft.wideDigest")
      Artifacts.reset()
    }
  }

  test("narrow mode keeps the historical single-column schema") {
    val g = CorpusQueries.docGrams8Build(spark, dir)
    assert(g.columns.toSeq === Seq("doc_id", "gh"))
  }
}
