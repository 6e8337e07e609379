package graft.operators

import graft.{QueryCatalog, SparkSpec}
import org.apache.spark.sql.DataFrame

/** The shared-kernel pipeline must produce byte-identical outputs to
  * the standalone registered queries it composes — sharing the
  * pairStats materialization is an execution optimization, never a
  * semantic change. */
class CorpusPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq.map {
      case a: Array[_] => a.toSeq
      case x => x
    })

  private def query(name: String): DataFrame =
    QueryCatalog.all.find(_.name == name).get.fn(spark, dir)

  test("pipeline outputs equal the standalone queries") {
    val out = CorpusPipeline.run(spark, dir)
    assert(rows(out.jaccard) === rows(query("q26_ngram_jaccard")))
    assert(rows(out.containment) === rows(query("q71_containment")))
    assert(rows(out.clusters) === rows(query("q54_cc_dedup_clusters")))
    assert(rows(out.funnel) === rows(query("q70_curation_funnel")))
  }
}
