package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The production composition of the corpus-curation operators: ONE
  * materialization of the inverted-index pair kernel
  * ([[DedupQueries.pairStats]]) feeds Jaccard near-dup pairs, Broder
  * containment, connected-component dedup clusters, and the curation
  * funnel.
  *
  * This predates (and motivated) the [[Artifacts]] standing-artifact
  * layer, which now gives the registered queries themselves the
  * share-one-materialization shape; the pipeline remains the explicit
  * single-call composition — one invocation, all four outputs off one
  * kernel pass, no memo layer involved. CorpusPipelineSpec proves each
  * derived output byte-equals its standalone registered query.
  */
object CorpusPipeline {

  final case class Outputs(
      jaccard: DataFrame,
      containment: DataFrame,
      clusters: DataFrame,
      funnel: DataFrame)

  def run(s: SparkSession, dir: String): Outputs = {
    val stats = DedupQueries.pairStats(s, dir).persist()
    stats.count() // one ordered materialization; every consumer below reads cache
    val jaccard = DedupQueries.jaccardFrom(stats).persist()
    jaccard.count() // itself forked: clusters (3 scans) + funnel
    Outputs(
      jaccard = jaccard.orderBy(col("doc_a"), col("doc_b")),
      containment = DedupQueries.containmentFrom(stats),
      clusters = CorpusQueries.clustersFrom(s,
        Tables.documents(s, dir).select(col("doc_id").as("id")), jaccard),
      funnel = CorpusQueries.funnelFrom(s, dir, jaccard))
  }
}
