package graft.operators

import graft.SparkSpec

/** Plan-shape proofs for the round-7 additions (SCALE.md entries):
  * the broadcast directions and single-pass claims are asserted
  * against the final adaptive plan, not just documented.
  */
class NewOpsPlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = graft.QueryCatalog.all.find(_.name == name).get.fn(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q124 novelty: held grams broadcast INTO the train scan — no sort-merge") {
    val p = finalPlan("q124_ngram_novelty")
    assert(p.contains("BroadcastHashJoin"), "held-out gram set must broadcast")
    assert(!p.contains("SortMergeJoin"), "the training side must never shuffle into a merge join")
  }

  test("q123 cluster margin: centroids broadcast; vectors never pair with vectors") {
    val p = finalPlan("q123_cluster_margin")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the K-centroid cross join must ride a broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q125 retrieval eval: sampled queries + label histogram broadcast") {
    val p = finalPlan("q125_retrieval_ndcg")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "candidate generation is the broadcast-sample theta join")
    assert(p.contains("BroadcastHashJoin"), "label histogram joins by broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q126 anisotropy reads the corpus exactly once") {
    val df = graft.QueryCatalog.all.find(_.name == "q126_anisotropy").get
      .fn(spark, dir)
    df.collect()
    // executedPlan.toString prints the initial plan below the final one;
    // count scans in the FINAL section only (the one that ran)
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"one corpus pass claimed, $scans scans found:\n$p")
    assert(!p.contains("Join"), "n_vecs folds from the code frame — no count join")
    assert(p.contains("Expand"), "both grouping levels ride one GROUPING SETS pass")
  }

  test("q122 source overlap joins grams by equi-hash, never all-pairs on docs") {
    val p = finalPlan("q122_source_overlap")
    // the only nested-loop allowed is the S×S domain cross of two
    // aggregated totals frames; the gram-pair join must be an equi join
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "gram join must be an equi join")
    assert(!p.contains("CartesianProduct"), "no unbroadcast cross join anywhere")
  }
}
