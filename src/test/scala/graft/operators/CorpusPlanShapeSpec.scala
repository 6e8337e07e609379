package graft.operators

import graft.SparkSpec

/** Plan-shape proofs for the corpus-curation operators (SCALE.md
  * "Corpus curation"): the claims about WHAT shuffles are asserted
  * against the final adaptive plan, not just documented. */
class CorpusPlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = CorpusQueries.specs.find(_.name == name).get.fn(spark, dir)
    df.collect() // force AQE to its final plan
    df.queryExecution.executedPlan.toString
  }

  test("q55 decontamination: benchmark set joins by broadcast, never sort-merge") {
    val p = finalPlan("q55_decontamination")
    assert(p.contains("BroadcastHashJoin"), "benchmark fingerprint join must broadcast")
    assert(!p.contains("SortMergeJoin"), "training side must not shuffle into a merge join")
  }

  test("q56 repetition filters: pure scan-side array expressions — no join, no agg") {
    val p = finalPlan("q56_repetition_quality")
    // both signals are sorted-run array expressions computed in the
    // projection (CorpusQueries.maxRun/dupOcc) — the old explode +
    // four hash aggs + doc_id join shape must not reappear
    assert(!p.contains("Join"), s"q56 must not join:\n$p")
    assert(!p.contains("Generate"), s"q56 must not explode:\n$p")
    assert(!p.contains("HashAggregate"), s"q56 stats must stay scan-side:\n$p")
  }

  test("q59 bm25: df/doclen/scalars broadcast; no sort-merge join") {
    val p = finalPlan("q59_bm25_scoring")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q58 quantized ANN: only the sampled query set nested-loop-broadcasts") {
    // assert on the PRE-barrier core: the registered q58 ends in a
    // Det.ordered checkpoint, so its final plan is just Sort over an
    // ExistingRDD scan and the join shape lives in the core's plan
    val df = CorpusQueries.q58Core(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the validation shape: BNLJ against the broadcast SAMPLED queries is
    // intended; a sort-merge join would mean the full table self-joined
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"))
    // and the registered query's final plan must read the barrier
    val full = finalPlan("q58_quantized_ann")
    assert(full.contains("Scan ExistingRDD"), s"q58 must sort over the barrier:\n$full")
  }
}
