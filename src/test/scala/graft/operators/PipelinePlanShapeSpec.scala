package graft.operators

import graft.SparkSpec

/** Plan-shape proofs for the round-5 pipeline operators (SCALE.md
  * "Curation pipeline"): what shuffles — and what must NOT — is
  * asserted against the final adaptive plan. */
class PipelinePlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = graft.QueryCatalog.all.find(_.name == name).get.fn(spark, dir)
    df.collect()
    // AdaptiveSparkPlan.toString prints BOTH the final and the initial
    // plan — assertions must only see what actually executed
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("q75 packing: exactly one pre-aggregate exchange, and it carries ids not text") {
    val p = finalPlan("q75_sequence_packing")
    // window-by-bucket is the single data shuffle; the output ORDER BY adds
    // a range exchange on the tiny aggregate only
    assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoop"))
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0, "pack assignment must be a window, not a join")
    val belowWindow = p.substring(winIdx)
    val shufflesBelowWindow = belowWindow.split("\n")
      .count(_.contains("Exchange hashpartitioning"))
    assert(shufflesBelowWindow === 1,
      s"exactly one hash exchange may feed the packing window:\n$p")
    // token counts must be computed BEFORE the exchange: the project
    // under the shuffle emits tok, so only (id, bucket, count) shuffles
    val underExchange = belowWindow.substring(
      belowWindow.indexOf("Exchange hashpartitioning"))
    assert(underExchange.contains("AS tok#"),
      "the packing shuffle must carry precomputed token counts, not text")
  }

  test("q76 mixture sampling: rates reach the corpus by broadcast, never shuffle") {
    // assert on the kept-pass frame: the registered q76 collects this
    // |sources|-row result and finishes driver-side, so its own final
    // plan is a LocalRelation sort with the join already executed
    val df = PipelineQueries.q76KeptFrame(spark, dir,
      Seq(("src0", 0.5), ("src1", 0.5)))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "rate table must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must never shuffle to meet the |sources|-row rate table")
  }

  test("q77 tfidf: sampled-doc filter sits in the scan, df side broadcasts") {
    val p = finalPlan("q77_tfidf_topk")
    assert(p.contains("BroadcastHashJoin"), "df join must broadcast")
    // the % 20 sample must prune BEFORE the tf explode — in the scan's
    // pushed/post-scan filters, not after a Generate
    val genIdx = p.indexOf("Generate")
    val filterIdx = p.indexOf("(doc_id")
    assert(filterIdx >= 0, "sample filter missing from the plan")
    assert(p.contains("WindowGroupLimit"),
      "top-k per doc must use the rank-limit pushdown, not a full window sort")
  }

  test("q83 chunking: no join anywhere — chunk explode is a linear Generate") {
    val p = finalPlan("q83_doc_chunking")
    assert(!p.contains("Join"), s"chunking must not join:\n$p")
    assert(p.contains("Generate"), "chunk starts must come from a sequence explode")
  }

  test("q87 bucketed pps: every window is partitioned — no global running sum") {
    val p = finalPlan("q87_pps_sample")
    // WindowExec prints "Window [exprs], [partitionSpec], [orderSpec]"
    // when partitioned and drops the middle group when it is not — an
    // unpartitioned window is the single-reducer sort the bucketed
    // design exists to avoid (it also fires the "No Partition Defined"
    // WindowExec warning at runtime)
    val winLines = p.split("\n").filter(_.contains("Window ["))
    assert(winLines.nonEmpty, s"within-bucket running sum must be a window:\n$p")
    winLines.foreach { l =>
      assert(l.split("\\], \\[").length >= 3,
        s"unpartitioned window (global running sum) in the plan:\n$l")
    }
    // bucket quotas reach the docs by broadcast; the triangular B×B
    // mass join is a broadcast nested-loop over 8 rows, never a shuffle
    assert(p.contains("BroadcastHashJoin"), s"quota join must broadcast:\n$p")
  }

  test("q82 join-size estimate never materializes the joins it predicts") {
    val p = finalPlan("q82_join_size_estimate")
    // count-table equi-joins and the 1-row heavy-hitter broadcast are
    // fine; a CartesianProduct would mean a fact table met another one
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate"))
  }

  test("q47 fuzzy join: probe side spread survives AQE, dims broadcast") {
    val p = finalPlan("q47_fuzzy_levenshtein")
    // Tables.spread uses an explicit count precisely so AQE cannot
    // coalesce the kernel's parallelism away — the executed plan must
    // keep a REPARTITION_BY_NUM exchange feeding the broadcast join
    assert(p.contains("REPARTITION_BY_NUM"),
      s"explicit-count spread missing (AQE coalesced the DP onto one task?):\n$p")
    assert(p.contains("BroadcastHashJoin"), s"block join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q27 simhash: token hashing runs above an explicit spread exchange") {
    val p = finalPlan("q27_simhash")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"explicit-count spread missing from the simhash kernel:\n$p")
  }

  test("dup_islands build: algorithmic shuffles carry hashes/ids, never text or token arrays") {
    // The earlier form of this test grepped Exchange HEADER lines, which
    // print partitioning expressions, not the shuffled columns — it
    // passed vacuously. This version inspects each exchange's actual
    // output attribute set from the executed plan tree. Scope: the
    // bench-only Tables.spread repartition (REPARTITION_BY_NUM) DOES
    // move raw rows by design (scans arrive pre-partitioned at scale —
    // see Tables.spread); the claim is about the ALGORITHM's hash
    // shuffles (wh dedup/window, doc-partitioned span merge): those
    // must only ever carry hash/position/id/count columns. Since round
    // 11 the window-hash pipeline lives in the dup_islands ARTIFACT
    // build (q90/q117 both read it), so the discipline is pinned on
    // the builder plan.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    val df = PipelineQueries.dupIslands(PipelineQueries.spanDocs(spark, dir))
    df.collect()
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(n => allNodes(unwrap(n)))
    }
    val nodes = allNodes(unwrap(df.queryExecution.executedPlan))
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")))
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    val (spread, algo) = shuffles.partition(_.shuffleOrigin.toString == "REPARTITION_BY_NUM")
    assert(spread.nonEmpty, "the explicit spread exchange should survive AQE")
    assert(algo.nonEmpty, "the wh/window/rollup hash shuffles must exist")
    algo.foreach { e =>
      val bad = e.output.filter(a =>
        a.name == "text" || a.name == "t" ||
          a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      assert(bad.isEmpty,
        s"algorithmic exchange must not carry text/token arrays, got ${e.output.map(a => s"${a.name}:${a.dataType.simpleString}")}")
    }
  }

  test("q90/q117 warm plans read the dup_islands artifact — no window-hash recompute") {
    // the rolling-hash explode + wh shuffle + gaps-and-islands windows
    // ran once, in the artifact build; the registered consumers keep
    // only their own scan-side work (q90: per-source rollup; q117:
    // text scrub + fingerprint) — no Window may appear in either plan
    val p90 = finalPlan("q90_dup_spans")
    assert(!p90.contains("Window"),
      s"q90 must read the island artifact, not re-merge spans:\n$p90")
    assert(!p90.contains(" wh#"),
      s"no window-hash column may survive into q90's warm plan:\n$p90")
    val p117 = finalPlan("q117_span_scrub")
    assert(!p117.contains("Window"),
      s"q117 must read the island artifact, not re-merge spans:\n$p117")
    assert(!p117.contains(" wh#"),
      s"no window-hash column may survive into q117's warm plan:\n$p117")
  }

  test("q92 tokenize: the corpus joins the token dictionary by broadcast") {
    val p = finalPlan("q92_bpe_tokenize")
    assert(p.contains("BroadcastHashJoin"),
      s"the |V|-row dictionary must broadcast into the corpus scan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must never shuffle to meet the vocab-sized dictionary")
  }

  test("q96 pq: the ADC pass never joins or shuffles the corpus") {
    val p = finalPlan("q96_pq_adc")
    // Round 14: q96 serves off the STANDING pq_codes table (the PQ
    // index proper) — the plan must be a pure projection over the
    // codes relation: lut rides as an array literal, ADC is
    // Σ element_at(lut, code), and the raw embeddings are never
    // touched (the per-row argmin re-encode is gone — it happens once
    // at index build).
    assert(!p.contains("Join") && !p.contains("NestedLoop"),
      s"codes and lut are literals — no join may appear:\n$p")
    assert(!p.contains("Exchange"),
      s"the codes relation is served as-is — no exchange of any kind:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the ADC top-k must plan per-partition heaps, not a global sort:\n$p")
    assert(!p.contains("graft_dot") && !p.contains("embedding"),
      s"the raw embeddings must not be scanned — ADC reads stored codes:\n$p")
    // the query-row exclusion still filters the codes relation
    assert(p.contains("NOT (vec_id") || p.contains("Not(EqualTo(vec_id,0))"),
      s"the queryId exclusion must survive over the codes relation:\n$p")
  }

  test("q98 ivfpq: literal codebooks/luts — no join, no keyed exchange, heap top-k") {
    val p = finalPlan("q98_ivfpq_search")
    assert(!p.contains("Join") && !p.contains("NestedLoop"),
      s"coarse/fine codebooks and per-cell luts are literals — no join may appear:\n$p")
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"the corpus must never shuffle by key in the search pass:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the ADC top-k must plan per-partition heaps:\n$p")
  }

  test("q93 dsir: serves the standing dsir_logits table; no corpus rescan") {
    // round 14: the registered query reads the per-doc logits
    // artifact (the q94/q150 consumer pattern) — the corpus passes
    // live in the builder, pinned below
    val p = finalPlan("q93_dsir_select")
    assert(!p.contains("Scan parquet"),
      s"q93 must serve from the standing dsir_logits table:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"),
      s"the per-source rollup is join-free over the logits:\n$p")
  }

  test("q93 dsir BUILDER: weight table broadcasts, spread survives AQE, no merge join") {
    val df = SelectionQueries.docLogitsBuild(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"),
      s"the ≤64-row weight table must broadcast into the scoring pass:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must never shuffle to meet the bucket weight table")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"the spread exchange (tgt + token array computed once per doc) must survive:\n$p")
  }

  test("q94 hybrid rrf: serves the rrf_fused artifact; the BUILDER TakeOrders both retrievals") {
    // the registered query reads the OutK-row LocalRelation artifact —
    // zero corpus scans after first touch
    val p = finalPlan("q94_hybrid_rrf")
    assert(p.contains("LocalTableScan"),
      s"q94 must serve from the fused-list LocalRelation artifact:\n$p")
    assert(!p.contains("Scan parquet"),
      s"no corpus rescan per consumer — that is the artifact's point:\n$p")
    // the standalone builder (what first touch runs, and what the
    // oracle mirrors) keeps the scale shape: per-partition heaps for
    // both modality top-Ks, no cartesian, broadcast-only joins
    val b = RetrievalQueries.fusedBuild(spark, dir)
    b.collect()
    val bp = b.queryExecution.executedPlan.toString
    assert(bp.contains("TakeOrderedAndProject"),
      s"modality top-K must plan per-partition heaps, not a global sort:\n$bp")
    assert(!bp.contains("CartesianProduct"))
    assert(bp.contains("BroadcastHashJoin") || bp.contains("BroadcastNestedLoopJoin"))
  }

  test("q95 k-anonymity: risky-QI list reaches the exposure pass by broadcast") {
    val p = finalPlan("q95_k_anonymity")
    assert(p.contains("BroadcastHashJoin"),
      s"risky QI semi-join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q88/q89 drift: bin bounds broadcast, no fact-fact shuffle join") {
    Seq("q88_psi_drift", "q89_jsd_drift").foreach { name =>
      val p = finalPlan(name)
      assert(p.contains("BroadcastHashJoin"),
        s"$name: reference bin bounds must broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
    }
  }

  test("q99 perplexity: the LM meets the corpus by broadcast only (doc_nll build)") {
    // the discipline lives in the docNll BUILDER — the registered
    // consumers read the standing doc_nll artifact instead of
    // re-scoring (see the scan-free pin below)
    val df = SelectionQueries.docNllBuild(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"),
      s"bigram/context count tables must broadcast into the scoring scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must never shuffle to meet the model:\n$p")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"the spread exchange under the bigram explode must survive AQE:\n$p")
  }

  test("docNll consumers read the doc_nll artifact — no corpus re-score") {
    // q99 is the cheapest pure consumer: its warm plan must be a
    // per-source rollup of the artifact, never a documents scan
    // assert the DOCUMENTS scan is gone specifically (not any FileScan):
    // under SPARK_GRAFT_ARTIFACT_STORE the artifact itself legitimately
    // reads back as a parquet FileScan, and the pin must hold in both modes
    val p99 = finalPlan("q99_ppl_filter")
    assert(!p99.contains("documents.parquet") && !p99.contains("text#"),
      s"q99 must read the doc_nll artifact, not re-scan documents:\n$p99")
    val p149 = finalPlan("q149_ccnet_buckets")
    assert(!p149.contains("documents.parquet") && !p149.contains("text#"),
      s"q149 must read the doc_nll artifact, not re-scan documents:\n$p149")
  }

  test("q37 reads the doc_tokens artifact — the regex kernel runs only in the build") {
    // same store-mode scoping as the docNll consumer pin: the artifact
    // itself may read back as a parquet FileScan under the store
    val p37 = finalPlan("q37_bpe_tokens")
    assert(!p37.contains("documents.parquet") && !p37.contains("text#"),
      s"q37 must read the doc_tokens artifact, not re-run the regex pass:\n$p37")
    // and the BUILD is one spread corpus pass, no join
    val b = ExtendedQueries.docTokensBuild(spark, dir)
    b.collect()
    val bp = b.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!bp.contains("Join"), s"the doc_tokens build must not join:\n$bp")
    val scans = "Scan parquet".r.findAllIn(bp).length
    assert(scans === 1, s"one corpus pass claimed, $scans scans found:\n$bp")
  }

  test("q100 nb classifier: the scoring build meets the corpus by broadcast only") {
    // the discipline lives in the doc_scores BUILDER — q100/q104/q172
    // and the gate frame all read the standing artifact
    val df = ClassifierQueries.docScoresBuild(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"),
      s"the B-row weight table must broadcast into the scoring scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must never shuffle to meet the model:\n$p")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"the spread exchange under the hash kernel must survive AQE:\n$p")
    // and the registered consumer never re-scores the corpus
    val cp = finalPlan("q100_nb_classifier")
    assert(!cp.contains("documents.parquet") && !cp.contains("text#"),
      s"q100 must read the doc_scores artifact, not re-score documents:\n$cp")
  }

  test("q108 hard negatives: candidates come from the bucket equi-join, top-k is rank-limited") {
    val p = finalPlan("q108_hard_negatives")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"candidate generation must stay the LSH bucket equi-join, never all-pairs:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-k must use the rank-limit pushdown, not full window sorts:\n$p")
  }

  test("q101 recall: panel broadcasts into both passes, per-query top-k is rank-limited") {
    val p = finalPlan("q101_pq_recall")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the Q-row panel must broadcast — the corpus is the streamed side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing corpus-scale may shuffle to meet the panel:\n$p")
    // round 13: per-query top-10 is the graft_topk bounded aggregate —
    // O(k) state hash agg on packed (score, vec_id) longs, replacing
    // the row_number window that shuffled AND sorted the full Q·N
    // candidate stream twice (once per pass)
    assert(p.contains("graft_topk"),
      s"per-query top-10 must ride the native bounded top-k aggregate:\n$p")
    assert(!p.contains("Window"),
      s"no per-query ranking window may remain:\n$p")
  }

  test("q162 winnowing: selection is array-side in the doc row — no Window, no corpus join") {
    val p = finalPlan("q162_winnow_fingerprint")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
    // the fingerprint INDEX build runs entirely inside the doc row
    // (hash → sliding struct-min → array_distinct): nothing may
    // shuffle, sort or join before the selected sample explodes
    val fp = PipelineQueries.winnowFp(spark, dir)
    fp.collect()
    val fpPlan = PipelineQueries
      .winnowFingerprints(PipelineQueries.spanDocs(spark, dir))
      .queryExecution.executedPlan.toString
    assert(!fpPlan.contains("windowspecdefinition"),
      s"winnow selection must not plan a Window operator:\n$fpPlan")
    assert(!fpPlan.contains("Join"), s"no join in the index build:\n$fpPlan")
    assert(!fpPlan.contains("Sort"), s"no sort in the index build:\n$fpPlan")
  }

  test("q156 abtt: the raw-moment aggregate is one scan, join-free, map-side combined") {
    val arr = graft.Tables.spread(
        graft.Tables.embeddings(spark, dir),
        org.apache.spark.sql.functions.col("vec_id"))
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label"),
        org.apache.spark.sql.functions.expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))")
          .as("q"))
    val m = SimilarityQueries.abttMoments(arr)
    m.collect()
    val p = m.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Join"),
      s"the Gram must come from the outer-product aggregate, not a vec_id self-join:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"one corpus pass claimed, $scans scans found:\n$p")
    assert(p.contains("HashAggregate"),
      s"the 4161-cell aggregate must partial-aggregate map-side:\n$p")
  }
}
