package graft.operators

import graft.{QueryCatalog, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q102 (BPE-packed training batches), q103 (LSH recall harness), and
  * q106 (LSH precision harness) invariants on real testdata —
  * conservation laws that hold for ANY corpus, so they pin the
  * kernels without re-deriving the oracle.
  */
class BatchBuilderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    QueryCatalog.all.find(_.name == name).get.fn(spark, dir).collect()

  test("q102 conserves docs and tokens across packs") {
    val rows = run("q102_bpe_packing")
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === Tables.documents(spark, dir).count())
    // every doc's BPE token count is >= 1 per non-empty word and the
    // corpus has text, so packed tokens must be strictly positive
    assert(rows.map(_.getAs[Long]("pack_tokens")).sum > 0)
    // every bucket's first pack starts at index 0 (the first doc's
    // start offset is 0); later indices may skip when a doc straddles
    // multiple budgets, so density is NOT asserted
    rows.groupBy(_.getAs[Long]("bucket")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("pack")).min === 0L)
    }
    // fill_rate is the rounded pack_tokens / budget
    rows.foreach { r =>
      val expect = math.floor(
        r.getAs[Long]("pack_tokens").toDouble / 4096 * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("fill_rate") === expect)
    }
    // sources genuinely mix: at least one pack holds more than one
    assert(rows.map(_.getAs[Long]("n_sources")).max > 1L)
  }

  test("q102 plan: dictionary joins broadcast, every window is partitioned") {
    val df = QueryCatalog.all.find(_.name == "q102_bpe_packing").get.fn(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the |V|-row token dictionary must reach the corpus explode by
    // broadcast; the corpus side must never shuffle to meet it
    assert(p.contains("BroadcastHashJoin"), s"dict join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle into the dict:\n$p")
    // the packing running sum must stay bucket-partitioned (B-way
    // parallel), never a global single-reducer window
    val winLines = p.split("\n").filter(_.contains("Window ["))
    assert(winLines.nonEmpty, s"pack assignment must be a window:\n$p")
    winLines.foreach(l => assert(l.split("\\], \\[").length >= 3,
      s"unpartitioned window (global running sum) in the plan:\n$l"))
  }

  test("q103 plan: candidate generation is equi-join only") {
    val df = QueryCatalog.all.find(_.name == "q103_lsh_recall").get.fn(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"band-bucket candidates must come from equi-joins:\n$p")
  }

  test("q103 recall is a valid per-decile fraction consistent with q26 truth") {
    val rows = run("q103_lsh_recall")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, h) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_hit"))
      assert(t > 0L && h >= 0L && h <= t)
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(recall === math.floor(h.toDouble / t * 1e6 + 0.5) / 1e6)
      assert(r.getAs[Long]("decile") >= 3L) // truth threshold 0.3
    }
    // the truth side IS q26: decile counts must sum to its row count
    val q26n = QueryCatalog.all.find(_.name == "q26_ngram_jaccard").get
      .fn(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_truth")).sum === q26n)
    // identical full shingle sets collide in every band: the corpus
    // plants exact duplicates (J = 1.0 on rare shingles, identical
    // full sets), so decile 10 must EXIST and be fully recalled —
    // the non-vacuous form of the harness's headline invariant
    val top10 = rows.filter(_.getAs[Long]("decile") === 10L)
    assert(top10.nonEmpty, "corpus has exact duplicates; decile 10 must be present")
    top10.foreach(r => assert(r.getAs[Double]("recall") === 1.0))
  }

  test("q106 precision accounts exactly for q25's verified output") {
    val rows = run("q106_lsh_precision")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nb = r.getAs[Long]("nb")
      assert(nb >= 1L && nb <= 8L, "agreement count is 1..8 bands")
      assert(r.getAs[Long]("n_true") <= r.getAs[Long]("n_cand"))
      val p = r.getAs[Double]("prec")
      assert(p >= 0.0 && p <= 1.0)
    }
    // the candidates that pass the exact J >= 0.5 verification ARE
    // q25's result set: Σ n_true across agreement counts must equal
    // its row count
    val q25n = QueryCatalog.all.find(_.name == "q25_minhash_lsh").get
      .fn(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_true")).sum === q25n)
    // more agreeing bands can only mean more-similar signatures: the
    // strongest agreement level's precision dominates the weakest's
    val byNb = rows.map(r => r.getAs[Long]("nb") -> r.getAs[Double]("prec")).toMap
    assert(byNb(byNb.keys.max) >= byNb(byNb.keys.min))
  }
}
