package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior pins for the round-7 training-data operators: q108
  * hard-negative mining (negatives must be HONEST — no near-dups, no
  * same-label) and q109 dedup-aware splits (cluster-keyed assignment
  * is structurally leak-free; the naive doc-id split demonstrably
  * leaks on the planted near-dup corpus). */
class TrainingDataOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.QueryCatalog.all.find(_.name == name).get.fn(spark, dir)

  test("q108: every mined negative is below the dup threshold and cross-label") {
    val rows = run("q108_hard_negatives").collect()
    assert(rows.nonEmpty, "the sf0.001 panel must mine at least one negative")
    rows.foreach { r =>
      assert(r.getAs[Double]("sim") < 0.4,
        s"near-duplicate (sim ${r.getAs[Double]("sim")}) used as negative — false-negative poisoning")
      assert(r.getAs[Long]("q_label") !== r.getAs[Long]("neg_label"),
        "same-label candidate used as negative — potential positive")
      assert(r.getAs[Long]("qid") !== r.getAs[Long]("neg_id"))
    }
  }

  test("q108: per-query ranks are 1..k with non-increasing similarity (hardest first)") {
    val byQ = run("q108_hard_negatives").collect()
      .groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).toSeq === (1L to sorted.length).toSeq,
        s"query $qid ranks must be dense from 1")
      val sims = sorted.map(_.getAs[Double]("sim")).toSeq
      assert(sims === sims.sorted.reverse, s"query $qid negatives must rank hardest-first")
      assert(sorted.length <= 3)
    }
  }

  test("q109: cluster-keyed splits never leak; the naive doc-id split does") {
    val rows = run("q109_leakage_safe_splits").collect()
    val (cluster, naive) = rows.partition(_.getAs[String]("scheme") == "cluster")
    assert(cluster.nonEmpty && naive.nonEmpty)
    cluster.foreach { r =>
      assert(r.getAs[Long]("leak_edges") === 0L,
        s"cluster scheme must be leak-free by construction, split ${r.getAs[String]("split")}")
    }
    assert(naive.map(_.getAs[Long]("leak_edges")).sum > 0L,
      "the planted near-dup corpus must show leakage under a naive doc-id split")
  }

  test("q109: both schemes account for every document; all three splits exist") {
    val rows = run("q109_leakage_safe_splits").collect()
    val total = graft.Tables.documents(spark, dir).count()
    Seq("cluster", "naive").foreach { scheme =>
      val mine = rows.filter(_.getAs[String]("scheme") == scheme)
      assert(mine.map(_.getAs[Long]("n_docs")).sum === total, s"$scheme docs must sum to corpus")
      assert(mine.map(_.getAs[String]("split")).toSet === Set("train", "val", "test"))
    }
    // under the cluster scheme a component lives in exactly ONE split,
    // so per-split cluster counts sum to the true component count
    val nComponents = run("q54_cc_dedup_clusters")
      .select(countDistinct(col("component_id"))).collect()(0).getLong(0)
    val clusterSum = rows.filter(_.getAs[String]("scheme") == "cluster")
      .map(_.getAs[Long]("n_clusters")).sum
    assert(clusterSum === nComponents,
      "cluster-scheme per-split cluster counts must partition the component set")
  }
}
