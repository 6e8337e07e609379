package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance weighting: the selected set must be ENRICHED in the
  * target domain (the whole point of importance resampling), logits
  * must be exact integer milli-nat sums, and the per-source rollup
  * must account for every doc. */
class SelectionQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("selected docs are enriched in the target domain") {
    val rows = SelectionQueries.docLogits(spark, dir)
      .select(col("tgt"), (col("logit") > 0).as("sel")).collect()
    val all = rows.length
    val tgtRate = rows.count(_.getBoolean(0)).toDouble / all
    val sel = rows.filter(_.getBoolean(1))
    assert(sel.nonEmpty && sel.length < all, "selection must be non-trivial")
    val selTgtRate = sel.count(_.getBoolean(0)).toDouble / sel.length
    assert(selTgtRate > tgtRate,
      f"selected target-rate $selTgtRate%.2f must exceed corpus rate $tgtRate%.2f")
    // and the rejected remainder is correspondingly depleted
    val rej = rows.filterNot(_.getBoolean(1))
    val rejTgtRate = rej.count(_.getBoolean(0)).toDouble / rej.length
    assert(rejTgtRate < tgtRate)
  }

  test("every target doc scores at least as high as the logit it gets from raw alone") {
    // target docs contain >=2 'window' tokens whose bucket weight is
    // positive (the target model is denser there by construction), so
    // the MEAN target logit must exceed the mean non-target logit
    val byTgt = SelectionQueries.docLogits(spark, dir)
      .groupBy(col("tgt")).agg(avg(col("logit")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byTgt(true) > byTgt(false))
  }

  test("q93 per-source rollup accounts for every document") {
    val out = graft.QueryCatalog.all.find(_.name == "q93_dsir_select").get
      .fn(spark, dir).collect()
    val total = graft.Tables.documents(spark, dir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === total)
    out.foreach { r =>
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_docs"))
      val share = r.getAs[Double]("sel_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }
}
