package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q172 exact AUC: the query's rank-sum construction must equal the
  * naive O(P·N) Mann-Whitney definition (every pos/neg pair compared,
  * ties at half credit) computed driver-side from the same held-out
  * scores, source by source. */
class GateAucSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("rank-sum AUC equals the all-pairs definition on every source") {
    val held = ClassifierQueries.docScores(spark, dir)
      .filter(col("doc_id") % 10 =!= 0)
      .select("source", "y", "s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = graft.QueryCatalog.all.find(_.name == "q172_gate_auc").get
      .fn(spark, dir).collect()
    assert(got.nonEmpty && got.length === held.size)
    got.foreach { r =>
      val rows = held(r.getAs[String]("source"))
      val pos = rows.filter(_._2 == 1L).map(_._3)
      val neg = rows.filter(_._2 == -1L).map(_._3)
      assert(r.getAs[Long]("n_pos") === pos.length.toLong)
      assert(r.getAs[Long]("n_neg") === neg.length.toLong)
      if (pos.nonEmpty && neg.nonEmpty) {
        val u2 = (for { p <- pos; n <- neg } yield
          if (p > n) 2L else if (p == n) 1L else 0L).map(BigInt(_)).sum
        val want = (u2 * 1000000 / (BigInt(pos.length) * neg.length * 2)).toLong
        assert(r.getAs[Long]("auc_ppm") === want, r.getAs[String]("source"))
        assert(r.getAs[Long]("auc_ppm") >= 0L && r.getAs[Long]("auc_ppm") <= 1000000L)
      } else assert(r.isNullAt(r.fieldIndex("auc_ppm")))
    }
  }

  test("the gate actually ranks: corpus-level AUC is decisively above chance") {
    val rows = graft.QueryCatalog.all.find(_.name == "q172_gate_auc").get
      .fn(spark, dir).collect()
      .flatMap(r => Option(r.getAs[Any]("auc_ppm")).map(_.asInstanceOf[Long]))
    assert(rows.nonEmpty)
    // the NB gate learned its target concept (q100's spec pins held-out
    // accuracy); its ranking quality must beat a coin on average
    assert(rows.sum / rows.length > 600000L, s"mean AUC ${rows.sum / rows.length}")
  }
}
