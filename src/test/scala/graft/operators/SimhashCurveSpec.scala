package graft.operators

import graft.SparkSpec

/** q129 SimHash operating curve — monotonicity, metric identities, and
  * cross-query consistency with q63's pair set.
  */
class SimhashCurveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    graft.QueryCatalog.all.find(_.name == name).get.fn(spark, dir)

  test("q129 curve is monotone and internally consistent") {
    val rows = q("q129_simhash_curve").collect().sortBy(_.getAs[Long]("radius"))
    assert(rows.nonEmpty && rows.length <= 4)
    val nT = rows.head.getAs[Long]("n_truth")
    assert(rows.forall(_.getAs[Long]("n_truth") == nT), "one truth set")
    rows.foreach { r =>
      val (p, tp) = (r.getAs[Long]("n_pred"), r.getAs[Long]("tp"))
      assert(tp <= p && tp <= nT, "tp bounded by both sides")
      assert(r.getAs[Double]("precision") ===
        math.floor(tp.toDouble / p * 1e6 + 0.5) / 1e6)
      assert(r.getAs[Double]("recall") ===
        math.floor(tp.toDouble / nT * 1e6 + 0.5) / 1e6)
      assert(r.getAs[Double]("f1") ===
        math.floor(2.0 * tp / (p + nT).toDouble * 1e6 + 0.5) / 1e6)
    }
    // widening the radius can only ADD predictions and hits
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_pred") <= b.getAs[Long]("n_pred"))
        assert(a.getAs[Long]("tp") <= b.getAs[Long]("tp"))
      case _ =>
    }
  }

  test("q129 at radius 3 predicts exactly q63's pair set") {
    val r3 = q("q129_simhash_curve").collect()
      .find(_.getAs[Long]("radius") == 3L).get.getAs[Long]("n_pred")
    assert(r3 === q("q63_simhash_neardup").count())
  }
}
