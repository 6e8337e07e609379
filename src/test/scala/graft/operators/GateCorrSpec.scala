package graft.operators

import graft.SparkSpec
import graft.functions.LnSmallKernel
import org.apache.spark.sql.functions._

/** q120 gate-ensemble agreement + q121 feature-correlation profile —
  * internal-consistency pins and exact driver-side recomputation (the
  * SQL twins are driver-oracle-checked).
  */
class GateCorrSpec extends SparkSpec {

  private def q(name: String) =
    graft.QueryCatalog.all.find(_.name == name).get.fn

  // -------------------------------------------------------------- q120
  test("q120 confusion counts close and kappa matches its own counts") {
    val rows = q("q120_gate_agreement")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getAs[String]("pair")).sorted.toSeq ===
      Seq("lm~entropy", "lm~nb", "nb~entropy"))
    // all pairs score the same doc population
    assert(rows.map(_.getAs[Long]("n_docs")).distinct.length === 1)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val bk = r.getAs[Long]("both_keep"); val bd = r.getAs[Long]("both_drop")
      val ao = r.getAs[Long]("a_only"); val bo = r.getAs[Long]("b_only")
      assert(bk + bd + ao + bo === n, r.getAs[String]("pair"))
      assert(r.getAs[Long]("agree_ppm") === (bk + bd) * 1000000L / n)
      // kappa recomputed from the row's own confusion counts; NULL when
      // n² == chance (undefined kappa — fully concentrated marginals)
      val chance = (bk + ao) * (bk + bo) + (bd + bo) * (bd + ao)
      if (n * n - chance == 0L) {
        assert(r.isNullAt(r.fieldIndex("kappa")), r.getAs[String]("pair"))
      } else {
        val expected =
          math.floor((n * (bk + bd) - chance).toDouble /
            (n * n - chance).toDouble * 1000 + 0.5) / 1000
        assert(r.getAs[Double]("kappa") === expected, r.getAs[String]("pair"))
        assert(r.getAs[Double]("kappa") > -1.0 && r.getAs[Double]("kappa") <= 1.0)
      }
    }
    // each gate is non-degenerate on the corpus (keeps AND drops exist)
    val lmNb = rows.find(_.getAs[String]("pair") == "lm~nb").get
    assert(lmNb.getAs[Long]("both_keep") + lmNb.getAs[Long]("a_only") > 0, "lm keeps")
    assert(lmNb.getAs[Long]("both_drop") + lmNb.getAs[Long]("b_only") > 0, "lm drops")
    val nbEnt = rows.find(_.getAs[String]("pair") == "nb~entropy").get
    assert(nbEnt.getAs[Long]("both_keep") + nbEnt.getAs[Long]("b_only") > 0, "ent keeps")
    assert(nbEnt.getAs[Long]("both_drop") + nbEnt.getAs[Long]("a_only") > 0, "ent drops")
  }

  // -------------------------------------------------------------- q121
  test("q121 matches an exact driver-side recomputation") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select(col("text"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val feats = docs.map { case (text, nChars) =>
      val toks = text.split(" ", -1) // keep trailing empties, as Spark split does
      val n = toks.length.toLong
      val counts = toks.groupBy(identity).map(_._2.length.toLong)
      val ssum = counts.map(c => c * LnSmallKernel.mnat(c, n)).sum
      val entropy = math.max(0L, -ssum) / n
      (n, nChars, counts.size.toLong, entropy)
    }
    def pearson(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
      val sxx = xs.map(x => BigInt(x) * x).sum
      val syy = ys.map(y => BigInt(y) * y).sum
      val r = (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
      math.floor(r * 1e6 + 0.5) / 1e6
    }
    val expected = Map(
      "n_tokens~n_chars" -> pearson(feats.map(_._1).toIndexedSeq, feats.map(_._2).toIndexedSeq),
      "n_tokens~vocab" -> pearson(feats.map(_._1).toIndexedSeq, feats.map(_._3).toIndexedSeq),
      "n_tokens~entropy" -> pearson(feats.map(_._1).toIndexedSeq, feats.map(_._4).toIndexedSeq),
      "vocab~entropy" -> pearson(feats.map(_._3).toIndexedSeq, feats.map(_._4).toIndexedSeq),
    )
    val got = q("q121_feature_corr")(spark, dir).collect()
      .map(r => r.getAs[String]("pair") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("corr"))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (pair, corr) =>
      assert(got(pair)._1 === docs.length.toLong, pair)
      assert(got(pair)._2 === corr, pair)
    }
    // structural sanity: token count and char count move together
    assert(got("n_tokens~n_chars")._2 > 0.9)
  }

  // -------------------------------------------------------------- q130
  test("q130 per-source totals reconcile exactly with q120's confusion counts") {
    val dir = "/root/testdata/sf0.001"
    val m = q("q130_source_gate_matrix")(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("gate")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_keep"), r.getAs[Long]("keep_ppm")))
      .toMap
    // exact ppm identity per cell
    m.foreach { case ((s, g), (n, k, ppm)) =>
      assert(ppm === k * 1000000L / n, s"$s/$g")
    }
    // the composite can never beat any individual gate
    m.keys.map(_._1).toSeq.distinct.foreach { s =>
      val all = m((s, "all"))._2
      Seq("lm", "nb", "entropy").foreach(g => assert(all <= m((s, g))._2, s"$s all≤$g"))
    }
    // corpus-level gate totals == q120's marginals (same gate frame)
    val q120r = q("q120_gate_agreement")(spark, dir).collect()
      .map(r => r.getAs[String]("pair") -> r).toMap
    def tot(g: String) = m.collect { case ((_, `g`), (_, k, _)) => k }.sum
    val lmNb = q120r("lm~nb"); val lmEnt = q120r("lm~entropy")
    assert(tot("lm") === lmNb.getAs[Long]("both_keep") + lmNb.getAs[Long]("a_only"))
    assert(tot("nb") === lmNb.getAs[Long]("both_keep") + lmNb.getAs[Long]("b_only"))
    assert(tot("entropy") ===
      lmEnt.getAs[Long]("both_keep") + lmEnt.getAs[Long]("b_only"))
    // same doc population
    assert(m.collect { case ((_, "lm"), (n, _, _)) => n }.sum ===
      lmNb.getAs[Long]("n_docs"))
  }
}
