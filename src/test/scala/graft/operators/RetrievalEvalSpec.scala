package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q125 retrieval-evaluation harness — exact driver-side recomputation
  * (cosine ranking + integer-µ metric algebra reimplemented in plain
  * Scala) plus metric-identity pins.
  */
class RetrievalEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val K = 10

  private def rate(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("q125 matches an exact plain-Scala recomputation") {
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val wMu = (1 to K).map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))
    val wPrefix = wMu.scanLeft(0L)(_ + _).tail
    val labCnt = vecs.groupBy(_._2).map { case (l, vs) => l -> vs.length.toLong }
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum

    val expected = vecs.filter(_._1 % 50 == 0).sortBy(_._1)
      .take(8) // the fixed eval panel (EvalPanelCap)
      .map {
      case (qid, lab, qv) =>
        val qn = norm(qv)
        val top = vecs.filter(_._1 != qid)
          .map { case (cid, cl, cv) =>
            (cid, cl, rate(dot(qv, cv) / (qn * norm(cv)))) }
          .sortBy { case (cid, _, sim) => (-sim, cid) }
          .take(K).zipWithIndex
        val rels = top.map { case ((_, cl, _), i) => (i + 1, if (cl == lab) 1L else 0L) }
        val hits = rels.map(_._2).sum
        val dcgU = rels.map { case (rn, rel) => rel * wMu(rn - 1) }.sum
        val mrr = rels.collectFirst { case (rn, 1L) => 1000000L / rn }.getOrElse(0L)
        val nRel = labCnt(lab) - 1
        val kEff = math.min(K.toLong, nRel)
        val idcgU = if (kEff <= 0) 0L else wPrefix(kEff.toInt - 1)
        val ndcg = if (idcgU == 0) 0L else dcgU * 1000000L / idcgU
        val recall = if (kEff <= 0) 0L else hits * 1000000L / kEff
        (qid, lab, nRel, hits, mrr, dcgU, idcgU, ndcg, recall)
    }

    val got = graft.QueryCatalog.all.find(_.name == "q125_retrieval_ndcg").get
      .fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(got.toSeq === expected.toSeq)
  }

  test("q126 closed form equals brute-force pairwise dot, exactly") {
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    // quantize exactly as the query does: unit-normalize, milli-codes
    val codes = vecs.map { case (lab, v) =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (lab, v.map(x => math.floor(x / nrm * 1000 + 0.5).toLong))
    }
    // brute force O(N²): sum of pairwise dots over i != j, exact longs
    def bruteNum(cs: Array[Array[Long]]): Long = {
      var s = 0L
      for (i <- cs.indices; j <- cs.indices if i != j)
        s += cs(i).zip(cs(j)).map { case (a, b) => a * b }.sum
      s
    }
    val rows = graft.QueryCatalog.all.find(_.name == "q126_anisotropy").get
      .fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byLab = codes.groupBy(_._1)
    byLab.foreach { case (lab, cs) =>
      val (n, num) = rows(lab)
      assert(n === cs.length.toLong, s"n($lab)")
      assert(num === bruteNum(cs.map(_._2)), s"pair_num($lab) closed form == brute force")
    }
    val (nAll, numAll) = rows(-1L)
    assert(nAll === codes.length.toLong)
    assert(numAll === bruteNum(codes.map(_._2)), "overall closed form == brute force")
    // overall covers cross-label pairs too: with >1 label present it
    // cannot equal the per-label within-pair sum
    if (byLab.size > 1)
      assert(numAll !== byLab.values.map(cs => bruteNum(cs.map(_._2))).sum)
  }

  test("q125 metric identities hold on every row") {
    val rows = graft.QueryCatalog.all.find(_.name == "q125_retrieval_ndcg").get
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits"); val dcg = r.getAs[Long]("dcg_u")
      val idcg = r.getAs[Long]("idcg_u"); val ndcg = r.getAs[Long]("ndcg_ppm")
      assert(hits >= 0 && hits <= K)
      // a ranking can never beat the ideal
      assert(dcg <= idcg, "dcg bounded by idcg")
      assert(ndcg >= 0 && ndcg <= 1000000L)
      assert(r.getAs[Long]("recall_ppm") <= 1000000L)
      assert(r.getAs[Long]("mrr_ppm") <= 1000000L)
      // zero hits <=> zero everywhere
      assert((hits == 0) === (dcg == 0L))
      assert((hits == 0) === (r.getAs[Long]("mrr_ppm") == 0L))
    }
  }
}
