package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q112 curriculum phases and q113 epoch shards — behavior pins via
  * independent driver-side recomputation on sf0.001.
  */
class CurriculumShuffleSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q112
  test("q112 phase assignment matches an independent recomputation") {
    val docs = SelectionQueries.docNll(spark, dir)
      .select(col("source"), col("nll"), col("nbg"))
      .as[(String, Long, Long)].collect()
    // replicate the binning + boundary arithmetic in plain Scala
    val binned = docs.map { case (src, nll, nbg) =>
      (src, nbg + 1, ((nll * 1000) / nbg) / 10000) }
    val binTokens = binned.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val total = binTokens.values.sum
    val order = binTokens.keys.toSeq.sorted
    val cumExcl = order.zip(order.scanLeft(0L)((a, b) => a + binTokens(b)).init).toMap
    val phaseOf = order.map(b => b -> math.min(2L, 3L * cumExcl(b) / total)).toMap
    val expected = binned
      .groupBy { case (src, _, bin) => (phaseOf(bin), src) }
      .view.mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val got = SelectionQueries.specs.find(_.name == "q112_curriculum_phases").get
      .fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("phase"), r.getAs[String]("source")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(got === expected)
    // all three phases materialize and difficulty volume splits non-trivially
    val phaseTok = got.groupBy(_._1._1).view.mapValues(_.values.map(_._2).sum).toMap
    assert(phaseTok.keySet === Set(0L, 1L, 2L))
    phaseTok.values.foreach(t => assert(t > 0L))
  }

  test("q112 phases are contiguous in difficulty and ~equal in tokens") {
    // bin-granular boundaries: every phase-p bin precedes every
    // phase-(p+1) bin, and no phase exceeds a third of the tokens by
    // more than one straddling bin's worth
    val d = SelectionQueries.docNll(spark, dir)
      .select(expr("((nll * 1000) DIV nbg) DIV 10000").as("bin"),
        (col("nbg") + 1L).as("t"))
      .as[(Long, Long)].collect()
    val binTokens = d.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = binTokens.values.sum
    val order = binTokens.keys.toSeq.sorted
    var cum = 0L
    var lastPhase = 0L
    order.foreach { b =>
      val p = math.min(2L, 3L * cum / total)
      assert(p >= lastPhase, s"phase regressed at bin $b")
      lastPhase = p
      cum += binTokens(b)
    }
    val maxBin = binTokens.values.max
    val phaseTok = order.foldLeft((Map.empty[Long, Long], 0L)) { case ((m, c), b) =>
      val p = math.min(2L, 3L * c / total)
      (m.updated(p, m.getOrElse(p, 0L) + binTokens(b)), c + binTokens(b))
    }._1
    phaseTok.values.foreach { t =>
      assert(t <= total / 3 + maxBin, s"phase overfilled beyond bin granularity: $t")
    }
  }

  // ------------------------------------------------------------- q113
  private def q113() = PipelineQueries.specs.find(_.name == "q113_epoch_shards").get
    .fn(spark, dir).collect()

  test("q113 every epoch deals every doc and every token exactly once") {
    val (nDocs, nToks) = Tables.documents(spark, dir)
      .select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(count(lit(1)), sum(col("t"))).as[(Long, Long)].head()
    val rows = q113()
    rows.groupBy(_.getAs[Long]("epoch")).foreach { case (e, rs) =>
      assert(rs.map(_.getAs[Long]("n_docs")).sum === nDocs, s"epoch $e doc leak")
      assert(rs.map(_.getAs[Long]("n_tokens")).sum === nToks, s"epoch $e token leak")
    }
  }

  test("q113 epochs produce different orders; reruns produce identical ones") {
    val a = q113()
    val fpByEpoch = a.groupBy(_.getAs[Long]("epoch")).view
      .mapValues(_.map(r => r.getAs[Long]("shard") -> r.getAs[String]("order_fp")).toMap)
      .toMap
    // the seeded permutation must actually change between epochs
    assert(fpByEpoch(0L) !== fpByEpoch(1L), "epoch reshuffle is a no-op")
    // and be bit-stable across reruns
    val b = q113()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("q113 shard fingerprint matches a direct digest recomputation") {
    val docIds = Tables.documents(spark, dir).select(col("doc_id"))
      .as[Long].collect()
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docIds
      .map(id => (md5hex(s"0:$id"), id))
      .map { case (k, id) => (java.lang.Long.parseLong(k.take(12), 16) % 8, k, id) }
      .groupBy(_._1).view
      .mapValues(_.sortBy(x => (x._2, x._3)).map(_._3).mkString(","))
      .mapValues(md5hex).toMap
    val got = q113().filter(_.getAs[Long]("epoch") == 0L)
      .map(r => r.getAs[Long]("shard") -> r.getAs[String]("order_fp")).toMap
    assert(got === expected)
  }
}
