package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q168 dedup-threshold calibration: rung table equals a plain-Scala
  * replay off the standing near-dup pair artifact, the bottom rung
  * counts exactly that artifact, and the curve is monotone. */
class DedupThresholdSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    graft.QueryCatalog.all.find(_.name == "q168_dedup_threshold_curve").get
      .fn(spark, dir).collect()

  test("every rung equals the plain-Scala replay off the pair artifact") {
    val pairs = DedupQueries.jaccardPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 1000000 + 0.5).toLong))
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").count(_.nonEmpty).toLong)
      .toMap
    val total = toks.values.sum
    assert(rows.length === 7)
    rows.foreach { r =>
      val thr = r.getAs[Long]("threshold_ppm")
      val hit = pairs.filter(_._3 >= thr)
      val docs = hit.flatMap(p => Seq(p._1, p._2)).distinct
      assert(r.getAs[Long]("n_pairs") === hit.length.toLong, s"thr=$thr")
      assert(r.getAs[Long]("n_docs_flagged") === docs.length.toLong, s"thr=$thr")
      val mass = docs.map(toks).sum
      assert(r.getAs[Long]("flagged_tokens") === mass, s"thr=$thr")
      assert(r.getAs[Long]("flagged_token_ppm") === mass * 1000000 / total, s"thr=$thr")
    }
  }

  test("rung 0.30 counts exactly the standing artifact; curve is monotone") {
    val artifactPairs = DedupQueries.jaccardPairs(spark, dir).count()
    assert(rows.head.getAs[Long]("threshold_ppm") === 300000L)
    assert(rows.head.getAs[Long]("n_pairs") === artifactPairs)
    Seq[String]("n_pairs", "n_docs_flagged", "flagged_tokens").foreach { c =>
      val vs = rows.map(_.getAs[Long](c)).toSeq
      assert(vs === vs.sorted.reverse, s"$c must not increase with the threshold")
    }
  }
}
