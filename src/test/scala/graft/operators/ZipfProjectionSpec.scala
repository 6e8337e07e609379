package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q118 Zipf vocabulary-coverage curve + q119 random-projection (JL)
  * distortion audit — exact recomputation against independent driver-
  * side references, plus the JL concentration property.
  */
class ZipfProjectionSpec extends SparkSpec {

  private def q(name: String) =
    graft.QueryCatalog.all.find(_.name == name).get.fn

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // -------------------------------------------------------------- q118
  test("q118 coverage curve matches a direct recomputation") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select(col("text")).collect().map(_.getString(0))
    val counts = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val vocab = ranked.size.toLong
    val total = ranked.map(_._2).sum
    val rows = q("q118_vocab_coverage")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq === Seq(100L, 300L, 1000L, 3000L))
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      val covered = ranked.take(math.min(k, vocab).toInt).map(_._2).sum
      assert(r.getAs[Long]("vocab") === vocab)
      assert(r.getAs[Long]("total") === total)
      assert(r.getAs[Long]("covered_tokens") === covered, s"k=$k")
      assert(r.getAs[Long]("coverage_ppm") === covered * 1000000L / total, s"k=$k")
    }
    // curve is monotone and saturates at the full corpus once k ≥ vocab
    val cov = rows.map(_.getAs[Long]("covered_tokens"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    rows.filter(_.getAs[Long]("k") >= vocab)
      .foreach(r => assert(r.getAs[Long]("covered_tokens") === total))
  }

  // -------------------------------------------------------------- q119
  /** Independent reference projection: same md5 sign matrix, same
    * integer quantization, plain Scala arithmetic. */
  private def refHistogram(vecs: Seq[Seq[Float]]): Map[Long, Long] = {
    val sgn = Array.tabulate(64, 16) { (j, k) =>
      if ("01234567".contains(md5hex(s"rp:$j:$k").charAt(0))) 1L else -1L
    }
    vecs.flatMap { v =>
      val code = v.map(x => math.floor(x.toDouble * 64 + 0.5).toLong)
      val c2 = code.map(c => c * c).sum
      if (c2 == 0) None
      else {
        val p2 = (0 until 16).map { k =>
          val p = code.indices.map(j => code(j) * sgn(j)(k)).sum
          p * p
        }.sum
        Some(math.floor(math.sqrt(p2.toDouble / (16L * c2)) * 40).toLong)
      }
    }.groupBy(identity).map { case (b, xs) => (b, xs.length.toLong) }
  }

  test("q119 histogram matches the reference projection exactly") {
    val dir = "/root/testdata/sf0.001"
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    val expected = refHistogram(vecs)
    val got = q("q119_random_projection")(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_vecs")).toMap
    assert(got === expected)
    assert(got.values.sum === vecs.size.toLong, "zero-norm vectors appeared")
  }

  test("q119 distortion concentrates around 1 (the JL property)") {
    val rows = q("q119_random_projection")(spark, "/root/testdata/sf0.01").collect()
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    // ratio in [0.7, 1.3) = buckets 28..51 at 0.025 width; for ±1
    // projection at K = 16 the ratio std is ~1/sqrt(2K) ≈ 0.18, so the
    // bulk must sit in this band
    val inBand = rows.filter { r =>
      val b = r.getAs[Long]("bucket"); b >= 28 && b <= 51
    }.map(_.getAs[Long]("n_vecs")).sum
    assert(inBand.toDouble / total >= 0.7,
      s"only $inBand of $total within 0.7-1.3 distortion")
    // weighted bucket-midpoint mean lands near 1
    val mean = rows.map(r =>
      (r.getAs[Long]("bucket") + 0.5) / 40.0 * r.getAs[Long]("n_vecs")).sum / total
    assert(mean > 0.85 && mean < 1.15, s"mean distortion $mean")
  }
}
