package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q175 MinHash calibration: every decile row equals a fully
  * independent driver-side replay (bigram shingles, MessageDigest
  * md5 minhashes, exact Jaccard) over the standing pair artifact,
  * plus the estimator's structural invariants. */
class MinhashCalibrationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val K = 16

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("every decile equals the MessageDigest replay over the pair artifact") {
    val shingleSets = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1).split(" ")
        r.getLong(0) -> t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
      }.toMap
    def sig(d: Long): Seq[String] =
      (0 until K).map(h => shingleSets(d).map(s => md5hex(s"$h:$s")).min)
    val pairs = DedupQueries.jaccardPairs(spark, dir)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) * 1000000 + 0.5).toLong))
    val rep = pairs.map { case (a, b, truePpm) =>
      val m = sig(a).zip(sig(b)).count { case (x, y) => x == y }.toLong
      (math.min(truePpm / 100000, 9L), truePpm, m * 1000000 / K)
    }.groupBy(_._1)
    val got = graft.QueryCatalog.all.find(_.name == "q175_minhash_calibration").get
      .fn(spark, dir).collect()
    assert(got.map(_.getAs[Long]("true_j_decile")).toSet === rep.keySet)
    got.foreach { r =>
      val xs = rep(r.getAs[Long]("true_j_decile"))
      val n = xs.length.toLong
      val (st, se) = (xs.map(_._2).sum, xs.map(_._3).sum)
      assert(r.getAs[Long]("n_pairs") === n)
      assert(r.getAs[Long]("mean_true_ppm") === st / n)
      assert(r.getAs[Long]("mean_est_ppm") === se / n)
      assert(r.getAs[Long]("mean_abs_err_ppm") ===
        xs.map(x => math.abs(x._3 - x._2)).sum / n)
      val d = se - st
      assert(r.getAs[Long]("mean_bias_ppm") === Math.floorDiv(d, n))
      // estimates snap to 16ths
      xs.foreach(x => assert(x._3 % (1000000 / K) == 0))
    }
  }
}
