package graft.operators

import graft.SparkSpec
import graft.functions.Log2Kernel
import org.apache.spark.sql.functions._

/** q164 Zipf slope + q165 Good-Turing/Chao1: exact plain-Scala replay
  * of every sf0.001 row, plus planted corpora with hand-computable
  * exact answers — a perfectly collinear dyadic rank-frequency curve
  * (slope −2.000000 on the nose, exercising the signed floor path)
  * and a hapax/dis mix whose Chao1 is integral. */
class ZipfVocabSpec extends SparkSpec {

  import spark.implicits._

  private def fdiv(a: BigInt, b: BigInt): BigInt = {
    val q = a / b
    if (a % b != 0 && a.signum * b.signum < 0) q - 1 else q
  }

  private val panel = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L)

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("zipfvocab").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String, dir: String) =
    TextQueries.specs.find(_.name == name).get.fn(spark, dir)

  /** (counts per term, desc-ranked) for one source's texts. */
  private def termCounts(texts: Seq[String]): Seq[Long] =
    texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.map(_._2)

  private def srcTexts(dir: String): Map[String, Seq[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("q164 sf0.001: every row equals the plain-Scala replay") {
    val dir = "/root/testdata/sf0.001"
    val texts = srcTexts(dir)
    val got = run("q164_zipf_slope", dir).collect()
    assert(got.nonEmpty && got.length === texts.size)
    got.foreach { r =>
      val cs = termCounts(texts(r.getAs[String]("source")))
      assert(r.getAs[Long]("vocab") === cs.size.toLong)
      assert(r.getAs[Long]("n_tokens") === cs.sum)
      assert(r.getAs[Long]("top_freq") === cs.head)
      val pts = panel.filter(_ <= cs.size)
        .map(rk => (Log2Kernel.q20(rk, 1L), Log2Kernel.q20(cs(rk.toInt - 1), 1L)))
      assert(r.getAs[Long]("n_pts") === pts.size.toLong)
      val n = pts.size.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val num = n * pts.map(p => p._1 * p._2).sum - sx * sy
      val den = n * pts.map(p => p._1 * p._1).sum - sx * sx
      if (den > 0) {
        assert(r.getAs[Long]("zipf_slope_ppm") ===
          fdiv(BigInt(num) * 1000000, BigInt(den)).toLong)
        assert(r.getAs[Long]("log2c_micro") ===
          fdiv((BigInt(sy) * den - BigInt(num) * sx) * 1000000,
            BigInt(n) * den * 1048576).toLong)
      } else assert(r.isNullAt(r.fieldIndex("zipf_slope_ppm")))
    }
  }

  test("q164 planted collinear dyadic curve: slope exactly -2.000000") {
    // ranks 1,2,4 carry counts 64,16,4 (rank 3's filler count 5 keeps
    // the ordering but is off-panel): three exactly-dyadic points
    // (0,6),(1,4),(2,2) in log2 -> slope -2, intercept 6, both exact
    val text = (Seq.fill(64)("t1") ++ Seq.fill(16)("t2") ++
      Seq.fill(5)("t3") ++ Seq.fill(4)("t4")).mkString(" ")
    val r = run("q164_zipf_slope", writeDocs(Seq((1L, text, "en", "dyad")))).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("vocab") === 4L)
    assert(r.head.getAs[Long]("n_tokens") === 89L)
    assert(r.head.getAs[Long]("top_freq") === 64L)
    assert(r.head.getAs[Long]("n_pts") === 3L)
    assert(r.head.getAs[Long]("zipf_slope_ppm") === -2000000L)
    assert(r.head.getAs[Long]("log2c_micro") === 6000000L)
  }

  test("q165 sf0.001: every row equals the plain-Scala replay") {
    val dir = "/root/testdata/sf0.001"
    val texts = srcTexts(dir)
    val got = run("q165_good_turing", dir).collect()
    assert(got.nonEmpty && got.length === texts.size)
    got.foreach { r =>
      val cs = termCounts(texts(r.getAs[String]("source")))
      val (v, n) = (cs.size.toLong, cs.sum)
      val h = cs.count(_ == 1L).toLong
      val d = cs.count(_ == 2L).toLong
      assert(r.getAs[Long]("vocab") === v)
      assert(r.getAs[Long]("n_tokens") === n)
      assert(r.getAs[Long]("hapax") === h)
      assert(r.getAs[Long]("dis") === d)
      assert(r.getAs[Long]("unseen_mass_ppm") === h * 1000000 / n)
      assert(r.getAs[Long]("coverage_ppm") === (n - h) * 1000000 / n)
      assert(r.getAs[Long]("hapax_vocab_ppm") === h * 1000000 / v)
      assert(r.getAs[Long]("chao1_vocab") === v + h * (h - 1) / (2 * (d + 1)))
    }
  }

  test("q165 planted mix: hand-computed Good-Turing and Chao1") {
    // 3 hapax + 2 dis + one 5x term: V=6, N=12, N1=3, N2=2
    val text = "h1 h2 h3 d1 d1 d2 d2 x x x x x"
    val r = run("q165_good_turing", writeDocs(Seq((1L, text, "en", "gt")))).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("vocab") === 6L)
    assert(r.head.getAs[Long]("n_tokens") === 12L)
    assert(r.head.getAs[Long]("hapax") === 3L)
    assert(r.head.getAs[Long]("dis") === 2L)
    assert(r.head.getAs[Long]("unseen_mass_ppm") === 250000L)
    assert(r.head.getAs[Long]("coverage_ppm") === 750000L)
    assert(r.head.getAs[Long]("hapax_vocab_ppm") === 500000L)
    assert(r.head.getAs[Long]("chao1_vocab") === 7L) // 6 + 3*2/(2*3)
  }

  test("q165 all-hapax source: Chao1 projects far beyond the observed vocabulary") {
    val r = run("q165_good_turing",
      writeDocs(Seq((1L, (1 to 9).map(i => s"u$i").mkString(" "), "en", "nov")))).collect()
    assert(r.head.getAs[Long]("unseen_mass_ppm") === 1000000L)
    assert(r.head.getAs[Long]("coverage_ppm") === 0L)
    assert(r.head.getAs[Long]("chao1_vocab") === 9L + 9L * 8L / 2L)
  }
}
