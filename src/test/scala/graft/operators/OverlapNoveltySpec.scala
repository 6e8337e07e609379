package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q122 source-overlap matrix, q124 n-gram novelty, q123 cluster-margin
  * audit — exact driver-side recomputation for the two gram queries
  * (independent of both the Spark plan and the DuckDB oracle) plus
  * internal-consistency pins for the IVF audit.
  */
class OverlapNoveltySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    graft.QueryCatalog.all.find(_.name == name).get.fn

  private def rate(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Distinct word-8-gram set of one text (empty below 8 tokens). */
  private def grams(text: String): Set[String] = {
    val t = text.split(" ", -1)
    if (t.length < 8) Set.empty
    else (0 to t.length - 8).map(i => t.slice(i, i + 8).mkString(" ")).toSet
  }

  // -------------------------------------------------------------- q122
  test("q122 matches an exact per-source set recomputation") {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc: Map[String, Set[String]] =
      docs.groupBy(_._1).map { case (src, rows) =>
        src -> rows.iterator.flatMap(r => grams(r._2)).toSet
      }
    val rows = q("q122_source_overlap")(spark, dir).collect()
    val srcs = bySrc.keys.toSeq.sorted
    assert(rows.length === srcs.size * (srcs.size - 1), "full ordered off-diagonal domain")
    rows.foreach { r =>
      val a = r.getAs[String]("src_a"); val b = r.getAs[String]("src_b")
      assert(a !== b)
      val ga = bySrc(a); val shared = (ga & bySrc(b)).size.toLong
      assert(r.getAs[Long]("n_a") === ga.size.toLong, s"n_a($a)")
      assert(r.getAs[Long]("n_shared") === shared, s"shared($a,$b)")
      assert(r.getAs[Double]("containment") === rate(shared.toDouble / ga.size), s"c($a,$b)")
    }
    // shared counts are symmetric even though containment is not
    val sh = rows.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_shared")).toMap
    sh.foreach { case ((a, b), n) => assert(sh((b, a)) === n, s"symmetry($a,$b)") }
  }

  // -------------------------------------------------------------- q124
  test("q124 matches an exact held-vs-train set recomputation") {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val trainGrams: Set[String] =
      docs.iterator.filter(_._1 % 50 != 0).flatMap(d => grams(d._2)).toSet
    val expected = docs.filter(_._1 % 50 == 0)
      .map { case (id, text) => id -> grams(text) }
      .filter(_._2.nonEmpty)
      .sortBy(_._1)
    val rows = q("q124_ngram_novelty")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === expected.map(_._1).toSeq)
    rows.zip(expected).foreach { case (r, (id, gs)) =>
      val hit = (gs & trainGrams).size.toLong
      assert(r.getAs[Long]("n_grams") === gs.size.toLong, s"n_grams($id)")
      assert(r.getAs[Long]("n_hit") === hit, s"n_hit($id)")
      val nov = rate(1.0 - hit.toDouble / gs.size)
      assert(r.getAs[Double]("novelty") === nov, s"novelty($id)")
      assert(r.getAs[Boolean]("regurgitated") === (nov < 0.5), s"flag($id)")
    }
  }

  // -------------------------------------------------------------- q123
  test("q123 margins are argmax-consistent and cover every vector") {
    val rows = q("q123_cluster_margin")(spark, dir).collect()
    val nVecs = graft.Tables.embeddings(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === nVecs, "every vector audited once")
    rows.foreach { r =>
      val cell = r.getAs[Long]("cell")
      assert(cell >= 0 && cell < 16, s"cell $cell in centroid domain")
      // assignment is the argmax over centroids, so the margin to the
      // runner-up can never be negative (exact integer µ-units since
      // the avg() float-boundary fix)
      assert(r.getAs[Long]("mean_margin_uu") >= 0L, s"margin(cell=$cell)")
      assert(r.getAs[Long]("mean_cohesion_uu") >= -1000000L &&
        r.getAs[Long]("mean_cohesion_uu") <= 1000000L, s"cohesion(cell=$cell)")
      assert(r.getAs[Long]("n_boundary") <= r.getAs[Long]("n_vecs"), s"boundary(cell=$cell)")
    }
  }
}
