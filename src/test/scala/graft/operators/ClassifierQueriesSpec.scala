package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Naive-Bayes quality classifier: it must actually LEARN (held-out
  * accuracy above the majority-class rate — the data was never fit
  * on), scores must separate the classes, and the per-source rollup
  * must equal the per-doc prediction rule. */
class ClassifierQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("held-out accuracy beats the majority-class rate") {
    val rows = ClassifierQueries.docScores(spark, dir)
      .select(col("doc_id"), col("y"), col("s")).collect()
    val held = rows.filter(_.getLong(0) % 10 != 0)
    assert(held.nonEmpty)
    val pos = held.count(_.getLong(1) == 1L)
    val majority = math.max(pos, held.length - pos).toDouble / held.length
    val correct = held.count(r => (r.getLong(2) > 0L) == (r.getLong(1) == 1L))
    val acc = correct.toDouble / held.length
    assert(acc > majority,
      f"held-out acc $acc%.3f must beat majority rate $majority%.3f — else nothing was learned")
  }

  test("scores separate the classes in the mean") {
    val byY = ClassifierQueries.docScores(spark, dir)
      .groupBy(col("y")).agg(avg(col("s")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byY(1L) > byY(-1L))
  }

  test("q100 rollup equals the per-doc prediction rule") {
    val per = ClassifierQueries.docScores(spark, dir).collect()
    val out = graft.QueryCatalog.all.find(_.name == "q100_nb_classifier").get
      .fn(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === per.length)
    assert(out.map(_.getAs[Long]("n_pred_pos")).sum ===
      per.count(_.getAs[Long]("s") > 0L))
    assert(out.map(_.getAs[Long]("n_correct")).sum ===
      per.count(r => (r.getAs[Long]("s") > 0L) == (r.getAs[Long]("y") == 1L)))
    out.foreach { r =>
      val acc = r.getAs[Double]("acc")
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }

  test("q104 bins partition the corpus and calibration rises end-to-end") {
    val rows = graft.QueryCatalog.all.find(_.name == "q104_nb_calibration").get
      .fn(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      graft.Tables.documents(spark, dir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("min_score") <= r.getAs[Long]("max_score"))
      val pr = r.getAs[Double]("pos_rate")
      assert(pr >= 0.0 && pr <= 1.0)
    }
    // bins are disjoint score ranges in bin order (clamping only merges
    // the extremes into the end bins, never reorders)
    val sorted = rows.sortBy(_.getAs[Long]("bin"))
    sorted.sliding(2).filter(_.length == 2).foreach { w =>
      assert(w(0).getAs[Long]("max_score") < w(1).getAs[Long]("min_score"))
    }
    // the scorer must separate end to end: the top bin's observed
    // positive rate beats the bottom bin's
    assert(sorted.length >= 2, "corpus must spread over >= 2 score bins")
    assert(sorted.last.getAs[Double]("pos_rate") >
      sorted.head.getAs[Double]("pos_rate"))
  }
}
