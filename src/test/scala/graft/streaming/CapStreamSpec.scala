package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Online token-budget admission: verdict parity with a plain
  * arrival-order fold, cross-batch state carry, no retroactivity,
  * budget never exceeded. */
class CapStreamSpec extends SparkSpec {

  import CapStream.{Doc, Verdict}
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val Budget = 400L

  private def corpus: Seq[Doc] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long"))
      .as[(Long, String, Long)].collect()
      .sortBy(_._1).map { case (id, s, n) => Doc(id, s, n) }.toSeq

  /** Reference: fold the batched arrival order (within a batch,
    * doc_id order per source — the stream's documented tiebreak). */
  private def reference(batches: Seq[Seq[Doc]]): Map[Long, (Boolean, Long)] = {
    val cum = scala.collection.mutable.Map.empty[String, Long]
    val out = scala.collection.mutable.Map.empty[Long, (Boolean, Long)]
    batches.foreach { b =>
      b.groupBy(_.source).foreach { case (src, ds) =>
        ds.sortBy(_.doc_id).foreach { d =>
          val c = cum.getOrElse(src, 0L)
          val admit = c + d.n_tokens <= Budget
          if (admit) cum(src) = c + d.n_tokens
          out(d.doc_id) = (admit, cum.getOrElse(src, 0L))
        }
      }
    }
    out.toMap
  }

  private def runStream(batches: Seq[Seq[Doc]], name: String): Map[Long, (Boolean, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = CapStream.verdicts(spark, input.toDS(), Budget)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      spark.table(name).as[Verdict].collect()
        .map(v => v.doc_id -> (v.admitted, v.cum_tokens)).toMap
    } finally query.stop()
  }

  test("verdicts equal the arrival-order fold over a multi-batch run") {
    val docs = corpus
    val batches = Seq(docs.take(9), docs.slice(9, 23), docs.drop(23))
    val got = runStream(batches, "cap_fold")
    val want = reference(batches)
    assert(got.keySet === want.keySet)
    // compare admit flags exactly; cum snapshots too (same walk)
    got.foreach { case (id, v) => assert(v === want(id), s"doc $id") }
    // budget must genuinely bind somewhere and admit somewhere
    val admits = got.values.map(_._1)
    assert(admits.exists(identity) && admits.exists(!_), "budget must split the stream")
  }

  test("state carries across batch boundaries: same order, same verdicts") {
    val docs = corpus
    val one = runStream(Seq(docs), "cap_one")
    val many = runStream(docs.grouped(7).toSeq, "cap_many")
    // arrival order within each source is doc_id-ascending in both
    // splits (corpus is pre-sorted), so verdicts must be identical
    assert(one.view.mapValues(_._1).toMap === many.view.mapValues(_._1).toMap)
  }

  test("rejection is permanent and the budget is never exceeded") {
    val docs = corpus
    val got = runStream(Seq(docs.take(30), docs.drop(30), docs.take(30)), "cap_perm")
    // re-ingesting the first 30 docs re-emits verdicts; every admitted
    // cum snapshot stays within budget
    got.values.foreach { case (_, cum) => assert(cum <= Budget) }
  }
}
