package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Online centroid maintenance: assignment parity with the batch
  * rounded-argmax rule, and exact equality of the final streamed
  * centroids with a one-step Lloyd update over all vectors seen —
  * regardless of how the stream was split into micro-batches. */
class CentroidStreamSpec extends SparkSpec {

  import CentroidStream._
  import spark.implicits._

  // two reference centroids on the axes; integer-valued vectors keep
  // every sum exact, so stream-vs-batch equality is bitwise
  private val refs = Seq(Centroid(0, Seq(1.0, 0.0)), Centroid(1, Seq(0.0, 1.0)))

  private val allVecs = Seq(
    Vec(1L, Seq(4.0, 1.0)), Vec(2L, Seq(3.0, 0.0)), Vec(3L, Seq(1.0, 5.0)),
    Vec(4L, Seq(0.0, 2.0)), Vec(5L, Seq(6.0, 2.0)), Vec(6L, Seq(2.0, 9.0)))

  private def runStream(batches: Seq[Seq[Vec]]): Map[Int, (Long, Seq[Double])] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val query = updates(spark, input.toDS(), refs)
      .writeStream.format("memory").queryName("centroids")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      // last emission per cell is the current centroid
      spark.table("centroids").as[CellUpdate].collect()
        .groupBy(_.cell).map { case (c, ups) =>
          val last = ups.maxBy(_.n)
          c -> ((last.n, last.centroid))
        }
    } finally query.stop()
  }

  private def lloydStep(vecs: Seq[Vec]): Map[Int, (Long, Seq[Double])] =
    vecs.groupBy(v => assignCell(v.v, refs)).map { case (c, vs) =>
      val sums = vs.map(_.v).reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
      c -> ((vs.length.toLong, sums.map(x => math.floor(x / vs.length * 1e6 + 0.5) / 1e6)))
    }

  test("assignment follows the rounded-cosine argmax with lowest-cell ties") {
    assert(assignCell(Seq(4.0, 1.0), refs) === 0)
    assert(assignCell(Seq(1.0, 5.0), refs) === 1)
    // exact diagonal: equal similarity to both → lowest cell id wins
    assert(assignCell(Seq(3.0, 3.0), refs) === 0)
  }

  test("final streamed centroids equal the one-step Lloyd update, any batch split") {
    val expected = lloydStep(allVecs)
    val splits = Seq(
      Seq(allVecs),                                  // one batch
      allVecs.grouped(2).toSeq,                      // three batches
      Seq(allVecs.take(1), allVecs.drop(1)))         // skewed split
    splits.foreach { batches =>
      assert(runStream(batches) === expected, s"split sizes ${batches.map(_.size)}")
    }
  }

  test("every micro-batch emits refreshed means for exactly the touched cells") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val query = updates(spark, input.toDS(), refs)
      .writeStream.format("memory").queryName("centroids_inc")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq(Vec(1L, Seq(4.0, 1.0)))); query.processAllAvailable()
      val afterFirst = spark.table("centroids_inc").as[CellUpdate].collect()
      assert(afterFirst.toSeq === Seq(CellUpdate(0, 1L, Seq(4.0, 1.0))))
      input.addData(Seq(Vec(2L, Seq(2.0, 1.0)))); query.processAllAvailable()
      val afterSecond = spark.table("centroids_inc").as[CellUpdate].collect()
      // cell 0 re-emitted with the running mean; cell 1 never touched
      assert(afterSecond.count(_.cell == 0) === 2)
      assert(afterSecond.filter(_.cell == 0).maxBy(_.n) ===
        CellUpdate(0, 2L, Seq(3.0, 1.0)))
      assert(!afterSecond.exists(_.cell == 1))
    } finally query.stop()
  }
}
