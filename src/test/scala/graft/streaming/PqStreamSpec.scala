package graft.streaming

import graft.SparkSpec
import graft.operators.PqQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Online PQ encoding: parity of the per-row Scala argmin with the
  * batch expression kernel, and micro-batch encoding against a
  * codebook trained by the batch trainer. */
class PqStreamSpec extends SparkSpec {

  import PqStream.{Encoded, VecI}
  import spark.implicits._

  // 4-dim vectors, 2 subspaces of 2; train on a small planted corpus
  private val trainVecs = Seq(
    (0L, Seq(0L, 0L, 10L, 10L)),
    (1L, Seq(10L, 0L, 0L, 0L)),
    (2L, Seq(0L, 2L, 10L, 8L)),
    (3L, Seq(9L, 1L, 1L, 0L)),
    (4L, Seq(0L, 1L, 9L, 9L)),
  )
  private lazy val codebook = PqQueries.trainCodebook(
    trainVecs.toDF("vec_id", "v"), m = 2, subDim = 2, k = 2, iters = 2)

  test("per-row encodeOne equals the batch encoded() on the trained codebook") {
    val batch = PqQueries.encoded(trainVecs.toDF("vec_id", "v"), codebook, subDim = 2)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
    trainVecs.foreach { case (id, v) =>
      val (codes, err) = PqStream.encodeOne(v.toIndexedSeq, codebook, subDim = 2)
      assert((codes, err) === batch(id), s"vec $id")
    }
  }

  test("ties pick the lowest code in both kernels") {
    // two identical codebook entries force a tie in every subspace
    val cb: Array[Array[Array[Long]]] =
      Array(Array(Array(5L, 5L), Array(5L, 5L)))
    val (codes, err) = PqStream.encodeOne(IndexedSeq(4L, 6L), cb, subDim = 2)
    assert(codes === Seq(0) && err === 2L)
    val batch = PqQueries.encoded(
      Seq((7L, Seq(4L, 6L))).toDF("vec_id", "v"), cb, subDim = 2)
      .collect().head
    assert(batch.getSeq[Int](1) === Seq(0) && batch.getLong(2) === 2L)
  }

  test("micro-batch encoding matches the batch kernel across batches") {
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq(VecI(10L, Seq(1L, 1L, 9L, 9L)), VecI(11L, Seq(8L, 0L, 2L, 1L))),
      Seq(VecI(12L, Seq(0L, 0L, 0L, 0L))))
    val input = MemoryStream[VecI]
    val query = PqStream.encode(spark, input.toDS(), codebook, subDim = 2)
      .writeStream.format("memory").queryName("pqstream")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      val got = spark.table("pqstream").as[Encoded].collect()
        .map(e => e.vec_id -> ((e.codes, e.qerr))).toMap
      val expect = PqQueries.encoded(
        batches.flatten.map(x => (x.vec_id, x.v)).toDF("vec_id", "v"),
        codebook, subDim = 2)
        .collect().map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
      assert(got === expect)
    } finally query.stop()
  }
}
