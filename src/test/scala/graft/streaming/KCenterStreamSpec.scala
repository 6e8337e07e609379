package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming doubling k-center: settled state replays the offer rule
  * exactly, the bounded-state and coverage invariants hold over the
  * whole stream, and the centers-of-centers merge composes. */
class KCenterStreamSpec extends SparkSpec {

  import KCenterStream.{Vec, Coreset}
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpus: Seq[Vec] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .sortBy(_._1)
      .map { case (id, e) =>
        Vec(id, e.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray)
      }.toSeq

  private def replay(batches: Seq[Seq[Vec]]): (List[Vec], Long) =
    batches.foldLeft((List.empty[Vec], 0L)) { (st, b) =>
      b.sortBy(_.vec_id).foldLeft(st)(KCenterStream.offer)
    }

  test("settled coreset equals a driver replay of the offer rule") {
    val vs = corpus
    val batches = Seq(vs.take(11), vs.slice(11, 30), vs.drop(30))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val query = KCenterStream.coresets(spark, input.toDS())
      .writeStream.format("memory").queryName("kc_replay")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      val rows = spark.table("kc_replay")
        .withColumn("ord", monotonically_increasing_id())
        .as[(Long, Seq[Long], Long)].collect()
      val last = rows.maxBy(_._3)
      val want = replay(batches)
      assert(last._1 === want._2)
      assert(last._2.toList === want._1.map(_.vec_id).sorted)
      assert(last._2.length <= KCenterStream.K)
    } finally query.stop()
  }

  test("coverage: every streamed vector sits within 2R of some center") {
    val vs = corpus
    val (centers, r2) = replay(Seq(vs))
    assert(centers.nonEmpty && centers.length <= KCenterStream.K)
    vs.foreach { v =>
      val d2min = centers.map(c => KCenterStream.d2(c.q, v.q)).min
      // d <= 2R  =>  d^2 <= 4 r2 (the doubling algorithm's coverage)
      assert(d2min <= 4 * r2, s"vec ${v.vec_id}: $d2min > 4*$r2")
    }
  }

  test("stream radius is within the 8-approximation of the batch greedy objective") {
    val vs = corpus
    val (_, r2) = replay(Seq(vs))
    // batch greedy (q155's rule) objective after K centers
    val byId = vs.map(v => v.vec_id -> v.q).toMap
    var centers = List(vs.head.vec_id)
    val mind = scala.collection.mutable.Map(vs.map(v => v.vec_id -> Long.MaxValue): _*)
    var obj = 0L
    for (_ <- 2 to KCenterStream.K) {
      val c = byId(centers.head)
      vs.foreach(v => mind(v.vec_id) = math.min(mind(v.vec_id), KCenterStream.d2(v.q, c)))
      val (nid, nd) = vs.map(v => (v.vec_id, mind(v.vec_id)))
        .maxBy { case (id, d) => (d, -id) }
      centers = nid :: centers; obj = nd
    }
    // doubling maintains R <= 8*opt, and greedy obj >= opt, so the
    // stream threshold R^2 is within 64x of the greedy objective
    assert(r2 <= 64L * obj || obj == 0L,
      s"stream r2=$r2 vs 64*greedy=${64L * obj} — approximation bound broken")
  }

  test("centers-of-centers merge keeps the coverage invariant") {
    val vs = corpus
    val parts = vs.grouped((vs.length + 3) / 4).toSeq
    val partial = parts.map(p => replay(Seq(p)))
    val (centers, r2) = KCenterStream.merge(partial)
    assert(centers.length <= KCenterStream.K * 2,
      "merged state must stay near-K (doubling may briefly hold more)")
    vs.foreach { v =>
      val d2min = centers.map(c => KCenterStream.d2(c.q, v.q)).min
      // two composition hops: part coverage 2R_p then merge coverage
      // 2R_m on the partial centers => total <= 4R_m in the worst case
      assert(d2min <= 16 * r2, s"vec ${v.vec_id} uncovered after merge")
    }
  }
}
