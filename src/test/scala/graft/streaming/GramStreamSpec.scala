package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Online Gram / top-direction monitor: state parity with a driver
  * accumulation after every prefix, partial-state mergeability, and
  * the direction's relation to the batch q156 audit. */
class GramStreamSpec extends SparkSpec {

  import GramStream.{Vec, TopDir}
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpus: Seq[Vec] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .sortBy(_._1)
      .map { case (id, e) =>
        Vec(id, e.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray)
      }.toSeq

  private def driverState(vs: Seq[Vec]): Array[Long] =
    vs.foldLeft(GramStream.empty)((st, v) => GramStream.add(st, v.q))

  test("emitted direction equals the driver state after every prefix") {
    val vs = corpus
    val batches = Seq(vs.take(13), vs.slice(13, 31), vs.drop(31))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val query = GramStream.directions(spark, input.toDS())
      .writeStream.format("memory").queryName("gram_prefix")
      .outputMode(OutputMode.Append()).start()
    try {
      var seen = Seq.empty[Vec]
      batches.foreach { b =>
        input.addData(b); query.processAllAvailable()
        seen = seen ++ b
        val rows = spark.table("gram_prefix").as[TopDir].collect()
        val latest = rows.maxBy(_.n)
        val want = GramStream.topDir(driverState(seen))
        assert(latest.n === seen.length.toLong)
        assert(latest === want, s"after ${seen.length} vectors")
      }
    } finally query.stop()
  }

  test("partial states merge to the full state (pure additivity)") {
    val vs = corpus
    val parts = vs.grouped((vs.length + 2) / 3).toSeq
    val merged = GramStream.merge(parts.map(driverState))
    assert(merged.toSeq === driverState(vs).toSeq)
  }

  test("direction/share/trace are replica-invariant at wrap-scale n (BigInt guard)") {
    // Ingesting the corpus m times multiplies every sufficient
    // statistic by exactly m (state is additive), so the derived
    // direction, explained share, and n-scaled trace are invariant.
    // At m = 1e6 the scatter M's entries reach ~1e21 — far past 2^63 —
    // so this fails with garbage if topDir ever computes M in Longs.
    val st = driverState(corpus)
    val m = 1000000L
    val big = st.clone()
    var i = 0
    while (i < big.length) { big(i) *= m; i += 1 }
    val base = GramStream.topDir(st)
    val rep = GramStream.topDir(big)
    assert(rep.n === base.n * m)
    assert(rep.v === base.v)
    assert(rep.trace === base.trace)
    assert(rep.explained_ppm === base.explained_ppm)
    assert(rep.explained_ppm >= 0 && rep.explained_ppm <= 1000000L)
  }

  test("trace and explained share are sane and direction is stable under order") {
    val vs = corpus
    val a = GramStream.topDir(driverState(vs))
    val b = GramStream.topDir(driverState(scala.util.Random.shuffle(vs)))
    // sufficient statistics are order-free, so the derived direction
    // and share are EXACTLY order-independent
    assert(a === b)
    assert(a.trace > 0 && a.explained_ppm >= 0 && a.explained_ppm <= 1000000L)
  }
}
