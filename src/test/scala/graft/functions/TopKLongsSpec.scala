package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_topk (bounded top-k BIGINT aggregate): agreement with the
  * row_number window form it replaces, buffer mechanics, and the
  * packed-ordering contract q157 relies on. */
class TopKLongsSpec extends SparkSpec {

  test("agrees with the row_number window selection on seeded random longs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map(_ => (rnd.nextInt(37).toLong, rnd.nextLong()))
    val df = rows.toDF("g", "v")
    val agg = df.groupBy(col("g"))
      .agg(expr("graft_topk(v, 7)").as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted(Ordering[Long].reverse).take(7)
    }
    assert(agg === expected)
  }

  test("groups smaller than k emit all values, descending") {
    import spark.implicits._
    val df = Seq((1L, 5L), (1L, 9L), (1L, 1L)).toDF("g", "v")
    val got = df.groupBy(col("g")).agg(expr("graft_topk(v, 10)").as("top"))
      .head().getSeq[Long](1).toSeq
    assert(got === Seq(9L, 5L, 1L))
  }

  test("buffer: insert/merge/serialize round-trip keeps exactly the top k") {
    val b = new TopKLongs.Buf(3)
    Seq(5L, -2L, 9L, 9L, 1L, 7L, Long.MinValue, Long.MaxValue).foreach(b.insert)
    assert(b.sortedDesc.toSeq === Seq(Long.MaxValue, 9L, 9L))
    val agg = TopKLongs(org.apache.spark.sql.catalyst.expressions.Literal(1L), 3)
    val round = agg.deserialize(agg.serialize(b))
    assert(round.sortedDesc.toSeq === b.sortedDesc.toSeq)
    val other = new TopKLongs.Buf(3)
    Seq(10L, 8L).foreach(other.insert)
    agg.merge(b, other)
    assert(b.sortedDesc.toSeq === Seq(Long.MaxValue, 10L, 9L))
  }

  test("the q157 packing preserves (sim DESC, bid ASC) as one long comparison") {
    val bits = 42
    val mask = (1L << bits) - 1
    def pack(simUnits: Long, bid: Long): Long =
      (simUnits + 1000000L) * (1L << bits) + (mask - bid)
    // higher sim wins regardless of id; equal sim → smaller id wins
    assert(pack(999999L, 5L) > pack(999998L, 1L))
    assert(pack(-1000000L, 1L) < pack(-999999L, 99L))
    assert(pack(0L, 3L) > pack(0L, 4L))
    // unpack recovers the id across the documented bound
    Seq(0L, 1L, 990001999L, mask).foreach { bid =>
      assert(mask - (pack(123L, bid) % (1L << bits)) === bid)
    }
  }
}
