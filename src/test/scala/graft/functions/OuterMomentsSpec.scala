package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_outer_moments must be value-identical to the composed builtin
  * form — per group, the summed flatten-of-outer-product array plus raw
  * sums and count — which is exactly the moment algebra the q156 oracle
  * replicates in DuckDB from first principles. Any divergence would
  * break the abtt_whitening hash-match. */
class OuterMomentsSpec extends SparkSpec {

  import spark.implicits._

  private def refMoments(rows: org.apache.spark.sql.DataFrame, d: Int) =
    rows.select(col("grp"), posexplode(expr(
        s"""concat(flatten(transform(q, a -> transform(q, b -> a * b))),
           |q, array(CAST(1 AS BIGINT)))""".stripMargin))
        .as(Seq("idx", "p")))
      .groupBy(col("grp"), col("idx")).agg(sum(col("p")).as("g"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("kernel moments equal the composed explode+sum form on random groups") {
    val d = 5
    val rnd = new scala.util.Random(1712)
    val rows = (0 until 300)
      .map(i => (s"g${i % 4}", Array.fill(d)(rnd.nextLong() % 2000L)))
      .toDF("grp", "q")
    val fast = rows.groupBy(col("grp"))
      .agg(expr(s"graft_outer_moments(q, $d)").as("mom"))
      .select(col("grp"), posexplode(col("mom")).as(Seq("idx", "g")))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val ref = refMoments(rows, d)
    assert(fast.size === 4 * (d * d + d + 1))
    // explode-form cells can be absent when every contribution is
    // filtered out; here all groups are dense, so compare directly
    assert(fast === ref)
    // the count cell is the group size
    (0 until 4).foreach { g =>
      assert(fast((s"g$g", d * d + d)) === rows
        .where(col("grp") === s"g$g").count())
    }
  }

  test("serialize/deserialize round-trips partial buffers (the exchange path)") {
    val d = 8
    val rows = (0 until 4000)
      .map(i => ("all", Array.tabulate(d)(j => ((i * 31 + j * 7) % 997 - 498).toLong)))
      .toDF("grp", "q")
      .repartition(13)
    val viaExchange = rows.groupBy(col("grp"))
      .agg(expr(s"graft_outer_moments(q, $d)").as("mom"))
      .select(posexplode(col("mom")).as(Seq("idx", "g")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ref = refMoments(rows, d).map { case ((_, i), g) => i -> g }
    assert(viaExchange === ref)
  }

  test("null vectors are skipped; an all-null group yields the zero array") {
    val d = 3
    val rows = Seq(
      ("a", Some(Array(1L, 2L, 3L))),
      ("a", None),
      ("b", None))
      .toDF("grp", "q")
    val got = rows.groupBy(col("grp"))
      .agg(expr(s"graft_outer_moments(q, $d)").as("mom"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // group a: one vector counted
    val a = got("a")
    assert(a(d * d + d) === 1L)
    assert(a(0) === 1L && a(1 * d + 2) === 6L && a(d * d + 2) === 3L)
    // group b: nothing counted, zero array (not null)
    assert(got("b").forall(_ === 0L))
  }

  test("a NULL element inside a vector fails loudly (never silently reads 0)") {
    val rows = Seq(("a", Array[java.lang.Long](1L, null, 3L)))
      .toDF("grp", "q")
    val e = intercept[Exception] {
      rows.groupBy(col("grp")).agg(expr("graft_outer_moments(q, 3)")).collect()
    }
    assert(e.getMessage.contains("NULL element") ||
      (e.getCause != null && e.getCause.getMessage.contains("NULL element")))
  }

  test("wrong-dimension input fails loudly, wrong type fails analysis") {
    val rows = Seq(("a", Array(1L, 2L))).toDF("grp", "q")
    val e = intercept[Exception] {
      rows.groupBy(col("grp")).agg(expr("graft_outer_moments(q, 3)")).collect()
    }
    assert(e.getMessage != null)
    val bad = Seq(("a", "str")).toDF("grp", "q")
    intercept[Exception] {
      bad.groupBy(col("grp")).agg(expr("graft_outer_moments(q, 3)")).collect()
    }
  }
}
