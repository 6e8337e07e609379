package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `graft_log2q20` — the Q20 fixed-point binary log kernel: accuracy
  * against libm log2 on a wide grid, exactness on dyadic ratios,
  * monotonicity, and SQL registration. (The DuckDB cteChain twin is
  * proven equal by q163's oracle hash gate every verify run.) */
class Log2Q20Spec extends SparkSpec {

  import spark.implicits._

  private def grid: Seq[(Long, Long)] = {
    val nums = Seq(1L, 2L, 3L, 5L, 7L, 17L, 63L, 64L, 65L, 999L, 1000L,
      12345L, 1048575L, 1048576L, 1048577L, 999999999999L,
      (1L << 61) - 1, 1L << 61, (1L << 61) + 12345L)
    val dens = Seq(1L, 2L, 3L, 7L, 16L, 31L, 997L, 1048576L)
    for { n <- nums; d <- dens; if d <= n } yield (n, d)
  }

  test("within 2^-19 of libm log2 across the grid") {
    grid.foreach { case (n, d) =>
      val got = Log2Kernel.q20(n, d).toDouble / (1L << 20)
      val want = math.log(n.toDouble / d.toDouble) / math.log(2.0)
      assert(math.abs(got - want) < 1.9e-6, s"$n/$d: got=$got want=$want")
    }
  }

  test("dyadic ratios are exact") {
    (0 to 61).foreach { e =>
      assert(Log2Kernel.q20(1L << e, 1L) === e.toLong << 20, s"2^$e")
    }
    assert(Log2Kernel.q20(12288L, 3L) === 12L << 20) // 3*2^12 / 3
    assert(Log2Kernel.q20(7L, 7L) === 0L)
  }

  test("never decreasing in num, never increasing in den") {
    val byNum = (1L to 4096L).map(Log2Kernel.q20(_, 1L))
    assert(byNum === byNum.sorted)
    val byDen = (1L to 999L).map(Log2Kernel.q20(1000000L, _))
    assert(byDen === byDen.sorted.reverse)
  }

  test("contract is enforced: out-of-domain inputs yield NULL, not a hang or garbage") {
    // den <= 0 used to spin the exponent loop forever; num < den used to
    // return garbage via a negative remainder — the expression now
    // nullifies anything outside 1 <= den <= num < 2^62 (both the
    // interpreted and codegen paths)
    val bad = Seq((5L, 0L), (5L, -3L), (3L, 7L), (0L, 1L), (-8L, 2L),
      (1L << 62, 1L), (Long.MaxValue, 2L))
    val rows = bad.toDF("num", "den")
      .selectExpr("graft_log2q20(num, den) AS r").collect()
    assert(rows.forall(_.isNullAt(0)), "every out-of-contract input must be NULL")
    // boundary values stay in-domain
    val ok = Seq((1L, 1L), ((1L << 62) - 1, 1L), (7L, 7L)).toDF("num", "den")
      .selectExpr("graft_log2q20(num, den) AS r").collect()
    assert(ok.forall(!_.isNullAt(0)))
  }

  test("native expression equals the scalar kernel through codegen") {
    val viaSql = grid.toDF("num", "den")
      .selectExpr("graft_log2q20(num, den)").collect().map(_.getLong(0)).toSeq
    assert(viaSql === grid.map { case (n, d) => Log2Kernel.q20(n, d) })
  }

  test("graft_log2q20 is callable from SQL and null-safe") {
    assert(spark.sql("SELECT graft_log2q20(3L, 2L) AS v").head().getLong(0) === 613377L)
    assert(spark.sql("SELECT graft_log2q20(CAST(NULL AS BIGINT), 2L) AS v").head().isNullAt(0))
  }

  test("cteChain emits one linear single-reference chain per pair") {
    val sql = Log2Kernel.cteChain("src", "lg", Seq(("a", "n1", "d1"), ("b", "n2", "d2")))
    assert(sql.contains("lg_s20"))
    assert(sql.contains("a_q20") && sql.contains("b_q20"))
    // every intermediate CTE is consumed exactly once
    (0 to 19).foreach { i =>
      assert(sql.split(s"FROM lg_s$i\\b").length === 2, s"lg_s$i referenced once")
    }
  }
}
