package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property coverage for the sorted-run array kernels behind q56/q70:
  * on random token arrays, the single-pass expressions must equal the
  * naive multiset definitions (max multiplicity; total occurrences of
  * elements appearing ≥ 2 times). Style: seeded-random properties like
  * DeckTypeSpec. */
class RunStatsPropertySpec extends SparkSpec {

  import spark.implicits._

  // mirror CorpusQueries.maxRun/dupOcc (private there; the EXPRESSION
  // text is the contract under test, so restate it verbatim)
  private def maxRun(arr: String) = expr(
    s"""aggregate(array_sort($arr),
       |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
       |  (acc, x) -> named_struct(
       |    'prev', x,
       |    'run', IF(x <=> acc.prev, acc.run + 1L, 1L),
       |    'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L))),
       |  acc -> acc.best)""".stripMargin)

  private def dupOcc(arr: String) = expr(
    s"""aggregate(array_sort($arr),
       |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'dup', 0L),
       |  (acc, x) -> named_struct(
       |    'prev', x,
       |    'run', IF(x <=> acc.prev, acc.run + 1L, 1L),
       |    'dup', acc.dup + IF(x <=> acc.prev, 0L, IF(acc.run >= 2L, acc.run, 0L))),
       |  acc -> acc.dup + IF(acc.run >= 2L, acc.run, 0L))""".stripMargin)

  test("sorted-run kernels equal the naive multiset stats on 300 random arrays") {
    val rnd = new scala.util.Random(1234)
    // small alphabet forces heavy multiplicity; include duplicates-only
    // and all-distinct shapes
    val cases = (0 until 300).map { i =>
      val alpha = 1 + rnd.nextInt(6)
      val len = 1 + rnd.nextInt(40)
      (i.toLong, (0 until len).map(_ => s"t${rnd.nextInt(alpha)}"))
    } :+ (300L, Seq("only")) :+ (301L, Seq("a", "a", "a", "a")) :+
      (302L, Seq("x", "y", "z"))
    val got = cases.toDF("id", "toks")
      .select(col("id"), maxRun("toks").as("mr"), dupOcc("toks").as("du"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    cases.foreach { case (id, toks) =>
      val counts = toks.groupBy(identity).map(_._2.size.toLong)
      val wantMax = counts.max
      val wantDup = counts.filter(_ >= 2L).sum
      assert(got(id) === ((wantMax, wantDup)),
        s"id=$id toks=$toks: want ($wantMax, $wantDup), got ${got(id)}")
    }
  }
}
