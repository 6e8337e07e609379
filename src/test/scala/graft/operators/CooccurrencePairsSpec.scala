package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q68's pair generation is a linear HOF pass over the token array
  * (3 offsets per position) — this spec proves it emits exactly the
  * same pair MULTISET as the reference formulation (a positional
  * self-join with 1 ≤ Δpos ≤ 3), which is what the DuckDB oracle runs.
  * The HOF form is the scale path; the join form is the spec-only
  * ground truth (|doc|² comparisons per doc inside each join group).
  */
class CooccurrencePairsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("linear HOF pair generation equals the positional self-join") {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val hof = toks.select(explode(expr(
      """filter(flatten(transform(sequence(1, 3), d ->
        |  transform(sequence(0, size(t) - 1), i ->
        |    CASE WHEN i + d <= size(t) - 1 AND t[i] <> t[i + d] THEN
        |      struct(least(t[i], t[i + d]) AS w1, greatest(t[i], t[i + d]) AS w2)
        |    ELSE NULL END))), p -> p IS NOT NULL)""".stripMargin)).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
    val positions = toks
      .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "tok")))
    val joined = positions.as("a")
      .join(positions.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") - col("a.pos") >= 1 && col("b.pos") - col("a.pos") <= 3 &&
          col("a.tok") =!= col("b.tok"))
      .select(least(col("a.tok"), col("b.tok")).as("w1"),
        greatest(col("a.tok"), col("b.tok")).as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
    val diff = hof.unionByName(joined).groupBy(col("w1"), col("w2"), col("n"))
      .agg(count(lit(1)).as("sides"))
      .filter(col("sides") =!= 2)
    assert(diff.count() === 0, "pair multisets differ between HOF and join forms")
    assert(hof.count() > 0)
  }
}
