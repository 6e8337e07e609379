package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductDSpec extends SparkSpec {

  test("graft_dot is registered via GraftExtensions and matches the HOF form bit-for-bit") {
    import spark.implicits._
    assert(spark.catalog.functionExists("graft_dot"))
    val vecs = (0 until 200).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("id", "a", "b")
    val both = vecs.select(
      expr("graft_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("hof"))
    // bit-for-bit: both fold left-to-right in index order
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("graft_dot null semantics match the HOF form: mismatch and null input -> null") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))), // 11
      (None, Some(Seq(1.0))), // null input -> null
      (Some(Seq(1.0, 2.0, 5.0)), Some(Seq(2.0))), // length mismatch -> null (zip_with pads null)
    ).toDF("a", "b")
    val out = df.select(expr("graft_dot(a, b)")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq === Seq(Some(11.0), None, None))
  }

  test("FuseDotProduct rewrites the HOF pattern into graft_dot in the optimized plan") {
    // parquet-backed input so ConvertToLocalRelation can't pre-evaluate
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .selectExpr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, w) -> acc + w) AS d")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"no fusion in:\n$optimized")
    // fused result equals the unfused (rule-bypassing) computation
    val fused = df.collect().map(_.getDouble(0))
    import spark.implicits._
    val seqs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .as[Seq[Double]].collect()
    val expected = seqs.map(v => v.foldLeft(0.0)((acc, x) => acc + x * x))
    assert(fused.toSeq === expected.toSeq)
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = Literal.create(ArrayData.toArrayData(Array(1.5, -2.0, 3.0)), ArrayType(DoubleType))
    val b = Literal.create(ArrayData.toArrayData(Array(2.0, 4.0, 0.5)), ArrayType(DoubleType))
    val v = DotProductD(a, b).eval(null)
    assert(v === (1.5 * 2.0 + -2.0 * 4.0 + 3.0 * 0.5))
  }
}
