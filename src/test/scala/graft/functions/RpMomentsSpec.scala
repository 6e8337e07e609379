package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_rp_moments must be value-identical to the composed relational
  * form q119 used before the kernel — posexplode → md5-sign join → two
  * grouped integer sums — which is exactly the derivation the q119
  * oracle still runs in DuckDB. Any divergence (sign matrix, floor
  * quantization, null handling) would break the q119 hash-match. */
class RpMomentsSpec extends SparkSpec {

  import spark.implicits._

  private val K = 16
  private val D = 64
  private val Q = 64

  /** The pre-kernel composed form: (vec_id, p2, c2) via explode+join. */
  private def composed(rows: org.apache.spark.sql.DataFrame) = {
    val signs = spark.range(D.toLong * K)
      .select(expr(s"id div $K").as("j"), (col("id") % K).as("k"))
      .withColumn("sgn",
        when(substring(md5(concat_ws(":", lit("rp"), col("j").cast("string"),
          col("k").cast("string"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1L).otherwise(-1L))
    val codes = rows
      .select(col("vec_id"), posexplode(col("v")).as(Seq("j", "x")))
      .select(col("vec_id"), col("j").cast("long").as("j"),
        floor(col("x").cast("double") * Q + lit(0.5)).cast("long").as("code"))
    val p2 = codes.join(broadcast(signs), Seq("j"))
      .groupBy(col("vec_id"), col("k"))
      .agg(sum(col("code") * col("sgn")).as("p"))
      .groupBy(col("vec_id")).agg(sum(col("p") * col("p")).as("p2"))
    val c2 = codes.groupBy(col("vec_id"))
      .agg(sum(col("code") * col("code")).as("c2"))
    c2.join(p2, Seq("vec_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1))).toMap
  }

  private def viaKernel(rows: org.apache.spark.sql.DataFrame) = rows
    .select(col("vec_id"),
      expr(s"graft_rp_moments(v, $K, $D, $Q)").as("pm"))
    .collect()
    .map(r => r.getLong(0) -> {
      val a = r.getSeq[Long](1); (a(0), a(1))
    }).toMap

  test("kernel == composed explode+sign-join form on random double vectors") {
    val rnd = new scala.util.Random(119)
    val rows = (0L until 200L)
      .map(i => (i, Array.fill(D)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "v")
    assert(viaKernel(rows) === composed(rows))
  }

  test("float input agrees with the cast-to-double path (embeddings are float)") {
    val rnd = new scala.util.Random(911)
    val f = (0L until 100L)
      .map(i => (i, Array.fill(D)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "v")
    val d = f.select(col("vec_id"),
      expr("transform(v, x -> CAST(x AS DOUBLE))").as("v"))
    assert(viaKernel(f) === viaKernel(d))
    assert(viaKernel(f) === composed(d))
  }

  test("null elements are skipped like SQL sum; all-zero gives p2 = c2 = 0") {
    val rows = Seq(
      (1L, Array[java.lang.Double](0.5, null, -0.25) ++ Array.fill[java.lang.Double](D - 3)(0.0)),
      (2L, Array.fill[java.lang.Double](D)(0.0)))
      .toDF("vec_id", "v")
    val k = viaKernel(rows)
    // vec 1 must match the composed form (null x → null code → skipped)
    val c = composed(rows)
    assert(k(1L) === c(1L))
    // all-zero vector: exact zeros, no NULL poisoning
    assert(k(2L) === ((0L, 0L)))
  }

  test("short and long vectors: c2 sums every element, p only j < dim") {
    val rows = Seq(
      (1L, Array.fill(10)(0.5)),          // shorter than dim
      (2L, Array.fill(D + 8)(0.5)))       // longer: tail feeds c2 only
      .toDF("vec_id", "v")
    val k = viaKernel(rows)
    val c = composed(rows) // the sign join naturally drops j >= dim
    assert(k(1L) === c(1L))
    assert(k(2L) === c(2L))
  }

  test("null vector yields null; wrong element type fails analysis") {
    val rows = Seq((1L, Option.empty[Array[Double]])).toDF("vec_id", "v")
    val got = rows.select(expr(s"graft_rp_moments(v, $K, $D, $Q)")).collect()
    assert(got.head.isNullAt(0))
    val bad = Seq((1L, Array("a", "b"))).toDF("vec_id", "v")
    intercept[Exception] {
      bad.select(expr(s"graft_rp_moments(v, $K, $D, $Q)")).collect()
    }
  }
}
