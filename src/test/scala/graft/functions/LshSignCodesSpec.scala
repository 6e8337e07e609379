package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native LSH signature kernel must agree bit-for-bit with the
  * composable when(graft_dot(v, plane) > 0, 1 << i) form it replaces
  * (same md5-parity planes, same strict > 0 sign convention), and keep
  * the documented null semantics. */
class LshSignCodesSpec extends SparkSpec {
  import spark.implicits._

  private val seed = 1000
  private val tables = 4
  private val planes = 5
  private val dim = 8

  private def planeComp(j: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if ("13579bdf".contains(hex.charAt(0))) 1.0 else -1.0
  }

  private def referenceCodes(v: Seq[Double]): Seq[Int] =
    (0 until tables).map { t =>
      (0 until planes).map { i =>
        val d = v.indices.map(k => v(k) * planeComp(seed + t * planes + i, k)).sum
        if (d > 0) 1 << i else 0
      }.sum
    }

  // deterministic pseudo-random test vectors
  private def vec(row: Int): Seq[Double] =
    (0 until dim).map(d => math.sin(row * 37 + d * 11).toDouble)

  test("kernel codes equal the scala reference on well-formed vectors") {
    val rows = (0 until 50).map(vec)
    val got = rows.toDF("v")
      .select(expr(s"graft_lsh_codes(v, $seed, $tables, $planes, $dim)").as("codes"))
      .as[Seq[Int]].collect()
    rows.zip(got).foreach { case (v, codes) =>
      assert(codes == referenceCodes(v), s"mismatch for $v")
    }
  }

  test("kernel matches interpreted eval (nullSafeEval) too") {
    // force the interpreted path by eval'ing the expression directly
    val e = LshSignCodes(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vec(7), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      seed, tables, planes, dim)
    val out = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.toIntArray().toSeq == referenceCodes(vec(7)))
  }

  test("null vector, wrong length, and null element give null") {
    val df = Seq(
      (1, Some(vec(1))),
      (2, None),
      (3, Some(Seq(1.0, 2.0))), // wrong length
    ).toDF("id", "v")
      .select(col("id"), expr(s"graft_lsh_codes(v, $seed, $tables, $planes, $dim)").as("codes"))
    val got = df.orderBy("id").collect()
    assert(got(0).get(1) != null)
    assert(got(1).get(1) == null)
    assert(got(2).get(1) == null)
    val withNullElem = spark.sql(
      s"SELECT graft_lsh_codes(array(${(1 to dim).map(i => if (i == 3) "CAST(NULL AS DOUBLE)" else s"$i.0D").mkString(",")}), $seed, $tables, $planes, $dim) AS c")
    assert(withNullElem.collect()(0).get(0) == null)
  }
}
