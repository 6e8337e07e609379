package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_minhash_hex must be value-identical to the composed builtin
  * form — per group and key h, `min(md5(h || ':' || s))` — which is
  * exactly what the q135 oracle replicates in DuckDB. Any divergence
  * would break the src_minhash_sigs hash-match. */
class MinHashHexSpec extends SparkSpec {

  import spark.implicits._

  test("64-slot group minima equal the builtin min-of-md5 chain on random groups") {
    val rnd = new scala.util.Random(431)
    val alphabet = "abcdefgh XYZ09_#é日"
    def word() = (0 until (1 + rnd.nextInt(40)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val rows = (0 until 400).map(i => (s"g${i % 7}", word()))
      .toDF("grp", "s")
    val fast = rows.groupBy(col("grp"))
      .agg(expr("graft_minhash_hex(s, 64)").as("mhx"))
      .select(col("grp"), posexplode(col("mhx")).as(Seq("h", "m")))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    val ref = rows
      .select(col("grp"), posexplode(expr("graft_md5_keyed(s, 64)")).as(Seq("h", "hv")))
      .groupBy(col("grp"), col("h")).agg(min(col("hv")).as("m"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(fast.size === 7 * 64)
    assert(fast === ref)
    // and against the raw builtin concat form for a sample of keys —
    // three independent derivations of the same permutation family
    val raw = rows
      .select(col("grp"), md5(concat(lit("13"), lit(":"), col("s"))).as("hv"))
      .groupBy(col("grp")).agg(min(col("hv")).as("m"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    raw.foreach { case (g, m) => assert(fast((g, 13)) === m) }
  }

  test("serialize/deserialize round-trips partial buffers (the exchange path)") {
    // single-group aggregate over enough rows to force map-side
    // partials across several input partitions
    val rows = (0 until 5000).map(i => ("all", s"w$i")).toDF("grp", "s")
      .repartition(13)
    val viaExchange = rows.groupBy(col("grp"))
      .agg(expr("graft_minhash_hex(s, 8)").as("mhx"))
      .select(posexplode(col("mhx")).as(Seq("h", "m")))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val ref = rows
      .select(posexplode(expr("graft_md5_keyed(s, 8)")).as(Seq("h", "hv")))
      .groupBy(col("h")).agg(min(col("hv")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(viaExchange === ref)
  }

  test("nulls are ignored; an all-null group yields null (min's contract)") {
    val rows = Seq(("a", Some("x")), ("a", None), ("b", None))
      .toDF("grp", "s")
    val got = rows.groupBy(col("grp"))
      .agg(expr("graft_minhash_hex(s, 4)").as("mhx"))
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(got === Map("a" -> false, "b" -> true))
  }

  test("key count is validated; non-literal count raises a clean analysis error") {
    val e = intercept[Exception](
      spark.sql("SELECT graft_minhash_hex(s, 65) FROM VALUES ('x') AS t(s) GROUP BY s").collect())
    assert(e.getMessage.toLowerCase.contains("key count") ||
      e.getMessage.toLowerCase.contains("[1, 64]"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", 4)).toDF("s", "k")
        .groupBy(col("s")).agg(expr("graft_minhash_hex(s, k)")).collect()
    }
    assert(e2.getMessage.contains("graft_minhash_hex"), e2.getMessage)
    assert(e2.getMessage.contains("foldable"), e2.getMessage)
  }
}
