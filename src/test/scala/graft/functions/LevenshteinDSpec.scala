package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** graft_lev must agree with the builtin levenshtein on EVERY input —
  * ASCII (byte fast path), multi-byte (delegation path), empties. */
class LevenshteinDSpec extends SparkSpec {
  import spark.implicits._

  private def ref(a: String, b: String): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b))

  test("byte fast path agrees with the builtin on seeded ASCII pairs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh "
    def word() = (0 until (1 + rnd.nextInt(30))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val pairs = (0 until 500).map(_ => (word(), word()))
    pairs.foreach { case (a, b) =>
      assert(LevBytes.dist(UTF8String.fromString(a), UTF8String.fromString(b)) === ref(a, b), s"($a, $b)")
    }
  }

  test("multi-byte inputs delegate and still agree") {
    val cases = Seq(
      ("café", "cafe"), ("über", "uber"), ("日本語", "日本誤"),
      ("", ""), ("", "abc"), ("abc", ""), ("héllo wörld", "hello world"))
    cases.foreach { case (a, b) =>
      assert(LevBytes.dist(UTF8String.fromString(a), UTF8String.fromString(b)) === ref(a, b), s"($a, $b)")
    }
  }

  test("bounded band DP: exact ≤ k, capped at k+1 above, all k, incl. multi-byte") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde "
    def word() = (0 until (1 + rnd.nextInt(25))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val pairs = (0 until 300).map(_ => (word(), word())) ++
      Seq(("café", "cafe"), ("日本語です", "日本誤だ"), ("", "abcdef"), ("xyz", ""))
    for ((a, b) <- pairs; k <- Seq(0, 1, 3, 8, 50)) {
      val exact = ref(a, b)
      val got = LevBytes.distBounded(UTF8String.fromString(a), UTF8String.fromString(b), k)
      if (exact <= k) assert(got === exact, s"($a, $b, k=$k)")
      else assert(got === k + 1, s"($a, $b, k=$k): want cap ${k + 1}, got $got")
    }
  }

  test("3-arg SQL form agrees with filtered builtin semantics") {
    val df = Seq(("plum navy", "plum ivory"), ("abcdefghij", "klmnopqrst"), ("same", "same"))
      .toDF("a", "b")
      .select(expr("graft_lev(a, b, 3)").as("g"), levenshtein(col("a"), col("b")).as("l"))
    df.collect().foreach { r =>
      if (r.getInt(1) <= 3) assert(r.getInt(0) === r.getInt(1))
      else assert(r.getInt(0) === 4)
    }
  }

  test("SQL function matches builtin column-wise (codegen path)") {
    val df = Seq(("plum navy", "plum ivory"), ("a", "b"), ("same", "same"), ("日本", "日本語"))
      .toDF("a", "b")
      .select(expr("graft_lev(a, b)").as("g"), levenshtein(col("a"), col("b")).as("l"))
    assert(df.collect().forall(r => r.getInt(0) == r.getInt(1)))
    // null propagation
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(expr("graft_lev(a, b)")).collect()
    assert(n(0).isNullAt(0))
  }
}
