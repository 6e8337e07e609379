package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Star-contraction CC ([[ConnectedComponents.runStars]]) vs the
  * min-label baseline ([[ConnectedComponents.run]]): identical labels on
  * shallow graphs, and convergence in O(log n) rounds on a deep chain
  * where min-label propagation hits its round cap and (since round 4)
  * throws instead of returning partial labels.
  */
class StarContractionSpec extends SparkSpec {

  import spark.implicits._

  private def nodesDf(ids: Seq[Long]): DataFrame = ids.toDF("id")
  private def edgesDf(es: Seq[(Long, Long)]): DataFrame = es.toDF("src", "dst")

  private def labels(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("runStars matches run on a mixed graph (cliques + chain + singletons)") {
    val clique1 = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val clique2 = for (a <- 20L to 24L; b <- 20L to 24L if a < b) yield (a, b)
    val chain = (30L until 36L).map(i => (i, i + 1))
    val nodes = nodesDf((10L to 13L) ++ (20L to 24L) ++ (30L to 36L) ++ Seq(99L, 100L))
    val edges = edgesDf(clique1 ++ clique2 ++ chain)
    val expected = labels(ConnectedComponents.run(nodes, edges))
    val got = labels(ConnectedComponents.runStars(nodes, edges))
    assert(got === expected)
    assert(got(13L) === 10L && got(24L) === 20L && got(36L) === 30L)
    assert(got(99L) === 99L && got(100L) === 100L)
  }

  test("runStars handles reversed/duplicated/self edge input like run") {
    val nodes = nodesDf(1L to 6L)
    val edges = edgesDf(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L), (5L, 4L), (4L, 5L)))
    val expected = labels(ConnectedComponents.run(nodes, edges))
    assert(labels(ConnectedComponents.runStars(nodes, edges)) === expected)
    assert(expected === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("deep chain: run throws at its round cap, runStars converges") {
    val n = 300L // diameter 300 ≫ min-label's default 20-round cap
    val nodes = nodesDf(0L until n)
    val edges = edgesDf((0L until n - 1).map(i => (i, i + 1)))
    val before = spark.sparkContext.getPersistentRDDs.size
    val ex = intercept[IllegalArgumentException] {
      ConnectedComponents.run(nodes, edges).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // the throw path must release the edge + label persists — clearCache
    // cannot, so a leak here would survive every auto() fallback
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "non-convergence throw leaked persisted RDDs")
    val got = labels(ConnectedComponents.runStars(nodes, edges))
    assert(got.size === n)
    assert(got.values.forall(_ === 0L), "every chain node must label to 0")
  }

  test("auto falls back to star contraction on a deep chain") {
    val n = 120L
    val nodes = nodesDf(0L until n)
    val edges = edgesDf((0L until n - 1).map(i => (i, i + 1)))
    val got = labels(ConnectedComponents.auto(nodes, edges)) // run() would throw
    assert(got.size === n && got.values.forall(_ === 0L))
  }

  test("runStars on an edgeless graph labels every node to itself") {
    val nodes = nodesDf(Seq(7L, 8L, 9L))
    val got = labels(ConnectedComponents.runStars(nodes, edgesDf(Seq.empty)))
    assert(got === Map(7L -> 7L, 8L -> 8L, 9L -> 9L))
  }

  test("runStars matches run on the sf0.001 near-dup edge set") {
    val dir = "/root/testdata/sf0.001"
    val pairs = DedupQueries.jaccardPairs(spark, dir)
      .select($"doc_a".as("src"), $"doc_b".as("dst"))
    val nodes = pairs.select($"src".as("id"))
      .unionByName(pairs.select($"dst".as("id"))).distinct()
    val expected = labels(ConnectedComponents.run(nodes, pairs))
    assert(labels(ConnectedComponents.runStars(nodes, pairs)) === expected)
  }
}
