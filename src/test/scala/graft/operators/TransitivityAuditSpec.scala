package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q174 transitivity audit: per-size rows equal a plain-Scala replay
  * off the two standing artifacts, the 2-cluster clique floor reads
  * exactly 10⁶, and every row respects the spanning-tree bound. */
class TransitivityAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    graft.QueryCatalog.all.find(_.name == "q174_transitivity_audit").get
      .fn(spark, dir).collect()

  test("every size row equals the replay off the pair + cluster artifacts") {
    val comp = CorpusQueries.clusterMap(spark, dir)
      .select("doc_id", "component_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = DedupQueries.jaccardPairs(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySize = comp.groupBy(_._2).values
      .map(ds => (ds.head._2, ds.size.toLong)).filter(_._2 >= 2)
      .toSeq.groupBy(_._2)
    assert(rows.map(_.getAs[Long]("csize")).toSet === bySize.keySet)
    rows.foreach { r =>
      val k = r.getAs[Long]("csize")
      val comps = bySize(k).map(_._1).toSet
      val direct = pairs.count(p => comps.contains(comp(p._1))).toLong
      assert(r.getAs[Long]("n_clusters") === bySize(k).size.toLong, s"k=$k")
      assert(r.getAs[Long]("direct_pairs") === direct, s"k=$k")
      assert(r.getAs[Long]("implied_pairs") === bySize(k).size * (k * (k - 1) / 2))
      assert(r.getAs[Long]("transitivity_ppm") ===
        direct * 1000000 / r.getAs[Long]("implied_pairs"), s"k=$k")
    }
  }

  test("clique floor and spanning bound") {
    val two = rows.find(_.getAs[Long]("csize") === 2L)
    assert(two.nonEmpty, "the corpus has planted near-dup pairs")
    assert(two.get.getAs[Long]("transitivity_ppm") === 1000000L)
    rows.foreach { r =>
      val k = r.getAs[Long]("csize")
      // connectivity needs at least k-1 edges per cluster; never more
      // than the clique
      assert(r.getAs[Long]("direct_pairs") >= r.getAs[Long]("n_clusters") * (k - 1))
      assert(r.getAs[Long]("direct_pairs") <= r.getAs[Long]("implied_pairs"))
    }
  }
}
