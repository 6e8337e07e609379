package graft.operators

import graft.{QueryCatalog, SparkSpec}

/** The determinism claim behind the md5-ordered samplers and rounded
  * rankings (SCALE.md "Top-k / sampling": "deterministic under any
  * partitioning, unlike rand(seed)") — pinned: the same query run with
  * a different shuffle partitioning must return byte-identical rows. */
class PartitioningInvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Seq[Any]] =
    QueryCatalog.all.find(_.name == name).get.fn(spark, dir)
      .collect().toSeq.map(_.toSeq.map {
        case a: Array[_] => a.toSeq
        case x => x
      })

  for (name <- Seq("q19_hash_sample", "q57_stratified_sample", "q28_cosine_topk",
    "q54_cc_dedup_clusters",
    // round 5: the Weyl-hash sampler, the per-bucket packing windows,
    // and the iterative integer PageRank must all be layout-blind
    "q76_mixture_sampling", "q75_sequence_packing", "q80_pagerank_neardup")) {
    test(s"$name is invariant to the shuffle partitioning") {
      val default = spark.conf.get("spark.sql.shuffle.partitions")
      val base = rows(name)
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert(rows(name) === base, s"$name changed under 7 shuffle partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", default)
    }
  }
}
