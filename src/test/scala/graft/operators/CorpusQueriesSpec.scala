package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusQueriesSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("connected components: chain, pair, and singleton resolve to min labels") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // 1-2-3 chain (diameter 2 — needs >1 propagation round), 5-6 pair, 4 isolated
    val edges = Seq((2L, 1L), (2L, 3L), (6L, 5L)).toDF("src", "dst")
    val got = ConnectedComponents.run(nodes, edges)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("connected components: long chain converges past many rounds") {
    // path 0-1-2-...-9: worst-case diameter for min-label propagation
    val n = 10L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val got = ConnectedComponents.run(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet === Set(0L), "all chain nodes must reach label 0")
  }

  test("connected components match a driver union-find on random graphs (property, seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 12) {
      val n = 2 + rnd.nextInt(30)
      val ids = (0L until n).toSeq
      val edges = Seq.fill(rnd.nextInt(2 * n))((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = ids.map(i => i -> {
        // min id of the component = min over members sharing the root
        val r = find(i); ids.filter(find(_) == r).min
      }).toMap
      val got = ConnectedComponents.run(
        ids.toDF("id"),
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
        else edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"n=$n edges=$edges")
    }
  }

  test("q54 clusters are consistent: canonical per cluster, sizes add up") {
    val rows = CorpusQueries.specs.find(_.name == "q54_cc_dedup_clusters").get
      .fn(spark, dir)
      .select("doc_id", "component_id", "csize", "is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(rows.map(_._1).distinct.size === rows.size, "one row per doc")
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.count(_._4) === 1, s"component $comp must have exactly one canonical doc")
      assert(members.find(_._4).get._1 === comp, "canonical doc is the min = component id")
      assert(members.forall(_._3 === members.size), s"csize mismatch in component $comp")
      assert(members.map(_._1).min === comp, "component id is the min member")
    }
  }

  test("q97 survivor accounting ties out against q54's components") {
    val q54rows = CorpusQueries.specs.find(_.name == "q54_cc_dedup_clusters").get
      .fn(spark, dir).select("component_id").as[Long].collect()
    val q97rows = CorpusQueries.specs.find(_.name == "q97_cluster_canonical").get
      .fn(spark, dir)
      .select("source", "n_docs", "n_kept", "chars_removed")
      .as[(String, Long, Long, Long)].collect().toSeq
    // one survivor per component, regardless of which source holds it
    assert(q97rows.map(_._3).sum === q54rows.distinct.length.toLong)
    // every doc is accounted exactly once across sources
    assert(q97rows.map(_._2).sum === q54rows.length.toLong)
    q97rows.foreach { case (src, docs, kept, removed) =>
      assert(kept >= 1 && kept <= docs, s"source $src")
      assert(removed >= 0, s"source $src")
      assert((removed > 0) === (docs > kept) || removed == 0, s"source $src")
    }
    // removal must be real on this corpus (planted near-dups exist)
    assert(q97rows.map(_._2).sum > q97rows.map(_._3).sum)
  }

  test("dedup end-to-end: the canonical corpus contains no near-dup pair") {
    // compose q54's clusters back onto documents — the "keep one per
    // cluster" materialization — and assert the pipeline's guarantee:
    // among kept docs, the near-dup kernel finds nothing
    val clusters = CorpusQueries.specs.find(_.name == "q54_cc_dedup_clusters").get
      .fn(spark, dir).select("doc_id", "is_canonical")
    val kept = clusters.filter(org.apache.spark.sql.functions.col("is_canonical"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept.nonEmpty && kept.size < 500, s"expected real dedup, kept ${kept.size}/500")
    val pairs = DedupQueries.jaccardPairs(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val survivors = pairs.filter { case (a, b) => kept(a) && kept(b) }
    assert(survivors.isEmpty,
      s"near-dup pairs must not survive canonical filtering: ${survivors.take(5).toSeq}")
  }

  test("q57 stratified sample takes exactly min(k, stratum size) per language") {
    val sample = CorpusQueries.specs.find(_.name == "q57_stratified_sample").get
      .fn(spark, dir).groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = graft.Tables.documents(spark, dir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    full.foreach { case (lang, n) =>
      assert(sample(lang) === math.min(20L, n), s"stratum $lang")
    }
  }

  test("q63 banded simhash candidates are pigeonhole-lossless at hamming <= 3") {
    import org.apache.spark.sql.functions._
    // brute-force ground truth over all signature pairs at sf0.001
    val got = DedupQueries.specs.find(_.name == "q63_simhash_neardup").get
      .fn(spark, dir).select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val qs = DedupQueries.specs.find(_.name == "q27_simhash").get // sanity: sig pipeline alive
    assert(qs.fn(spark, dir).count() > 0)
    val sig = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("hx", concat(md5(col("tok")), md5(concat(lit("x"), col("tok")))))
    val bitSums = (0 until 60).map { i =>
      sum(when(substring(col("hx"), i + 1, 1)
        .isin("1", "3", "5", "7", "9", "b", "d", "f"), 1L).otherwise(-1L)).as(s"b$i")
    }
    val v = (0 until 60)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    val sigs = sig.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), v.as("sig")).as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    assert(got === brute, "banding must lose no pair within the hamming radius")
  }

  test("q58 quantized ranking mostly agrees with the exact float ranking") {
    val rows = CorpusQueries.specs.find(_.name == "q58_quantized_ann").get
      .fn(spark, dir).select("in_exact_topk").as[Boolean].collect()
    assert(rows.nonEmpty)
    val recall = rows.count(identity).toDouble / rows.length
    // 8-bit scalar quantization on 64-dim vectors barely perturbs cosine
    // order; anything below this bound means the dequantization is wrong
    assert(recall >= 0.8, f"top-5 agreement $recall%.2f too low")
  }

  test("q128 histogram is exactly q54's clustering re-binned by size") {
    val q54 = CorpusQueries.specs.find(_.name == "q54_cc_dedup_clusters").get
      .fn(spark, dir).collect()
    val expected = q54.filter(_.getAs[Boolean]("is_canonical"))
      .groupBy(_.getAs[Long]("csize"))
      .map { case (sz, rs) => (sz, rs.length.toLong, sz * rs.length) }
      .toSeq.sortBy(_._1)
    val rows = CorpusQueries.specs.find(_.name == "q128_cluster_sizes").get
      .fn(spark, dir).collect()
    assert(rows.map(r => (r.getAs[Long]("csize"), r.getAs[Long]("n_clusters"),
      r.getAs[Long]("n_docs"))).toSeq === expected)
    // every document lands in exactly one cluster
    assert(rows.map(_.getAs[Long]("n_docs")).sum === q54.length.toLong)
    val shares = rows.map(_.getAs[Double]("doc_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-3, "shares cover the corpus")
  }

  test("q131 datasheet facts reconcile with the corpus and the dedup queries") {
    val r = CorpusQueries.specs.find(_.name == "q131_datasheet").get
      .fn(spark, dir).collect().head
    val docs = graft.Tables.documents(spark, dir)
      .select(col("text"), col("source"), col("lang")).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2)))
    assert(r.getAs[Long]("n_docs") === docs.length.toLong)
    assert(r.getAs[Long]("n_tokens") ===
      docs.map(_._1.split(" ", -1).length.toLong).sum)
    assert(r.getAs[Long]("n_chars") === docs.map(_._1.length.toLong).sum)
    assert(r.getAs[Long]("n_sources") === docs.map(_._2).distinct.length.toLong)
    assert(r.getAs[Long]("n_langs") === docs.map(_._3).distinct.length.toLong)
    assert(r.getAs[Long]("vocab_size") ===
      docs.iterator.flatMap(_._1.split(" ", -1)).toSet.size.toLong)
    assert(r.getAs[Long]("exact_dup_docs") ===
      docs.length.toLong - docs.map(_._1).distinct.length.toLong)
    // cross-query: the near-dup count IS q26's pair count
    assert(r.getAs[Long]("neardup_pairs") ===
      DedupQueries.specs.find(_.name == "q26_ngram_jaccard").get
        .fn(spark, dir).count())
  }

  test("q132 source JSD equals an independent exact driver recomputation") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", $"text").as[(String, String)].collect()
    // per-source unigram counts; split(_, -1) to keep trailing empties,
    // matching Spark's split() and DuckDB's string_split
    val counts: Map[String, Map[String, Long]] = docs.groupBy(_._1).map {
      case (src, rows) =>
        src -> rows.toSeq.flatMap(_._2.split(" ", -1))
          .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    }
    val tot = counts.map { case (s, m) => s -> m.values.sum }
    val vocab = counts.values.flatMap(_.keys).toSet.toSeq
    // independently-coded 6-class milli-nat midpoint ladder (spec constants)
    val ladder = Seq((1, 4, -2079L), (1, 2, -1040L), (3, 4, -490L),
      (9, 10, -197L), (11, 10, 0L), (4, 3, 191L))
    def w(num: Long, den: Long): Long =
      ladder.collectFirst { case (n, d, wt) if num * d < den * n => wt }
        .getOrElse(490L)
    val srcs = counts.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      a = srcs(i); b = srcs(j)
    } yield {
      val raw = vocab.map { t =>
        val pa = counts(a).getOrElse(t, 0L) * 1000000L / tot(a) + 1
        val pb = counts(b).getOrElse(t, 0L) * 1000000L / tot(b) + 1
        pb * w(pb * 2, pa + pb) + pa * w(pa * 2, pa + pb)
      }.sum
      (a, b) -> math.max(raw / 2, 0L)
    }).toMap
    val got = CorpusQueries.specs.find(_.name == "q132_source_jsd").get
      .fn(spark, dir).as[(String, String, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === expected.keySet,
      "every unordered source pair exactly once")
    got.foreach { case (a, b, j) => assert(j === expected((a, b)), s"pair ($a,$b)") }
    assert(got.forall(_._3 >= 0L))
    assert(got.exists(_._3 > 0L), "distinct synthetic sources must diverge")
  }

  test("q135 source MinHash matches a driver sketch and tracks exact Jaccard") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", $"text").as[(String, String)].collect()
    // independent driver-side sketch: distinct 8-grams per source,
    // min md5("h:gram") per slot via MessageDigest directly
    val grams: Map[String, Set[String]] = docs.groupBy(_._1).map {
      case (src, rows) =>
        src -> rows.toSeq.flatMap { case (_, text) =>
          val t = text.split(" ", -1).toSeq
          if (t.size < 8) Seq.empty
          else (0 to t.size - 8).map(i => t.slice(i, i + 8).mkString(" "))
        }.toSet
    }.filter(_._2.nonEmpty)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sig: Map[String, IndexedSeq[String]] = grams.map { case (src, gs) =>
      src -> (0 until 64).map(h => gs.map(g => md5hex(s"$h:$g")).min)
    }
    val srcs = sig.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      a = srcs(i); b = srcs(j)
    } yield (a, b) -> (0 until 64).count(h => sig(a)(h) == sig(b)(h)).toLong).toMap
    val got = CorpusQueries.specs.find(_.name == "q135_source_minhash").get
      .fn(spark, dir).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        ((r.getAs[Long]("n_match"), r.getAs[Long]("jaccard_est_ppm"))))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, m) =>
      assert(got(k)._1 === m, s"pair $k slot matches")
      assert(got(k)._2 === m * 1000000L / 64, s"pair $k ppm")
    }
    // estimator audit: |est − exact Jaccard| within sketch error on
    // every pair (stderr ≈ 1/√64 = 0.125; allow 3σ) and unbiased-ish
    // in aggregate
    val errs = expected.toSeq.map { case ((a, b), m) =>
      val exact = grams(a).intersect(grams(b)).size.toDouble /
        grams(a).union(grams(b)).size
      m / 64.0 - exact
    }
    assert(errs.forall(e => math.abs(e) <= 0.375), s"worst ${errs.maxBy(math.abs)}")
    assert(math.abs(errs.sum / errs.size) <= 0.05,
      s"mean error ${errs.sum / errs.size} suggests estimator bias")
  }

  test("q142 soft-dedup weights tie out against q54's clustering exactly") {
    val comp = CorpusQueries.specs.find(_.name == "q54_cc_dedup_clusters").get
      .fn(spark, dir)
      .select(col("doc_id"), col("component_id"))
      .as[(Long, Long)].collect()
    val csize = comp.groupBy(_._2).map { case (c, xs) => c -> xs.length.toLong }
    val wppm = comp.map { case (d, c) => d -> 1000000L / csize(c) }.toMap
    val srcOf = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val expected = wppm.toSeq.groupBy { case (d, _) => srcOf(d) }
      .map { case (src, xs) =>
        val eff = xs.map(_._2).sum
        src -> ((xs.size.toLong, eff, eff / xs.size))
      }
    val got = CorpusQueries.specs.find(_.name == "q142_softdedup_weights").get
      .fn(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("eff_docs_ppm"),
          r.getAs[Long]("discount_ppm")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (s0, e) => assert(got(s0) === e, s"source $s0") }
    // each family contributes at most one doc's worth of mass
    val totalEff = got.values.map(_._2).sum
    assert(totalEff <= csize.size.toLong * 1000000L,
      "effective mass must not exceed one doc per family")
    assert(totalEff > 0L)
  }
}
