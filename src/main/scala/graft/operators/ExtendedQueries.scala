package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-1 gap fills (COVERAGE.md "known gaps"): relational
  * INTERSECT/EXCEPT, BPE-ish regex tokenization, as-of join,
  * embedding-cosine near-dup, GROUPING SETS, JSON property extraction.
  */
object ExtendedQueries {

  // ---------------------------------------------------------------- q35/q36
  /** Relational INTERSECT ⊕ (SURVEY §2.8): nations having both customers
    * and suppliers. */
  private def q35(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("k"))
      .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("k")))
      .orderBy(col("k"))

  private val q35Sql =
    """SELECT c_nationkey AS k FROM customer
      |INTERSECT
      |SELECT s_nationkey AS k FROM supplier
      |ORDER BY k""".stripMargin

  /** Relational EXCEPT ⊕: nations with customers but no suppliers. */
  private def q36(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("k"))
      .except(Tables.supplier(s, dir).select(col("s_nationkey").as("k")))
      .orderBy(col("k"))

  private val q36Sql =
    """SELECT c_nationkey AS k FROM customer
      |EXCEPT
      |SELECT s_nationkey AS k FROM supplier
      |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q37
  /** BPE-ish regex tokenizer (north-star "token counting: whitespace +
    * BPE-ish regex"): letter runs / digit runs / single non-alnum
    * symbols, the GPT-2-style split restricted to constructs whose
    * semantics are identical in Java regex (Spark) and RE2 (DuckDB). */
  private val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Per-doc regex-token counts as a STANDING ARTIFACT — the regex
    * kernel is the single most expensive per-doc map pass at the 100×
    * replica (q37 was the top warm line at ~20 s: the corpus re-ran
    * the extraction every query). One build pass produces the narrow
    * (doc_id, source, n_bpe_tokens, n_uniq_bpe) frame — the
    * [[TextQueries.gramCounts]] / doc_grams8 shape — and consumers
    * read per-doc counts without ever touching `text`. The oracle
    * still re-derives inline (hashes unchanged by construction);
    * ArtifactsSpec pins artifact == fresh build. */
  private[operators] def docTokens(s: SparkSession, dir: String): DataFrame =
    Artifacts.frame(s, dir, "doc_tokens")(docTokensBuild(s, dir))

  /** The builder, exposed so the plan spec can pin the one-pass
    * discipline on the BUILD (consumers must be corpus-scan-free). */
  private[operators] def docTokensBuild(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir), col("doc_id"))
      .select(col("doc_id"), col("source"),
        // transform-over-singleton is the `let` idiom (winnow kernel
        // scaladoc): the regex runs ONCE per doc — two bare
        // regexp_extract_all projections would each re-scan the text
        // (CollapseProject inlines per reference), doubling the one
        // kernel this build is made of
        // Spark SQL string literals are backslash-escaping: \s must
        // arrive at the regex engine intact, so the embedded literal
        // doubles it (the DuckDB oracle's dialect does not escape)
        expr(s"""element_at(transform(
           |  array(regexp_extract_all(text, '${BpePattern.replace("\\", "\\\\")}', 0)),
           |  a -> struct(CAST(size(a) AS BIGINT) AS n,
           |              CAST(size(array_distinct(a)) AS BIGINT) AS u)), 1)"""
          .stripMargin).as("s"))
      .select(col("doc_id"), col("source"),
        col("s.n").as("n_bpe_tokens"), col("s.u").as("n_uniq_bpe"))

  private def q37(s: SparkSession, dir: String): DataFrame =
    docTokens(s, dir)
      .select(col("doc_id"), col("n_bpe_tokens"), col("n_uniq_bpe"))
      .orderBy(col("doc_id"))

  private val q37Sql =
    s"""SELECT doc_id,
       | CAST(len(regexp_extract_all(text, '$BpePattern')) AS BIGINT) AS n_bpe_tokens,
       | CAST(len(list_distinct(regexp_extract_all(text, '$BpePattern'))) AS BIGINT) AS n_uniq_bpe
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q38
  /** As-of join ⊕: for every 'error' event, the most recent 'click' by
    * the same user at or before it. Spark side uses the scalable as-of
    * pattern — union both streams, ONE sort per user, carry the last
    * click forward with a running window — no join at all (a join-based
    * as-of would shuffle both sides and explode on range match; this is
    * a single shuffle + sort). Clicks are deduped per (user, ts) so the
    * as-of key is unique and tie-independent. */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts")).distinct()
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
        lit(null).cast("long").as("error_event_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), lit(1).as("kind"),
        col("event_id").as("error_event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(errors)
      .withColumn("asof_ts", last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("error_event_id"),
        unix_millis(col("asof_ts")).as("asof_click_ms"))
      .orderBy(col("user_id"), col("error_event_id"))
  }

  private val q38Sql =
    """WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |     u AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error')
      |SELECT u.user_id, u.event_id AS error_event_id, epoch_ms(max(c.ts)) AS asof_click_ms
      |FROM u LEFT JOIN c ON c.user_id = u.user_id AND c.ts <= u.ts
      |GROUP BY u.user_id, u.event_id
      |ORDER BY u.user_id, error_event_id""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Embedding-cosine near-dup ⊕ (dedup north-star), IVF-cell-bounded.
    *
    * Round 1 shipped this as exact all-pairs (a BroadcastNestedLoopJoin,
    * quadratic); rounds 2–9 as a 16-table × 12-plane sign-LSH prefilter.
    * The LSH form's scale flaw is structural: with B fixed, RANDOM
    * bucket collisions contribute ~L·N²/2^B candidate pairs — negligible
    * at test scale but the dominant term past ~10⁶ vectors (measured
    * 78–132 s at the 100× replica, the warm sweep's largest residual),
    * and B must grow ~log₂N to fix it, which kills recall at fixed L.
    * The registered form is now the same candidate geometry production
    * embedding-dedup uses (SemDeDup, q72): the standing IVF index's
    * k-means cells (K = √N/4 growing with the corpus — IvfQueries.kFor)
    * bound the pair join to within-cell candidates, N²/K per cell ⇒
    * N^1.5 total, shared with q42/q72/q123/q157 through the `ivf_index`
    * standing artifact. Candidates are exact-cosine verified and the
    * top-20 most-similar pairs (sim ≥ 0.3 floor) reported — the
    * dedup-review workflow, unchanged.
    *
    * The LSH machinery stays as [[nearDupTopK]]: NearDupRecallSpec
    * measures its recall on planted duplicates against the exact
    * all-pairs ground truth, and it remains the right prefilter when an
    * application needs tunable recall at a FIXED similarity threshold
    * rather than cell-bounded review candidates.
    *
    * Oracle: the shared ivfPrefixSql (seed → 2 Lloyd iterations →
    * assignments, every ranking similarity pre-rounded to 1e-6) + the
    * same within-cell pair CTE — deterministic on both engines. */
  private[operators] val NdTables = 16
  private[operators] val NdPlanes = 12
  private val NdSeed = 1000

  private def ndPlane(t: Int, i: Int): IndexedSeq[Double] =
    (0 until 64).map(d => SimilarityQueries.planeComponent(NdSeed + t * NdPlanes + i, d))

  /** LSH-prefiltered near-dup top-k over any (vec_id, embedding) frame.
    * Factored out so NearDupRecallSpec can run it on planted-duplicate
    * inputs. */
  private[graft] def nearDupTopK(s: SparkSession, emb: DataFrame, k: Int): DataFrame = {
    val nShuffle = s.conf.get("spark.sql.shuffle.partitions").toInt
    // repartition: the testdata parquet is a single row-group → one scan
    // partition in local mode; the signature kernel below would serialize
    // on one core without this (at cluster scale the scan is already
    // multi-partition and this is a cheap narrow-ish shuffle of id+vec).
    // The explicit partition count matters: a bare repartition(col) is
    // AQE-coalescible, and at this data size AQE folds it back to ONE
    // partition — an explicit count pins the parallelism.
    val base = emb
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", VectorMath.norm(s, "v"))
      .repartition(nShuffle, col("vec_id"))
    // All 16 table codes in one pass: the native LshSignCodes kernel when
    // GraftExtensions is installed (a flat double[] plane matrix, one
    // tight codegen loop), else the composable when(dot > 0) form —
    // identical codes on well-formed vectors (LshSignCodesSpec).
    val codesCol: Column =
      if (s.catalog.functionExists("graft_lsh_codes"))
        expr(s"graft_lsh_codes(v, $NdSeed, $NdTables, $NdPlanes, 64)")
      else {
        def dotPlane(t: Int, i: Int): Column = {
          val arr = ndPlane(t, i).map(x => if (x > 0) "1.0D" else "-1.0D")
            .mkString("array(", ",", ")")
          VectorMath.dot(s, "v", arr)
        }
        def code(t: Int): Column = (0 until NdPlanes)
          .map(i => when(dotPlane(t, i) > 0, lit(1 << i)).otherwise(lit(0)))
          .reduce(_ + _)
        array((0 until NdTables).map(code): _*)
      }
    // The repartition between the codes Project and the posexplode is a
    // deliberate optimizer barrier: collapsed into the Generate, the
    // signature computation leaves whole-stage codegen and runs
    // interpreted (measured 6× slower). The exchanged rows are compact
    // (id + 16 ints — vectors stay behind), and the explode output is
    // reshuffled by (t, bucket) for the join anyway.
    val sigs = base
      .select(col("vec_id"), codesCol.as("codes"))
      .repartition(nShuffle, col("vec_id"))
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("t", "bucket")))
    val cands = sigs.as("a")
      .join(sigs.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val va = base.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val vb = base.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    cands.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
      .withColumn("sim", Det.rate(VectorMath.cosine(s, "va", "vb", col("na"), col("nb"))))
      .filter(col("sim") >= 0.3)
      .orderBy(col("sim").desc, col("vec_a"), col("vec_b"))
      .limit(k)
      .select(col("vec_a"), col("vec_b"), col("sim"))
  }

  private def q39(s: SparkSession, dir: String): DataFrame = {
    val (assigned, _) = IvfQueries.index(s, dir)
    assigned.count() // the pair self-join's two scans race the cold cache
    val a = assigned.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("nrm").as("na"), col("cell"))
    val b = assigned.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("cell").as("cellb"))
    a.join(b, col("cell") === col("cellb") && col("vec_a") < col("vec_b"))
      .withColumn("sim", Det.rate(VectorMath.cosine(s, "va", "vb", col("na"), col("nb"))))
      .filter(col("sim") >= 0.3)
      .orderBy(col("sim").desc, col("vec_a"), col("vec_b"))
      .limit(20)
      .select(col("vec_a"), col("vec_b"), col("sim"))
  }

  private val q39Sql: String =
    s"""${IvfQueries.ivfPrefixSql},
       |p AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         ${IvfQueries.sim("a.v", "a.nrm", "b.v", "b.nrm")} AS sim
       |  FROM asgf a JOIN asgf b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |)
       |SELECT vec_a, vec_b, sim FROM p WHERE sim >= 0.3
       |ORDER BY sim DESC, vec_a, vec_b LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q40
  /** GROUPING SETS ⊕ (beyond rollup/cube): independent per-dimension
    * subtotals + grand total. Dataset API exposes only rollup/cube, so
    * this goes through spark.sql — the same Catalyst Aggregate(Expand)
    * plan. */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("li_gs")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |       count(*) AS n
        |FROM li_gs GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin)
  }

  private val q40Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      | count(*) AS n
      |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  // ---------------------------------------------------------------- q41
  /** JSON property extraction from events.props (FIXTURES.md §2.1):
    * from_json with a declared schema (Spark-first; no schema inference
    * at scale), aggregated per event type. */
  private def q41(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        Det.rnd(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type"))

  private val q41Sql =
    """SELECT event_type, count(*) AS n,
      | CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      | floor((avg(CAST(props->>'$.k' AS BIGINT))) * 1e4 + 0.5) / 1e4 AS avg_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q35_intersect", Some(q35Sql), q35),
    QuerySpec("q36_except", Some(q36Sql), q36),
    QuerySpec("q37_bpe_tokens", Some(q37Sql), q37),
    QuerySpec("q38_asof_join", Some(q38Sql), q38),
    QuerySpec("q39_cosine_neardup", Some(q39Sql), q39),
    QuerySpec("q40_grouping_sets", Some(q40Sql), q40),
    QuerySpec("q41_json_extract", Some(q41Sql), q41),
  )
}
