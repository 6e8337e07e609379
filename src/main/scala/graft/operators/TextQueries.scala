package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (BASELINE.json
  * north_star: language-ID, quality scoring, token counting, document
  * fingerprinting). All are per-row narrow transforms + hash aggregations
  * — embarrassingly parallel at 100 TB; no shuffle except the final
  * (small) aggregations. Token ops use codegen'd higher-order array
  * functions, never UDFs.
  */
object TextQueries {

  private val stopwords = Seq("the", "a", "and", "of", "to")

  private def toks: Column = split(col("text"), " ")

  // ---------------------------------------------------------------- q20
  /** Token explode + count + HAVING (user_analytics.py:240-322 explode
    * kernel over testdata; FIXTURES.md §2.1). */
  private def q20(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(toks).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 5)
      .orderBy(col("cnt").desc, col("token"))

  private val q20Sql =
    """SELECT token, count(*) AS cnt FROM (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
      |) t WHERE token <> '' GROUP BY token HAVING count(*) >= 5
      |ORDER BY cnt DESC, token""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Per-document token counting + quality scoring: token/char counts,
    * distinct tokens, stopword ratio, and a deterministic quality score
    * (length/stopword mix). All double arithmetic is written with
    * identical association on both sides so results are bit-equal. */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val stopCnt = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
    val stopRatio = stopCnt.cast("double") / nTok
    val quality =
      lit(0.4) * least(lit(1.0), nTok.cast("double") / 50.0) +
        lit(0.4) * (lit(1.0) - stopRatio) +
        lit(0.2) * least(lit(1.0), col("n_chars").cast("double") / 500.0)
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        nUniq.as("n_uniq_tokens"),
        Det.rate(stopRatio).as("stop_ratio"),
        Det.rate(quality).as("quality"))
      .orderBy(col("doc_id"))
  }

  private val q21Sql =
    """SELECT doc_id,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
      | floor((CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','and','of','to'))) AS DOUBLE)
      |        / len(string_split(text, ' '))) * 1e6 + 0.5) / 1e6 AS stop_ratio,
      | floor((0.4 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0)
      |      + 0.4 * (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','and','of','to'))) AS DOUBLE)
      |                     / len(string_split(text, ' ')))
      |      + 0.2 * least(1.0, CAST(n_chars AS DOUBLE) / 500.0)) * 1e6 + 0.5) / 1e6 AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Document fingerprinting: md5 content fingerprint per doc (md5 is
    * bit-identical in Spark and DuckDB, so the fingerprint itself is
    * oracle-checkable — unlike engine-specific hash()). */
  private def q22(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("fp"),
        md5(concat_ws(":", col("source"), col("lang"), col("text"))).as("keyed_fp"))
      .orderBy(col("doc_id"))

  private val q22Sql =
    """SELECT doc_id, md5(text) AS fp,
      | md5(source || ':' || lang || ':' || text) AS keyed_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Language-ID (marker-token heuristic) + confusion matrix vs the
    * labeled `lang` column. Marker sets are a deterministic stand-in for
    * an n-gram language model — the synthetic corpus shares one
    * English-ish vocabulary, so the interesting output is the confusion
    * matrix shape, not accuracy. Ties resolve by fixed chain order. */
  private def q23(s: SparkSession, dir: String): DataFrame = {
    def score(markers: Seq[String]): Column =
      size(filter(toks, t => t.isin(markers: _*)))
    val sEn = score(Seq("the", "a"))
    val sDe = score(Seq("der", "und"))
    val sEs = score(Seq("el", "y"))
    val sFr = score(Seq("le", "et"))
    val sZh = score(Seq("zh", "ni"))
    val predicted =
      when(sEn >= sDe && sEn >= sEs && sEn >= sFr && sEn >= sZh, "en")
        .when(sDe >= sEs && sDe >= sFr && sDe >= sZh, "de")
        .when(sEs >= sFr && sEs >= sZh, "es")
        .when(sFr >= sZh, "fr")
        .otherwise("zh")
    Tables.documents(s, dir)
      .select(col("lang"), predicted.as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  private val q23Sql =
    """WITH scored AS (
      |  SELECT lang,
      |   len(list_filter(string_split(text, ' '), x -> x IN ('the','a'))) AS s_en,
      |   len(list_filter(string_split(text, ' '), x -> x IN ('der','und'))) AS s_de,
      |   len(list_filter(string_split(text, ' '), x -> x IN ('el','y'))) AS s_es,
      |   len(list_filter(string_split(text, ' '), x -> x IN ('le','et'))) AS s_fr,
      |   len(list_filter(string_split(text, ' '), x -> x IN ('zh','ni'))) AS s_zh
      |  FROM documents
      |), pred AS (
      |  SELECT lang,
      |   CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
      |        WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
      |        WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
      |        WHEN s_fr >= s_zh THEN 'fr'
      |        ELSE 'zh' END AS predicted
      |  FROM scored
      |)
      |SELECT lang, predicted, count(*) AS n FROM pred
      |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin

  // ---------------------------------------------------------------- q66
  /** Per-language vocabulary profile: token count, vocabulary size,
    * hapax legomena (frequency-1 types), and type-token ratio — the
    * corpus-level statistics a language-mix report starts from. Two
    * hash aggs ((lang, token) → lang); only token partials shuffle. */
  private def q66(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
      .withColumn("ttr", Det.rate(col("vocab").cast("double") / col("n_tokens")))
      .orderBy(col("lang"))

  private val q66Sql =
    """SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS vocab,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      |  floor((CAST(count(*) AS DOUBLE) / sum(c)) * 1e6 + 0.5) / 1e6 AS ttr
      |FROM (
      |  SELECT lang, tok, count(*) AS c
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY lang, tok
      |)
      |GROUP BY lang ORDER BY lang""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q20_token_explode", Some(q20Sql), q20),
    QuerySpec("q21_text_stats", Some(q21Sql), q21),
    QuerySpec("q22_doc_fingerprint", Some(q22Sql), q22),
    QuerySpec("q23_lang_id_confusion", Some(q23Sql), q23),
    QuerySpec("q66_vocab_profile", Some(q66Sql), q66),
  )
}
