package graft.operators

import graft.{QuerySpec, Tables}
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q52: the multimodal pipeline as a registered, oracle-checked query
  * (VERDICT r1 "what's missing" #4 — the multimodal path previously had
  * specs but no CORRECTNESS row).
  *
  * documents.text is treated as an opaque media payload (each char's
  * codepoint mod 256 = one byte — engine-independent, unlike UTF-8
  * encoding details), flowed through the REAL multimodal machinery:
  * MediaRow schema → per-partition StubDecoder (decoder constructed once
  * per partition, the expensive-codec pattern) → 16-dim stripe-mean
  * features → featureTable → q28-style cosine top-k over a sampled
  * query set. Media bytes never shuffle: features are extracted
  * map-side and only (vec_id, 16 floats) flows into the join.
  *
  * The stub decoder is deterministic, so the WHOLE pipeline is
  * replicable in DuckDB SQL (list comprehensions over codepoints) and
  * the result is hash-matched, not rows-only. Cross-engine float note:
  * stripe means are computed in double and cast to float on both sides
  * (same IEEE round-to-nearest), similarities are Det.rate-rounded
  * before ranking.
  */
object MultimodalQueries {

  private def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      // spread the single-row-group scan before per-row byte work
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("doc_id"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = new Array[Byte](text.length)
        var i = 0
        while (i < text.length) { bytes(i) = (text.charAt(i).toInt & 0xff).toByte; i += 1 }
        MultimodalOps.MediaRow(id, Seq("image", "audio", "video")((id % 3).toInt),
          bytes, 64, 64, 16000, 1000L + id)
      }
    val feats = MultimodalOps.featureTable(s, media)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", VectorMath.norm(s, "v"))
    val q = feats.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val c = feats.select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim", Det.rate(VectorMath.dot(s, "qv", "cv") / (col("qn") * col("cn"))))
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid")))
        .cast("long"))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("rn"), col("cid"), col("sim"))
      .orderBy(col("qid"), col("rn"))
  }

  private val q52Sql =
    """WITH e AS (
      |  SELECT doc_id,
      |    [CAST(list_avg([unicode(substr(text, i + 1, 1)) % 256
      |                    FOR i IN range(length(text)) IF i % 16 = s]) AS FLOAT)
      |     FOR s IN range(16)] AS emb
      |  FROM documents
      |), nv AS (
      |  SELECT doc_id AS vec_id, emb::DOUBLE[] AS v,
      |         sqrt(list_dot_product(emb::DOUBLE[], emb::DOUBLE[])) AS nrm
      |  FROM e
      |), p AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS cid,
      |         floor((list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) * 1e6 + 0.5) / 1e6 AS sim
      |  FROM nv q JOIN nv c ON q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
      |), r AS (
      |  SELECT qid, cid, sim,
      |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
      |  FROM p
      |)
      |SELECT qid, rn, cid, sim FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("q52_multimodal_ann", Some(q52Sql), q52),
  )
}
