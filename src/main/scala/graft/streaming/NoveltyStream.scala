package graft.streaming

import graft.operators.{CorpusQueries, Det}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q124's novelty audit — the INGEST GATE shape: a
  * stream of candidate documents (model samples under a memorization
  * audit, or newly crawled docs under dedup-before-ingest) is scored
  * for 8-gram novelty against (a) the standing training-corpus gram
  * index and (b) every EARLIER streamed document, so a near-copy
  * submitted twice reads as novel at most once. Per-gram verdicts are
  * emitted the moment the gram arrives; `score()` folds them into
  * q124's per-doc columns.
  *
  * Semantics mirror batch q124 exactly, extended to the stream axis:
  * a gram of doc d is a HIT iff it occurs in the corpus, or in a
  * streamed doc d' ≠ d that arrived before d (across batches by
  * arrival, within a batch by doc_id — the same deterministic
  * within-batch order every stateful stream here uses). A re-ingested
  * copy of the SAME doc id never hits itself (q124's cross-doc
  * philosophy; BoilerStream's same-doc exclusion), but any other doc
  * it collides with does.
  *
  * Scale: the corpus index is the persisted artifact — distinct grams
  * only, no text, no doc ids (the q84 posting-index family, existence
  * is the only question asked of it). Per micro-batch the stream
  * shuffles (doc_id, gram) rows keyed by gram; state holds ONE
  * constant-size entry (first-witness doc id) per distinct streamed
  * gram — bounded by stream volume, the same envelope as q34's
  * stateful dedup, and evictable by watermark in a windowed variant.
  */
object NoveltyStream {

  final case class Doc(doc_id: Long, text: String)

  // public: encoder-generated code instantiates these reflectively
  final case class GramProbe(doc_id: Long, g: String, corpus_hit: Boolean)
  final case class GramVerdict(doc_id: Long, g: String, hit: Boolean)

  /** Per-gram state: the first streamed doc to carry it. */
  final case class NState(firstDoc: Long)

  /** The standing corpus gram index: distinct 8-grams of the training
    * corpus — existence is all the gate asks, so no counts, no ids. */
  def corpusIndex(corpusDocs: DataFrame): DataFrame =
    CorpusQueries.grams8Of(corpusDocs).select(col("g")).distinct()
      .withColumn("corpus_hit", lit(true))

  /** Per-gram hit verdicts for a stream of docs. Append-mode: one row
    * per (doc, distinct gram), emitted in the batch the doc arrives. */
  def gramVerdicts(
      spark: SparkSession,
      docs: Dataset[Doc],
      corpus: DataFrame): Dataset[GramVerdict] = {
    import spark.implicits._
    // stream-static joins re-execute the static plan every micro-batch;
    // the index is the standing artifact, so pin it once (BoilerStream's
    // move). At 100 TB the index side is a shuffled equi-join, not a
    // broadcast — leave the strategy to the planner.
    val pinned = corpus.persist()
    val probed = CorpusQueries.grams8Of(docs.toDF())
      .join(pinned, Seq("g"), "left")
      .select(col("doc_id"), col("g"),
        coalesce(col("corpus_hit"), lit(false)).as("corpus_hit"))
      .as[GramProbe]
    probed.groupByKey(_.g)
      .flatMapGroupsWithState[NState, GramVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[GramProbe], state: GroupState[NState]) =>
          val arr = rows.toSeq.sortBy(_.doc_id)
          val corpusHit = arr.head.corpus_hit
          val stDoc = state.getOption.map(_.firstDoc)
          val out = arr.map { r =>
            val streamHit = stDoc.exists(_ != r.doc_id) ||
              arr.exists(o => o.doc_id < r.doc_id)
            GramVerdict(r.doc_id, g, corpusHit || streamHit)
          }
          if (stDoc.isEmpty) state.update(NState(arr.head.doc_id))
          out.iterator
      }
  }

  /** q124's per-doc columns over the emitted verdicts (settled view —
    * run against the memory/file sink, or inside foreachBatch). */
  def score(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hit"))
      .withColumn("novelty",
        Det.rate(lit(1.0) - col("n_hit").cast("double") / col("n_grams")))
      .withColumn("regurgitated", col("novelty") < 0.5)
      .orderBy(col("doc_id"))
}
