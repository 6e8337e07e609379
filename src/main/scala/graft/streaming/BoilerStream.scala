package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q110's boilerplate profile — INCREMENTAL
  * line-wise dedup (the RefinedWeb/CCNet filter, fed by a stream of
  * newly crawled docs): each arriving document's stride-W chunk
  * hashes are probed against (a) the standing per-source corpus chunk
  * index and (b) state accumulated from earlier micro-batches, so a
  * chunk that recurs across two streamed docs OF THE SAME SOURCE is
  * flagged the moment its second copy arrives — including
  * retroactively flagging the first copy's instance, which only
  * became boilerplate in hindsight. The batch rule is preserved
  * exactly: a chunk is boilerplate iff it occurs in ≥ 2 DISTINCT
  * documents of the same source across corpus ∪ stream (same-doc
  * repeats never count — template text repeats across PAGES, not
  * within one), so for any stream prefix the flagged set equals
  * q110's computation over corpus + prefix (BoilerStreamSpec pins the
  * equivalence).
  *
  * Scale: the corpus index is the persisted artifact — per
  * (source, 16-byte digest): a distinct-doc count and one witness id,
  * never text (the SpanStream/postingIndex shape, on a W× smaller
  * key set because chunks don't overlap). Per micro-batch the stream
  * shuffles only (source, digest, doc_id, seg); state holds one entry
  * per first-seen (source, chunk) listing that doc's instances until
  * the chunk is established boilerplate, then a constant-size
  * tombstone. The q110 batch job owns the corpus side's own profile.
  */
object BoilerStream {

  final case class SrcDoc(doc_id: Long, source: String, text: String)
  final case class BoilerSeg(source: String, doc_id: Long, seg: Long, h: String)

  // public: encoder-generated code instantiates these reflectively
  final case class Probe(
      source: String, doc_id: Long, seg: Long, h: String, cn: Long, cmin: Long)

  /** Per-(source, chunk) state: the first-seen stream doc and its
    * instance positions, until established (`emitted`) — after which
    * instances drop (constant size). */
  final case class BState(doc: Long, segs: List[Long], emitted: Boolean)

  /** Stride-W chunk hashes of (doc_id, source, text) rows — the q110
    * kernel: non-overlapping full-W chunks only, trailing partials
    * are content (TextQueries q110 holds the batch side to the same
    * segmentation). */
  def segmentHashes(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= w)
      .select(col("doc_id"), col("source"),
        // the ONE chunk kernel, shared with batch q110 — byte-identical
        // segmentation is what the prefix-equivalence pin rests on
        posexplode(expr(graft.operators.TextQueries.chunkHashesExpr(w)))
          .as(Seq("seg", "h")))
      .select(col("source"), col("doc_id"), col("seg").cast("long").as("seg"), col("h"))

  /** The standing corpus index: per (source, chunk hash), how many
    * DISTINCT corpus docs of that source contain it and one witness
    * id (enough to decide boilerplate against any stream doc,
    * including a corpus doc re-ingesting itself). */
  def corpusIndex(corpusDocs: DataFrame, w: Int): DataFrame =
    segmentHashes(corpusDocs, w)
      .groupBy(col("source"), col("h"))
      .agg(countDistinct(col("doc_id")).as("corpus_docs"),
        min(col("doc_id")).as("corpus_min_doc"))

  /** Streaming boilerplate detector. Emits every streamed chunk
    * instance whose (source, hash) is established boilerplate — at
    * arrival when the corpus or earlier state already proves it,
    * retroactively for the first-seen copy the moment a second
    * distinct same-source doc shows up. */
  def boilerSegments(
      spark: SparkSession,
      docs: Dataset[SrcDoc],
      corpus: DataFrame,
      w: Int): Dataset[BoilerSeg] = {
    import spark.implicits._
    // stream-static joins re-execute the static plan EVERY micro-batch;
    // the index is the standing artifact, so pin it once here (it lives
    // as long as the query — exactly the artifact's lifetime)
    val pinned = corpus.persist()
    val probed = segmentHashes(docs.toDF(), w)
      .join(broadcast(pinned), Seq("source", "h"), "left")
      .select(col("source"), col("doc_id"), col("seg"), col("h"),
        coalesce(col("corpus_docs"), lit(0L)).as("cn"),
        coalesce(col("corpus_min_doc"), lit(Long.MinValue)).as("cmin"))
      .as[Probe]
    probed.groupByKey(r => (r.source, r.h))
      .flatMapGroupsWithState[BState, BoilerSeg](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (String, String), rows: Iterator[Probe], state: GroupState[BState]) =>
          val (source, h) = key
          val arr = rows.toSeq.sortBy(r => (r.doc_id, r.seg))
          val docs = arr.map(_.doc_id).distinct
          val st = state.getOption
          // ≥2 distinct same-source docs in corpus ∪ state ∪ this batch?
          def corpusDup(d: Long) =
            arr.head.cn >= 2 || (arr.head.cn == 1 && arr.head.cmin != d)
          val established = st.exists(_.emitted) ||
            docs.size >= 2 ||
            docs.exists(corpusDup) ||
            st.exists(s => docs.exists(_ != s.doc))
          // the first-seen copy becomes boilerplate in hindsight: flush
          // its stored instances exactly once
          val retro = st match {
            case Some(s) if !s.emitted && established =>
              s.segs.map(p => BoilerSeg(source, s.doc, p, h))
            case _ => Nil
          }
          val now =
            if (established) arr.map(r => BoilerSeg(source, r.doc_id, r.seg, h))
            else Nil
          state.update(
            if (established) BState(st.map(_.doc).getOrElse(docs.min), Nil, emitted = true)
            else st match {
              // not established ⇒ every arrival is the stored doc or the
              // first; dedup instance positions so a RE-INGESTED copy of
              // the same doc (a re-crawl) can't inflate the retro flush
              case Some(s) => s.copy(segs = (s.segs ++ arr.map(_.seg)).distinct)
              case None => BState(docs.head, arr.map(_.seg).distinct.toList, emitted = false)
            })
          (retro ++ now).iterator
      }
  }

  /** Settled-view per-source removal profile over emitted instances —
    * the stream-side slice of q110's columns (the batch job owns the
    * corpus side). */
  def profile(flagged: DataFrame, w: Int): DataFrame =
    flagged.groupBy(col("source"))
      .agg(countDistinct(col("h")).as("n_boiler_segs"),
        count(lit(1)).as("flagged_instances"))
      .withColumn("removed_tokens", col("flagged_instances") * w)
      .orderBy(col("source"))
}
