package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online vocabulary-growth maintenance — the streaming half of the
  * q163/q165 family: as documents arrive, each source's standing
  * state folds in token counts and the stream emits that source's
  * refreshed coverage row (docs, tokens, vocabulary, hapax/dis
  * legomena, Good-Turing unseen mass and coverage, Chao1 richness
  * floor), so an ingest pipeline watches vocabulary saturate live
  * instead of rescanning the corpus per report. After any stream
  * prefix the latest emission per source equals batch q165 over
  * exactly the docs seen so far, bit for bit (same integer ppm
  * divisions), regardless of micro-batch boundaries — pinned by
  * GrowthStreamSpec, including hapax retroactivity (a once-seen term
  * leaves the hapax count when its second copy arrives in a later
  * batch).
  *
  * Scale: per-term counts are capped at 3 — Good-Turing needs only
  * the classes {1, 2, ≥3} — so state is VOCABULARY-bounded (one
  * small int per type), never corpus-bounded; on an open 100 TB
  * vocabulary the q99 KenLM move applies (prune types below a count
  * floor, which can only touch the ≥3 class and so changes no
  * emitted number until V itself is pruned — then V/chao1 become
  * the standard "count ≥ floor" variants). Arrivals shuffle once,
  * keyed by source. */
object GrowthStream {

  final case class Doc(doc_id: Long, source: String, text: String)
  final case class SrcState(counts: Map[String, Int], nDocs: Long, nTokens: Long)
  final case class GrowthRow(source: String, n_docs: Long, n_tokens: Long,
      vocab: Long, hapax: Long, dis: Long, unseen_mass_ppm: Long,
      coverage_ppm: Long, chao1_vocab: Long)

  /** Fold one source's micro-batch docs into its standing state and
    * emit the refreshed coverage row (nothing until tokens exist). */
  def growth(spark: SparkSession, docs: Dataset[Doc]): Dataset[GrowthRow] = {
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[SrcState, GrowthRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[Doc], state: GroupState[SrcState]) =>
          val st = state.getOption.getOrElse(SrcState(Map.empty, 0L, 0L))
          var counts = st.counts
          var nd = st.nDocs
          var nt = st.nTokens
          rows.foreach { d =>
            nd += 1
            d.text.split(" ").iterator.filter(_.nonEmpty).foreach { t =>
              nt += 1
              val c = counts.getOrElse(t, 0)
              if (c < 3) counts = counts.updated(t, c + 1)
            }
          }
          state.update(SrcState(counts, nd, nt))
          if (nt == 0L) Iterator.empty
          else {
            val v = counts.size.toLong
            val h = counts.valuesIterator.count(_ == 1).toLong
            val di = counts.valuesIterator.count(_ == 2).toLong
            Iterator.single(GrowthRow(src, nd, nt, v, h, di,
              h * 1000000L / nt, (nt - h) * 1000000L / nt,
              v + h * (h - 1) / (2 * (di + 1))))
          }
      }
  }
}
