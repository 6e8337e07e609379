package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online per-source token-budget admission — the ingest-time
  * counterpart of q145's batch token cap. The batch form REBALANCES a
  * corpus it can already see (md5-priority order, cap derived from
  * global totals); an ingest worker has neither the future nor the
  * global totals, so the online form is what production pipelines
  * actually run at the door: a FIXED per-source budget (set from the
  * last q145 audit) and greedy arrival-order admission — every doc is
  * admitted iff its source's running token total stays within budget,
  * and the verdict is emitted the batch the doc arrives.
  *
  * Semantics pinned by CapStreamSpec: verdicts equal a plain fold over
  * the arrival order (within a micro-batch, doc_id order — the
  * deterministic tiebreak for simultaneous arrivals); a rejected doc
  * NEVER un-rejects (no retroactivity — admission is arrival-time
  * truth, exactly like NoveltyStream's novelty); cum_tokens never
  * exceeds the budget; and state survives micro-batch boundaries (the
  * same docs split differently admit identically as long as arrival
  * order is preserved).
  *
  * Scale: state is ONE long per source — constant forever; each
  * micro-batch shuffles one narrow (source, doc_id, n_tokens) row per
  * arrival. The per-source sequential walk is inherent to the
  * semantics (a budget is a serial resource); sources are independent,
  * so parallelism = |sources|, the same key-parallel shape every
  * flatMapGroupsWithState monitor in the repo has. */
object CapStream {

  final case class Doc(doc_id: Long, source: String, n_tokens: Long)

  final case class Verdict(
      doc_id: Long, source: String, admitted: Boolean, cum_tokens: Long)

  def verdicts(spark: SparkSession, docs: Dataset[Doc], budget: Long): Dataset[Verdict] = {
    import spark.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, Verdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[Doc], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val admit = cum + d.n_tokens <= budget
            if (admit) cum += d.n_tokens
            Verdict(d.doc_id, src, admit, cum)
          }
          state.update(cum)
          out.iterator
      }
  }
}
