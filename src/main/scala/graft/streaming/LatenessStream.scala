package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online watermark-lateness monitoring — the streaming half of
  * q160's sizing table, run AGAINST the live stream so the delay
  * choice can be revisited after deployment: constant state (the
  * running event-time max plus one counter row per ladder rung)
  * folds each micro-batch in arrival order and emits the refreshed
  * audit rows. After any stream prefix the emissions equal batch
  * q160 over exactly the events seen so far — same drop rule (late
  * iff event time > delay behind the running max), same exact-µs
  * arithmetic — pinned by LatenessStreamSpec including micro-batch-
  * boundary invariance (the running max is fold-order state, so the
  * batching cannot change it as long as arrival order is preserved).
  *
  * Scale: state is 4 counters + 2 longs REGARDLESS of stream length.
  * The stream is keyed by a single global watermark domain (one
  * group) exactly as Structured Streaming's own watermark is global —
  * the fold is per-arrival O(1); a sharded variant would key by
  * stream partition and merge maxes, trading exactness of the global
  * max within a batch. */
object LatenessStream {

  final case class Ev(event_id: Long, tus: Long)
  final case class LState(maxTus: Long, n: Long, outOfOrder: Long,
      maxLateUs: Long, dropped: Map[Long, Long])
  final case class LatenessRow(delay_sec: Long, n_events: Long,
      out_of_order_events: Long, dropped_events: Long, dropped_ppm: Long,
      max_late_sec: Long)

  private[streaming] val LadderSec = Seq(60L, 300L, 900L, 3600L)

  /** Fold a micro-batch (processed in event_id order within the
    * batch) into the standing state; emit one refreshed row per
    * ladder rung. */
  def audit(spark: SparkSession, events: Dataset[Ev]): Dataset[LatenessRow] = {
    import spark.implicits._
    events
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[LState, LatenessRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Int, rows: Iterator[Ev], state: GroupState[LState]) =>
          val st0 = state.getOption.getOrElse(
            LState(Long.MinValue, 0L, 0L, 0L, LadderSec.map(_ -> 0L).toMap))
          var maxTus = st0.maxTus
          var n = st0.n
          var ooo = st0.outOfOrder
          var maxLate = st0.maxLateUs
          var dropped = st0.dropped
          rows.toSeq.sortBy(_.event_id).foreach { e =>
            val late = if (maxTus == Long.MinValue) 0L else math.max(0L, maxTus - e.tus)
            n += 1
            if (late > 0L) ooo += 1
            if (late > maxLate) maxLate = late
            dropped = dropped.map { case (d, c) =>
              d -> (c + (if (late > d * 1000000L) 1L else 0L))
            }
            if (e.tus > maxTus) maxTus = e.tus
          }
          state.update(LState(maxTus, n, ooo, maxLate, dropped))
          LadderSec.iterator.map(d => LatenessRow(d, n, ooo, dropped(d),
            if (n > 0) dropped(d) * 1000000L / n else 0L, maxLate / 1000000L))
      }
  }
}
