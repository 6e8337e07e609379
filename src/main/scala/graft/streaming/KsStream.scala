package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming two-sample KS monitor — the binless companion to
  * EventStreams.startDriftMonitor exactly as batch q133 is to q88/q89:
  * the PSI monitor scores each micro-batch's histogram against the
  * reference through FIXED reference-window buckets, so drift INSIDE a
  * bucket is invisible and per-batch scores jitter with batch size;
  * this monitor accumulates the current window's centi-quantized value
  * counts per type and emits, every micro-batch, the exact KS distance
  * of EVERYTHING seen so far against the static reference CDF. After
  * any stream prefix the report equals batch q133 computed over
  * (reference window, streamed prefix) — KsStreamSpec pins it per
  * batch, bit for bit.
  *
  * State per type is the quantized-value grid (bounded by the value
  * range × 100 — q133's scale argument, constant in stream length, not
  * rows); the reference rides as a closure of per-type sorted
  * (vq, count) arrays — grid-bounded kilobytes, the persisted output
  * of the batch reference side, like the PSI monitor's `ref` frame.
  * Quantization (⌊100·v⌋) and the cross-multiplied integer max-gap are
  * the batch q133 arithmetic verbatim, so monitor and batch can never
  * disagree about the same data. */
object KsStream {

  final case class Obs(event_type: String, value: Double)
  final case class KsReport(event_type: String, n_cur: Long, ks_ppm: Long)

  private[streaming] def quant(v: Double): Long = math.floor(v * 100).toLong

  /** Exact KS in ppm between a sorted reference grid (vq → count) and
    * a current-count map — the scalar twin of q133's windowed
    * cross-product max (|cum_ref·N_cur − cum_cur·N_ref| over the merged
    * grid, one integer division at the end). */
  private[streaming] def ksPpm(
      ref: IndexedSeq[(Long, Long)],
      cur: collection.Map[Long, Long]): (Long, Long) = {
    val nr = ref.iterator.map(_._2).sum
    val nc = cur.valuesIterator.sum
    if (nr == 0L || nc == 0L) return (nc, 0L)
    val grid = (ref.iterator.map(_._1) ++ cur.keysIterator).toSeq.distinct.sorted
    val refMap = ref.toMap
    var cr = 0L; var cc = 0L; var best = 0L
    grid.foreach { v =>
      cr += refMap.getOrElse(v, 0L)
      cc += cur.getOrElse(v, 0L)
      best = math.max(best, math.abs(cr * nc - cc * nr))
    }
    (nc, best * 1000000L / (nr * nc))
  }

  /** Per-micro-batch cumulative KS reports. `ref` is the per-type
    * reference grid: sorted (centi-value, count). Types absent from
    * the reference report ks_ppm 0 with their running count — the
    * new-type alarm belongs to the PSI monitor's left-join path; KS
    * compares shapes and keeps its both-windows contract explicit
    * (q133's convention). */
  def reports(
      spark: SparkSession,
      obs: Dataset[Obs],
      ref: Map[String, IndexedSeq[(Long, Long)]]): Dataset[KsReport] = {
    import spark.implicits._
    obs
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Map[Long, Long], KsReport](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (t: String, rows: Iterator[Obs], state: GroupState[Map[Long, Long]]) =>
          var cur = state.getOption.getOrElse(Map.empty[Long, Long])
          rows.foreach { o =>
            val q = quant(o.value)
            cur = cur.updated(q, cur.getOrElse(q, 0L) + 1L)
          }
          state.update(cur)
          val (nc, ks) = ref.get(t) match {
            case Some(grid) => ksPpm(grid, cur)
            case None       => (cur.valuesIterator.sum, 0L)
          }
          Iterator.single(KsReport(t, nc, ks))
      }
  }
}
