package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online second-moment / top-direction maintenance — the streaming
  * twin of q156's ABTT audit, exactly as CentroidStream is to q42:
  * the (n, Σx, Σxxᵀ) sufficient statistics accumulate ADDITIVELY as
  * embeddings stream in (state = 1 + d + d² longs, constant forever,
  * mergeable across partitions/snapshots by +), and every micro-batch
  * the monitor re-derives the dominant principal direction with the
  * SAME 12-step integer power iteration as the batch audit — no
  * corpus rescan, ever.
  *
  * Exact centering without division: the centered scatter matrix
  * scaled by n is M = n·G − S·Sᵀ (exact BIGINTs), which has the same
  * eigenvectors as the covariance; the explained-share read divides
  * only at the very end through staged truncations sized so no
  * intermediate exceeds 2⁶³ (documented inline).
  *
  * Scale: arrivals contribute d² multiply-adds map-side; the single
  * grouping key is fine because the PER-BATCH fold is O(batch·d²)
  * and the state O(d²) — for wide fan-in, accumulate per partition
  * and [[merge]] the partial states (pure +), the same lambda
  * pairing the sketch family uses. */
object GramStream {

  final case class Vec(vec_id: Long, q: Array[Long])

  /** Emitted when the state changes: vectors seen, trace of the
    * scaled scatter M, the 12-step power iterate (milli scale), and
    * the direction's explained variance share in ppm. */
  final case class TopDir(n: Long, trace: Long, v: Seq[Long], explained_ppm: Long)

  private[streaming] val D = 64
  private[streaming] val Iters = 12

  /** State layout: [n, S(d), G(d*d) row-major]. */
  private[streaming] def empty: Array[Long] = new Array[Long](1 + D + D * D)

  private[streaming] def add(st: Array[Long], x: Array[Long]): Array[Long] = {
    st(0) += 1
    var i = 0
    while (i < D) {
      st(1 + i) += x(i)
      var j = 0
      while (j < D) { st(1 + D + i * D + j) += x(i) * x(j); j += 1 }
      i += 1
    }
    st
  }

  /** Partial-state composition: sufficient statistics add. */
  def merge(states: Seq[Array[Long]]): Array[Long] = {
    val out = empty
    states.foreach { s => var i = 0; while (i < out.length) { out(i) += s(i); i += 1 } }
    out
  }

  /** M = n*G - S*S^T (the n-scaled centered scatter), its trace, and
    * the q156 power iterate + explained share off the state alone. */
  private[streaming] def topDir(st: Array[Long]): TopDir = {
    val n = st(0)
    def m(j: Int, k: Int): Long =
      n * st(1 + D + j * D + k) - st(1 + j) * st(1 + k)
    var v = Array.fill(D)(1000L)
    for (_ <- 1 to Iters) {
      val raw = Array.tabulate(D)(k => (0 until D).map(j => m(j, k) * v(j)).sum)
      val mx = math.max(raw.map(math.abs).max, 1L)
      v = raw.map(x => math.signum(x) * (math.abs(x) * 1000L / mx))
    }
    val trace = (0 until D).map(j => m(j, j)).sum
    // v^T M v staged to stay in 64 bits: u = Mv (<= ~5e17/comp),
    // u6 = u DIV 1e6 (<= 5e11), A = sum v*u6 (<= 3e16),
    // ppm = (A DIV (trace DIV 1e6)) * 1e6 DIV ||v||^2
    val u6 = Array.tabulate(D)(k => (0 until D).map(j => m(j, k) * v(j)).sum / 1000000L)
    val a = (0 until D).map(k => v(k) * u6(k)).sum
    val vn = v.map(x => x * x).sum
    val t6 = math.max(trace / 1000000L, 1L)
    val ppm = math.max(0L, a / t6 * 1000000L / vn)
    TopDir(n, trace, v.toSeq, ppm)
  }

  def directions(spark: SparkSession, vecs: Dataset[Vec]): Dataset[TopDir] = {
    import spark.implicits._
    vecs
      .map(v => ("all", v))
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], TopDir](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, Vec)], state: GroupState[Array[Long]]) =>
          val st = state.getOption.getOrElse(empty)
          var changed = false
          rows.foreach { r => add(st, r._2.q); changed = true }
          if (!changed) Iterator.empty
          else {
            state.update(st)
            Iterator.single(topDir(st))
          }
      }
  }
}
