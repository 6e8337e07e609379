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
  * scaled by n is M = n·G − S·Sᵀ, which has the same eigenvectors as
  * the covariance. M's entries grow as n² and the power-iteration
  * products as n²·10⁶, so [[topDir]] evaluates them in arbitrary
  * precision (BigInt — the cost is d² driver-side multiplies per
  * micro-batch, nothing distributed) and only the final milli-scale
  * iterate / ppm share are truncated back to 64 bits. The one
  * remaining ceiling is the Long STATE itself: Σx² per cell grows as
  * n·10⁶ for milli-scale unit-norm codes, so the state is exact up to
  * n ≈ 9·10¹² vectors — beyond any single stream's horizon; shard by
  * key and [[merge]] before then.
  *
  * Scale: arrivals contribute d² multiply-adds map-side; the single
  * grouping key is fine because the PER-BATCH fold is O(batch·d²)
  * and the state O(d²) — for wide fan-in, accumulate per partition
  * and [[merge]] the partial states (pure +), the same lambda
  * pairing the sketch family uses. */
object GramStream {

  final case class Vec(vec_id: Long, q: Array[Long])

  /** Emitted when the state changes: vectors seen, total per-vector
    * variance (trace(M) DIV n² — milli² units; n-invariant so it fits
    * 64 bits at any stream length, unlike raw trace(M) which grows as
    * n²), the 12-step power iterate (milli scale), and the
    * direction's explained variance share in ppm. */
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

  /** M = n*G - S*S^T (the n-scaled centered scatter), its n²-scaled
    * trace, and the q156-style power iterate + explained share, off
    * the state alone. All products involving M run in BigInt — M's
    * entries reach ~2n²·10⁶ for milli-scale codes, past 2⁶³ at
    * n ≈ 10⁴ vectors, so 64-bit arithmetic here would silently wrap
    * on an unbounded stream. Cost is O(d²) driver-side big-multiplies
    * per emit; the distributed side never touches M. */
  private[streaming] def topDir(st: Array[Long]): TopDir = {
    val n = st(0)
    def m(j: Int, k: Int): BigInt =
      BigInt(n) * BigInt(st(1 + D + j * D + k)) -
        BigInt(st(1 + j)) * BigInt(st(1 + k))
    // power iterate: v stays milli-scale Long (|v| <= 1000); the
    // matrix-vector product and max-abs renormalization are exact
    var v = Array.fill(D)(1000L)
    for (_ <- 1 to Iters) {
      val raw = Array.tabulate(D)(k =>
        (0 until D).map(j => m(j, k) * v(j)).sum)
      val mx = raw.map(_.abs).max.max(BigInt(1))
      v = raw.map(x => (x * 1000 / mx).toLong)
    }
    val traceM = (0 until D).map(j => m(j, j)).sum // >= 0: n^2 * total variance
    // explained share, exact: ppm = (v^T M v * 1e6) / (trace * ||v||^2)
    val a = (0 until D).map(k =>
      (0 until D).map(j => m(j, k) * v(j)).sum * v(k)).sum
    val vn = BigInt(v.map(x => x * x).sum)
    val ppm =
      if (traceM <= 0) 0L else (a.max(BigInt(0)) * 1000000 / (traceM * vn)).toLong
    val traceOut = if (n <= 0) 0L else (traceM / (BigInt(n) * BigInt(n))).toLong
    TopDir(n, traceOut, v.toSeq, ppm)
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
