package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online IVF-index maintenance — the missing UPDATE half of the ANN
  * lifecycle: q42 builds and persists the coarse-quantizer index; this
  * keeps its cell statistics current as embeddings stream in. Each
  * arriving vector is assigned to its nearest FIXED reference centroid
  * (assignment against mutable state would make results depend on
  * micro-batch boundaries), and per-cell sufficient statistics
  * (count, component sums) accumulate in state; every micro-batch
  * emits the cells it touched with their refreshed mean — so after any
  * prefix of the stream, the emitted centroid equals ONE Lloyd update
  * step over exactly the vectors seen so far (the q42 `update` step,
  * incrementally). Re-seeding reference centroids from a refreshed
  * index is the batch job's business — the usual lambda split.
  *
  * Scale: state is K cells × (1 count + dim sums) — constant in the
  * stream length; arrivals shuffle once on cell id; the reference
  * centroids ride along as a closure (K·dim doubles, kilobytes).
  * Assignment uses the SAME rounded-cosine argmax rule as the batch
  * index build (sim rounded to 1e-6, ties to the lowest cell id), so
  * batch and stream can never disagree about a vector's cell. */
object CentroidStream {

  final case class Vec(vec_id: Long, v: Seq[Double])
  final case class Centroid(cell: Int, cv: Seq[Double])
  final case class CellUpdate(cell: Int, n: Long, centroid: Seq[Double])
  final case class CellState(n: Long, sums: Seq[Double])

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum

  private def rnd(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** The batch rule verbatim: rounded cosine argmax, ties to the
    * lowest cell id (IvfQueries.assign's window ordering). */
  private[streaming] def assignCell(v: Seq[Double], centroids: Seq[Centroid]): Int = {
    val nrm = math.sqrt(dot(v, v))
    centroids.map { c =>
      val cnrm = math.sqrt(dot(c.cv, c.cv))
      (-rnd(dot(v, c.cv) / (nrm * cnrm)), c.cell)
    }.min._2
  }

  /** Streaming sufficient-statistics accumulator. Arrivals are folded
    * in vec_id order within each micro-batch so the running component
    * sums are a deterministic left fold over the stream order —
    * CentroidStreamSpec holds the result exactly equal to the batch
    * one-step Lloyd update over every vector seen. */
  def updates(
      spark: SparkSession,
      vecs: Dataset[Vec],
      centroids: Seq[Centroid]): Dataset[CellUpdate] = {
    import spark.implicits._
    vecs.map(r => (assignCell(r.v, centroids), r))
      .groupByKey(_._1)
      .flatMapGroupsWithState[CellState, CellUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (cell: Int, rows: Iterator[(Int, Vec)], state: GroupState[CellState]) =>
          val arr = rows.map(_._2).toSeq.sortBy(_.vec_id)
          val st = state.getOption.getOrElse(CellState(0L, Seq.empty))
          val sums = arr.foldLeft(
            if (st.sums.nonEmpty) st.sums.toArray else new Array[Double](arr.head.v.length)) {
            (acc, r) =>
              var i = 0
              while (i < acc.length) { acc(i) += r.v(i); i += 1 }
              acc
          }
          val n = st.n + arr.length
          state.update(CellState(n, sums.toSeq))
          Iterator.single(CellUpdate(cell, n, sums.map(x => rnd(x / n)).toSeq))
      }
  }
}
