package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming k-center maintenance — Charikar et al. 1997's DOUBLING
  * algorithm ("Incremental clustering and dynamic information
  * retrieval"), the online companion to q155's batch greedy exactly as
  * SketchStream is to q136: a bounded set of ≤ K exemplar centers kept
  * live over an embedding stream, for pipelines that must hold a
  * diverse coreset of an ever-growing corpus without rescanning it.
  *
  * The invariant maintained: every vector seen so far is within the
  * current threshold R of some center (8-approximation of the optimal
  * k-center radius). Arrival rule: a vector farther than R from every
  * center becomes a center; when centers would exceed K, R doubles and
  * centers within R of an earlier center merge away — each survivor
  * is the LOWEST-vec_id member of its merge group, so the state is a
  * deterministic function of the arrival sequence (and the spec
  * replays it exactly).
  *
  * All state lives under ONE grouping key ("all") — k-center is a
  * global summary, the same single-group shape as the drift monitors'
  * per-type state; the work per arrival is K distance evaluations on
  * milli-integer codes (exact BIGINTs, q155's arithmetic verbatim).
  *
  * Scale: state is ≤ K code vectors + one radius — constant forever.
  * The single-key funnel serializes arrivals per micro-batch, which is
  * the algorithm (online k-center is inherently sequential); the
  * production move for higher throughput is per-partition doubling
  * followed by a centers-of-centers pass (the same algorithm over the
  * ≤ P·K partial centers), which this object's [[merge]] implements
  * for exactly that composition. */
object KCenterStream {

  final case class Vec(vec_id: Long, q: Array[Long])

  /** Emitted once per micro-batch that changed the state: the current
    * threshold and center ids (sorted). */
  final case class Coreset(r2: Long, center_ids: Seq[Long])

  private[streaming] val K = 8

  private[streaming] def d2(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** One arrival against (centers, r2) — the doubling rule. Returns
    * the updated state. Centers keep insertion order; merges keep the
    * lowest-id survivor per group (deterministic). */
  private[streaming] def offer(
      state: (List[Vec], Long), v: Vec): (List[Vec], Long) = {
    var (cs, r2) = state
    if (cs.exists(c => d2(c.q, v.q) <= r2)) (cs, r2)
    else {
      cs = cs :+ v
      while (cs.length > K) {
        r2 = math.max(r2 * 4, 1L) // doubling R doubles, R^2 quadruples
        // greedy sweep in id order: keep a center iff not within R of
        // an already-kept one
        val kept = scala.collection.mutable.ListBuffer[Vec]()
        cs.sortBy(_.vec_id).foreach { c =>
          if (!kept.exists(k => d2(k.q, c.q) <= r2)) kept += c
        }
        cs = kept.toList
      }
      (cs, r2)
    }
  }

  /** Centers-of-centers composition: run the same doubling over a
    * union of partial states (the per-partition scale-out pass). */
  def merge(states: Seq[(List[Vec], Long)]): (List[Vec], Long) = {
    val r0 = states.map(_._2).max
    states.flatMap(_._1).sortBy(_.vec_id)
      .foldLeft((List.empty[Vec], r0))(offer)
  }

  def coresets(spark: SparkSession, vecs: Dataset[Vec]): Dataset[Coreset] = {
    import spark.implicits._
    vecs
      .map(v => ("all", v))
      .groupByKey(_._1)
      .flatMapGroupsWithState[(List[Vec], Long), Coreset](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, Vec)],
         state: GroupState[(List[Vec], Long)]) =>
          val before = state.getOption.getOrElse((List.empty[Vec], 0L))
          val after = rows.map(_._2).toSeq.sortBy(_.vec_id)
            .foldLeft(before)(offer)
          if (after == before) Iterator.empty
          else {
            state.update(after)
            Iterator.single(
              Coreset(after._2, after._1.map(_.vec_id).sorted))
          }
      }
  }
}
