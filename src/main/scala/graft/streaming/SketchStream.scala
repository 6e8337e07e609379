package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online Count-Min maintenance — the streaming half of q136's
  * heavy-hitters sketch, exactly as q74's HLL and the drift monitor
  * pair batch reports with standing monitors. Documents stream in;
  * each micro-batch folds its token counts into the standing d×w cell
  * state and emits every TOUCHED cell's refreshed count, so after any
  * stream prefix the emitted cells equal the batch sketch over exactly
  * the docs seen so far (SketchStreamSpec holds this bit-for-bit,
  * including micro-batch-boundary invariance). An ingest pipeline
  * reads current estimates straight off the latest cell values — no
  * corpus rescan — and the same additive state merges with any batch
  * sketch by +.
  *
  * Zero hash drift by construction: [[bucket]] is the scalar twin of
  * the batch query's `conv(substr(md5("r:tok"), 1, 12), 16, 10) % w`
  * column — same digest, same 48-bit prefix, same modulus — and the
  * spec pins scalar == column on real tokens.
  *
  * Scale: state is at most d·w cells (2048 longs) REGARDLESS of
  * stream length — the whole point of sketching the stream; arrivals
  * shuffle once keyed (r, bucket) with map-side pre-aggregation done
  * by the groupByKey fold itself. */
object SketchStream {

  final case class Doc(doc_id: Long, text: String)
  final case class CellUpdate(r: Int, bkt: Int, n: Long)

  private[streaming] val D = 4
  private[streaming] val W = 512

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Scalar twin of q136's bucket column (48-bit md5 prefix mod w). */
  private[streaming] def bucket(r: Int, tok: String): Int =
    (java.lang.Long.parseLong(md5hex(s"$r:$tok").take(12), 16) % W).toInt

  /** Per-micro-batch cell accumulator: docs → token counts → (r, bkt)
    * increments → stateful fold. Emits each touched cell once per
    * micro-batch with its new total. */
  def cells(spark: SparkSession, docs: Dataset[Doc]): Dataset[CellUpdate] = {
    import spark.implicits._
    docs
      .flatMap { d =>
        d.text.split(" ", -1).iterator.flatMap(tok =>
          (0 until D).iterator.map(r => ((r, bucket(r, tok)), 1L)))
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, CellUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Int), rows: Iterator[((Int, Int), Long)], state: GroupState[Long]) =>
          val add = rows.map(_._2).sum
          val n = state.getOption.getOrElse(0L) + add
          state.update(n)
          Iterator.single(CellUpdate(key._1, key._2, n))
      }
  }

  /** Point estimate off a settled cell map — min over the token's d
    * cells (absent cell = 0: nothing hashed there yet). */
  def estimate(cells: Map[(Int, Int), Long], tok: String): Long =
    (0 until D).map(r => cells.getOrElse((r, bucket(r, tok)), 0L)).min
}
