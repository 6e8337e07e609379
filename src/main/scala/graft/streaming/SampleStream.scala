package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online stratified priority sampling — the streaming twin of q57's
  * per-language exact-k sample, completing the batch↔stream pairing
  * the sketch family already has (q136↔SketchStream, q88↔PsiStream).
  * A mixture designer can read a LIVE uniform sample per stratum off
  * an ingest stream without ever re-scanning the corpus.
  *
  * The correctness trick is that q57's sample is a PRIORITY sample: a
  * doc's rank key (md5(doc_id), doc_id) is a pure function of the doc,
  * so "the k smallest keys of everything seen so far" is a function of
  * the SET of arrivals — independent of arrival order and micro-batch
  * boundaries. Bounded per-key state (≤ k entries per stratum) makes
  * it a legal flatMapGroupsWithState stream; settled state ==
  * batch-q57 over the same docs, bit-for-bit, after ANY prefix
  * (SampleStreamSpec pins this, plus boundary invariance and the
  * no-churn silence of a batch that displaces nothing).
  *
  * Scale: state is k·16-byte priorities per stratum — constant in
  * stream length; each micro-batch shuffles one (lang, priority) pair
  * per arrival (map-side nothing to combine, but rows are 24 bytes);
  * emission happens only when the sample actually changes, so a
  * settled stream is silent. This is exactly the distributed-reservoir
  * alternative production samplers use when order-robust determinism
  * matters (a classic reservoir's state depends on arrival order;
  * a priority sample's cannot). */
object SampleStream {

  final case class Doc(doc_id: Long, lang: String)

  /** One stratum's refreshed sample, emitted when it changes:
    * doc_ids in priority (= q57 rank) order. */
  final case class Sample(lang: String, doc_ids: Seq[Long])

  private[streaming] val K = 20

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Scalar twin of q57's rank key (md5 of the decimal doc_id). */
  private[streaming] def pri(docId: Long): (String, Long) =
    (md5hex(docId.toString), docId)

  def samples(spark: SparkSession, docs: Dataset[Doc]): Dataset[Sample] = {
    import spark.implicits._
    docs
      .map(d => (d.lang, d.doc_id))
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(String, Long)], Sample](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (lang: String, rows: Iterator[(String, Long)],
         state: GroupState[List[(String, Long)]]) =>
          val cur = state.getOption.getOrElse(Nil)
          val merged = (cur ++ rows.map(r => pri(r._2)).toList)
            .distinct.sorted.take(K)
          if (merged == cur) Iterator.empty
          else {
            state.update(merged)
            Iterator.single(Sample(lang, merged.map(_._2)))
          }
      }
  }
}
