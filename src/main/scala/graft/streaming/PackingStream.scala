package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of q75's bucketed sequence packing — ONLINE packing:
  * documents arrive continuously, and each is assigned to the training
  * pack containing its start offset the moment it arrives. State per
  * bucket is a single Long (cumulative token count), the minimum
  * possible; the assignment rule — pack = start div budget over the
  * running sum — is the exact batch rule, so for an in-order source the
  * stream reproduces the batch assignment row-for-row
  * (PackingStreamSpec pins this, including across micro-batch splits).
  *
  * Scale: state is O(#buckets) Longs; arrivals shuffle once by bucket
  * (the same exchange the batch window pays). An out-of-order source
  * reorders docs within a pack boundary — the usual lambda split
  * applies (stream for live packing, batch q75 for the settled
  * authoritative layout). */
object PackingStream {

  final case class DocTok(doc_id: Long, bucket: Long, tok: Long)
  final case class PackAssign(bucket: Long, doc_id: Long, pack: Long)

  def assignPacks(
      spark: SparkSession,
      docs: Dataset[DocTok],
      budget: Long = 2048L): Dataset[PackAssign] = {
    import spark.implicits._
    docs.groupByKey(_.bucket)
      .flatMapGroupsWithState[Long, PackAssign](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket: Long, rows: Iterator[DocTok], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          // doc_id order within the micro-batch: the batch rule's order
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val start = cum
            cum += d.tok
            PackAssign(bucket, d.doc_id, start / budget)
          }
          state.update(cum)
          out.iterator
      }
  }
}
