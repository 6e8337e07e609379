package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded top-k aggregate over BIGINT values: keeps the k LARGEST
  * longs seen, emitted in descending order — `graft_topk(v, k)`.
  *
  * The selection problem this replaces is `row_number() OVER
  * (PARTITION BY g ORDER BY x DESC) <= k`: a WindowExec needs its
  * whole input SORTED per partition, which for a pair-stream input
  * (q157's within-cell kNN: ~N²/K rows) makes the sort the dominant
  * cost even when the exchange is already elided (measured ~25 s of
  * q157's 41 s at the 100× replica). A bounded aggregate does the
  * same selection in O(rows) with O(k) state per group — hash
  * aggregation, no sort, spill-safe (the sort-based fallback
  * serializes the k-long buffer like any other).
  *
  * Composite orderings pack into the single long: q157 packs
  * (sim-units, ¬bid) so "value desc" == "(sim DESC, bid ASC)" — any
  * lexicographic order over bounded integer components packs the same
  * way. Ties are exact: longs have a total order, so the aggregate
  * keeps exactly the rows the row_number form keeps.
  *
  * Buffer: an UNSORTED k-slot array with a tracked minimum — an
  * accepted value replaces the min (O(k) re-scan, k is small); a
  * rejected value costs one comparison, which is the common case once
  * the group warms up. Nulls are ignored (never produced by the q157
  * packing; contract matches count-style aggregates).
  */
case class TopKLongs(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKLongs.Buf]
    with UnaryLike[Expression] {

  require(k >= 1, s"graft_topk requires k >= 1, got $k")

  override def createAggregationBuffer(): TopKLongs.Buf = new TopKLongs.Buf(k)

  override def update(b: TopKLongs.Buf, input: InternalRow): TopKLongs.Buf = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKLongs.Buf, o: TopKLongs.Buf): TopKLongs.Buf = {
    var i = 0
    while (i < o.size) { b.insert(o.vals(i)); i += 1 }
    b
  }

  override def eval(b: TopKLongs.Buf): Any = new GenericArrayData(b.sortedDesc)

  override def serialize(b: TopKLongs.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKLongs.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKLongs.Buf(k)
    var i = 0
    while (i < n) { b.insert(bb.getLong); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk requires a BIGINT input, got ${child.dataType.catalogString}")
  override def prettyName: String = "graft_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKLongs =
    copy(child = newChild)
}

object TopKLongs {

  /** k-slot buffer: unsorted values + tracked min slot. */
  final class Buf(k: Int) {
    val vals = new Array[Long](k)
    var size = 0
    private var minIdx = 0

    def insert(v: Long): Unit = {
      if (size < k) {
        vals(size) = v
        if (size == 0 || v < vals(minIdx)) minIdx = size
        size += 1
      } else if (v > vals(minIdx)) {
        vals(minIdx) = v
        // re-find the minimum (k is small; rejected values — the
        // common case — never reach this scan)
        var i = 1
        minIdx = 0
        while (i < size) { if (vals(i) < vals(minIdx)) minIdx = i; i += 1 }
      }
    }

    def sortedDesc: Array[Long] = {
      val out = java.util.Arrays.copyOf(vals, size)
      java.util.Arrays.sort(out)
      // ascending → reverse in place
      var i = 0
      var j = size - 1
      while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
      out
    }
  }
}
