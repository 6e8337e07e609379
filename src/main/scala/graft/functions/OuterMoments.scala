package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_outer_moments(q, d)` — the exact integer raw second-moment
  * block of a group of d-vectors as ONE bounded aggregate. The result
  * array has d²+d+1 cells, row-major: cell j*d+k = Σ qⱼ·qₖ (the raw
  * Gram), cells d²..d²+d−1 = Σ qⱼ (per-dim sums), cell d²+d = the row
  * count — everything an ABTT-style audit (q156, reference
  * src/analytics embedding diagnostics) needs to center the Gram
  * exactly driver-side.
  *
  * Why an aggregate and not the composed HOF form: the builtin route
  * (`posexplode(concat(flatten(transform(q, a -> transform(q, b ->
  * a*b))), q, array(1)))` + hash-agg) materializes, PER ROW, a nested
  * d-array-of-d-arrays, a flattened (d²+d+1)-element array, and d²+d+1
  * exploded InternalRows through the aggregate hash map — N·d² row
  * traffic for N·d² multiply-adds of actual work. This kernel fuses
  * the outer product straight into a fixed (d²+d+1)-long buffer (zero
  * intermediate rows, zero allocation per input row), partial-
  * aggregates map-side (ObjectHashAggregate), and moves one ~33 KB
  * buffer per (task, group) through the exchange. Groups are
  * label-domain-scale, so state is bounded regardless of N.
  */
case class OuterMoments(
    child: Expression,
    d: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(d >= 1 && d <= 256,
    s"graft_outer_moments dimension must be in [1, 256], got $d")

  private def cells: Int = d * d + d + 1

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() != d)
        throw new IllegalArgumentException(
          s"graft_outer_moments($d): input vector has ${a.numElements()} elements")
      // index the ArrayData directly — toLongArray would copy the
      // vector into a fresh array per input row in the one hot loop
      // this kernel exists to keep allocation-free. getLong on a null
      // element silently reads 0 (or an uninitialized word for
      // UnsafeArrayData), so a cheap O(d) null sweep guards the O(d²)
      // unchecked loop for SQL callers whose arrays carry nulls —
      // q156's transform output is null-free, arbitrary callers aren't.
      var p = 0
      while (p < d) {
        if (a.isNullAt(p))
          throw new IllegalArgumentException(
            s"graft_outer_moments($d): input vector has a NULL element at index $p")
        p += 1
      }
      var j = 0
      while (j < d) {
        val qj = a.getLong(j)
        val row = j * d
        var k = 0
        while (k < d) { buf(row + k) += qj * a.getLong(k); k += 1 }
        buf(d * d + j) += qj
        j += 1
      }
      buf(cells - 1) += 1L
    }
    buf
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { b(i) += o(i); i += 1 }
    b
  }

  /** The (d²+d+1)-cell moment array; an all-null / empty group yields
    * the zero array (count cell 0), never null — callers branch on the
    * count, matching how the composed form's absent cells read as 0. */
  override def eval(b: Array[Long]): Any = new GenericArrayData(b.clone())

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(cells * 8)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](cells)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_outer_moments requires ARRAY<BIGINT>, got ${t.catalogString}")
  }
  override def prettyName: String = "graft_outer_moments"

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): OuterMoments =
    copy(child = newChild)
}
