package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_minhash_hex(s, n)` — the n-slot MinHash signature of a group
  * of strings as ONE bounded aggregate: slot h holds
  * min over the group of md5(h + ":" + s), emitted as the familiar
  * lowercase-hex strings, value-identical to the composed builtin form
  * `min(element_at(graft_md5_keyed(s, n), h+1))` / the oracle's
  * `min(md5(h || ':' || s))` (lowercase hex is byte-monotonic, so the
  * byte-wise minimum of raw digests IS the lexicographic minimum of
  * their hex encodings — MinHashHexSpec pins all three forms equal).
  *
  * Why an aggregate and not the expression + 64 string mins: the
  * per-SOURCE signature build (q135's `src_minhash_sigs`, reference
  * src/analytics scale audit) runs 64 digests over every distinct
  * 8-gram in the corpus — at the 100× replica ~20M grams × 64, and the
  * composed form materializes, PER GRAM, 64 hex UTF8Strings + an array
  * + 64 var-length min-buffer updates through the hash-agg row. That
  * allocation traffic, not the MD5 arithmetic, dominated the 180–245 s
  * cold first-touch. This kernel folds each digest straight into a
  * fixed n×16-byte buffer (one reused MessageDigest, one scratch
  * digest, byte compares) and allocates the hex strings once per GROUP
  * at eval — state is O(n), groups are |sources|-scale, and the map
  * side partial-aggregates so the exchange moves one buffer per
  * (task, source).
  */
case class MinHashHex(
    child: Expression,
    n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinHashHex.Buf]
    with UnaryLike[Expression] {

  require(n >= 1 && n <= 64, s"graft_minhash_hex key count must be in [1, 64], got $n")

  override def createAggregationBuffer(): MinHashHex.Buf = new MinHashHex.Buf(n)

  override def update(b: MinHashHex.Buf, input: InternalRow): MinHashHex.Buf = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[UTF8String].getBytes)
    b
  }

  override def merge(b: MinHashHex.Buf, o: MinHashHex.Buf): MinHashHex.Buf = {
    b.mergeFrom(o)
    b
  }

  /** n lowercase-hex digests, h-indexed; null on an all-null group
    * (matches `min`'s contract). */
  override def eval(b: MinHashHex.Buf): Any =
    if (!b.any) null
    else {
      val out = new Array[Any](n)
      var h = 0
      while (h < n) {
        val hex = new Array[Byte](32)
        var i = 0
        while (i < 16) {
          val d = b.mins(h * 16 + i)
          hex(2 * i) = Md5KeyedKernel.hexBytes((d >> 4) & 0xf)
          hex(2 * i + 1) = Md5KeyedKernel.hexBytes(d & 0xf)
          i += 1
        }
        out(h) = UTF8String.fromBytes(hex)
        h += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(b: MinHashHex.Buf): Array[Byte] = {
    val out = new Array[Byte](1 + b.mins.length)
    out(0) = if (b.any) 1 else 0
    System.arraycopy(b.mins, 0, out, 1, b.mins.length)
    out
  }

  override def deserialize(bytes: Array[Byte]): MinHashHex.Buf = {
    val b = new MinHashHex.Buf(n)
    b.any = bytes(0) == 1
    System.arraycopy(bytes, 1, b.mins, 0, b.mins.length)
    b
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_hex requires a string input, got ${child.dataType.catalogString}")
  override def prettyName: String = "graft_minhash_hex"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashHex =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashHex =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashHex =
    copy(child = newChild)
}

object MinHashHex {

  // one scratch digest per executor thread — insert() writes each of
  // the n digests here before the byte-compare against the buffer
  private val localScratch =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  /** n×16-byte raw-digest minima. Raw-byte unsigned comparison orders
    * exactly as the lowercase-hex encoding does (each byte maps to two
    * hex chars monotonically), so minima can be kept in digest form
    * and hex-encoded once at eval. */
  final class Buf(n: Int) {
    val mins = new Array[Byte](n * 16)
    var any = false

    def insert(s: Array[Byte]): Unit = {
      val md = Md5KeyedKernel.localMd.get()
      val scratch = localScratch.get()
      var h = 0
      while (h < mins.length / 16) {
        md.reset()
        md.update(Md5KeyedKernel.prefixes(h))
        md.update(s)
        md.digest(scratch, 0, 16)
        if (!any) System.arraycopy(scratch, 0, mins, h * 16, 16)
        else if (lessThan(scratch, 0, mins, h * 16))
          System.arraycopy(scratch, 0, mins, h * 16, 16)
        h += 1
      }
      any = true
    }

    def mergeFrom(o: Buf): Unit =
      if (o.any) {
        if (!any) { System.arraycopy(o.mins, 0, mins, 0, mins.length); any = true }
        else {
          var h = 0
          while (h < mins.length / 16) {
            if (lessThan(o.mins, h * 16, mins, h * 16))
              System.arraycopy(o.mins, h * 16, mins, h * 16, 16)
            h += 1
          }
        }
      }

    private def lessThan(a: Array[Byte], ai: Int, b: Array[Byte], bi: Int): Boolean = {
      var i = 0
      while (i < 16) {
        val x = a(ai + i) & 0xff
        val y = b(bi + i) & 0xff
        if (x != y) return x < y
        i += 1
      }
      false
    }
  }
}
