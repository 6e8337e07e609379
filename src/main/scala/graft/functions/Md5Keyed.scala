package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_md5_keyed(s, n)` — the n hex digests md5("0:"+s), md5("1:"+s),
  * …, md5((n−1)+":"+s) as one array, byte-identical to the builtin
  * `md5(concat(h, ':', s))` chain the minhash kernel uses (q25's 16
  * permutation hashes per shingle).
  *
  * The builtin path allocates, PER HASH: a concat'd UTF8String, its
  * getBytes copy, commons-codec's hex string, and a UTF8String wrap —
  * 16 × 4 allocations per shingle row. This kernel converts the input
  * to bytes ONCE, feeds a thread-local reused MessageDigest (prefix
  * bytes are precomputed constants), and hex-encodes ASCII bytes
  * directly into the UTF8String payload (no intermediate String) —
  * same digests, a fraction of the garbage. Per hash only the 16-byte
  * digest and the 32-byte hex payload remain as allocations. Values
  * are pinned against the builtin in Md5KeyedSpec, so the DuckDB
  * oracles (which replicate the same md5('h:' || s) family) are
  * untouched. */
object Md5KeyedKernel {

  private val MaxKeys = 64
  private[functions] val prefixes: Array[Array[Byte]] =
    (0 until MaxKeys).map(h => s"$h:".getBytes("UTF-8")).toArray
  private[functions] val hexBytes = "0123456789abcdef".getBytes("US-ASCII")
  // MessageDigest is stateful and not thread-safe; one per executor
  // thread, reset per hash, lives for the task's lifetime.
  private[functions] val localMd =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def hashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val md = localMd.get()
    val out = new Array[Any](n)
    var h = 0
    while (h < n) {
      md.reset()
      md.update(prefixes(h))
      md.update(bytes)
      val d = md.digest()
      // hex digits are ASCII, so the byte array IS valid UTF-8 payload
      val hex = new Array[Byte](32)
      var i = 0
      while (i < 16) {
        hex(2 * i) = hexBytes((d(i) >> 4) & 0xf)
        hex(2 * i + 1) = hexBytes(d(i) & 0xf)
        i += 1
      }
      out(h) = UTF8String.fromBytes(hex)
      h += 1
    }
    new GenericArrayData(out)
  }
}

case class Md5Keyed(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_md5_keyed requires a string, got ${child.dataType.catalogString}")
    else if (n < 1 || n > 64)
      TypeCheckResult.TypeCheckFailure(s"graft_md5_keyed key count must be in [1, 64], got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_md5_keyed"

  override protected def nullSafeEval(input: Any): Any =
    Md5KeyedKernel.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Md5KeyedKernel.hashes($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): Md5Keyed =
    copy(child = newChild)
}
