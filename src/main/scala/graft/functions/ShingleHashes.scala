package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

import java.util.Arrays

/** Sorted-distinct xxHash64 values of every `k`-word shingle of a string —
  * single pass: tokenize on whitespace runs, join each k-word window with a
  * single space (the canonical form `concat_ws(' ', ...)` produces), hash,
  * sort, dedupe. The word-shingle analogue of [[NgramHashes]]; feeds
  * [[MinHashSignature]] and [[SortedJaccard]] without materializing any
  * intermediate string arrays.
  */
case class ShingleHashes(child: Expression, k: Int, seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"shingle_hashes needs string, got $dt")
  }

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[UTF8String], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($s, $k, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val Empty = new GenericArrayData(Array.empty[Long])

  /** Static kernel (callable from generated code). Whitespace = the ASCII
    * class `\s` matches; multi-byte UTF-8 units are never whitespace. */
  def compute(s: UTF8String, k: Int, seed: Long): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // word boundaries
    var nW = 0
    val starts = new Array[Int](n / 2 + 1)
    val ends = new Array[Int](n / 2 + 1)
    var i = 0
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        starts(nW) = i
        while (i < n && !isSpace(bytes(i))) i += 1
        ends(nW) = i
        nW += 1
      }
    }
    val cnt = nW - k + 1
    if (cnt <= 0) return Empty
    val scratch = new Array[Byte](n + k)
    val h = new Array[Long](cnt)
    var w = 0
    while (w < cnt) {
      // canonical shingle: words w..w+k-1 joined by single spaces
      var len = 0
      var j = w
      while (j < w + k) {
        if (j > w) { scratch(len) = ' '; len += 1 }
        val wl = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), scratch, len, wl)
        len += wl
        j += 1
      }
      h(w) = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, seed)
      w += 1
    }
    Arrays.sort(h)
    var o = 1
    var r = 1
    while (r < cnt) {
      if (h(r) != h(o - 1)) { h(o) = h(r); o += 1 }
      r += 1
    }
    new GenericArrayData(if (o == cnt) h else Arrays.copyOf(h, o))
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b
}
