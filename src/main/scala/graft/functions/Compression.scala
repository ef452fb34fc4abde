package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate helper shared by interpreted eval and generated code.
  *
  * The Deflater is thread-local and `reset()` between rows: allocating a
  * native zlib stream per row would dominate the operator's cost, and
  * whole-stage codegen runs a partition on one thread, so a thread-local
  * is safe and allocation-free in the hot path.
  */
object DeflateUtil {
  /** raw deflate (nowrap — no zlib header/checksum, so tiny inputs aren't
    * dominated by framing), fixed default level + strategy */
  final val Level = 6

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(Level, /* nowrap = */ true)
  }
  private val bufLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** Compressed byte length of `bytes` under raw deflate at [[Level]].
    * Only the LENGTH is returned — the signal is the ratio, the payload
    * is discarded, so nothing large is materialized per row. */
  def deflatedLen(bytes: Array[Byte]): Long = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = bufLocal.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** Compressed size (raw deflate, level 6) of a string/binary column — the
  * classic compression-ratio quality signal for web-corpus filtering
  * (Gopher/Dolma-style): boilerplate and templated spam compress far
  * below natural text, (near-)random bytes barely compress at all, so
  * `deflate_len / octet_length` separates both tails cheaply.
  *
  * Runs inside whole-stage codegen as a static call into [[DeflateUtil]]
  * (thread-local native zlib stream, zero per-row allocation beyond the
  * input copy) — a pure map-stage signal at any scale.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"deflate_len needs string or binary, got $dt")
  }

  // def, not val: dataType is only legal on a RESOLVED child, and copy()
  // reconstructs this node during analysis while still unresolved
  private def isString = child.dataType == StringType

  override def nullSafeEval(v: Any): Any = {
    val bytes =
      if (isString) v.asInstanceOf[UTF8String].getBytes
      else v.asInstanceOf[Array[Byte]]
    DeflateUtil.deflatedLen(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      // the $-suffixed module CLASS owns MODULE$ — stripping the suffix
      // produced `DeflateUtil.MODULE$`, which Janino rightly rejected and
      // the operator silently ran interpreted (caught by CodegenSpec)
      val util = DeflateUtil.getClass.getName + ".MODULE$"
      val bytes = if (isString) s"$s.getBytes()" else s
      s"${ev.value} = $util.deflatedLen($bytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
