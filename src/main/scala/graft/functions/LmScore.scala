package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lm_doc_score(text)` against a frozen bigram table — the scoring half
  * of text_lm_score as ONE codegen'd map expression: the trained LM is
  * charset²-bounded, so it collects to a small (gram → p_nano) table and
  * rides the plan as a reference object; each document then scores in a
  * single pass over its code points. Replaces the explode → broadcast
  * join → (doc_id) shuffle scoring pipeline with zero shuffles while
  * computing the IDENTICAL arithmetic: the sum of the same integer
  * nano-unit probabilities over the same code-point bigrams (grams absent
  * from the table are skipped from count and sum — inner-join
  * semantics). Evaluates to [n_bigrams, p_nano_sum].
  */
case class LmDocScore(child: Expression, grams: IndexedSeq[String], pNanos: IndexedSeq[Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lm_doc_score needs string, got $t")
  }

  // grams/pNanos are immutable IndexedSeqs (not Arrays) so case-class
  // equality is value-based and plan canonicalization can unify
  // identical lm_doc_score expressions
  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](grams.length * 2)
    var i = 0
    while (i < grams.length) { m.put(grams(i), pNanos(i)); i += 1 }
    m
  }

  override def nullSafeEval(v: Any): Any =
    LmDocScore.score(table, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmTable", table,
      "java.util.HashMap<String, Long>")
    // via MODULE$, not a static forwarder: the companion CLASS is the
    // Expression, whose inherited eval/score-shaped members can shadow
    // or suppress forwarders (Janino then resolves to eval(InternalRow)
    // and the whole stage falls back to interpreted — caught by
    // CodegenSpec on CharBigrams)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LmDocScore$$.MODULE$$.score($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `char_bigrams(text)` — all adjacent code-point pairs in one pass.
  * Equivalent to `transform(sequence(1, length-1), i -> substr(i, 2))`
  * but O(n): Spark's substr seeks from the string start, so the
  * transform-based phrasing is O(n²) per document — measurable pain on
  * long documents in the LM training pass. */
case class CharBigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_bigrams needs string, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    CharBigrams.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharBigrams$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharBigrams {
  def eval(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val len = s.length
    val out = new java.util.ArrayList[UTF8String]()
    if (len > 0) {
      var prev = 0
      var cur = prev + Character.charCount(s.codePointAt(prev))
      while (cur < len) {
        val next = cur + Character.charCount(s.codePointAt(cur))
        out.add(UTF8String.fromString(s.substring(prev, next)))
        prev = cur
        cur = next
      }
    }
    new GenericArrayData(out.toArray)
  }
}

object LmDocScore {
  /** One pass over code points (matching Spark substr's code-point
    * semantics, surrogate-pair safe). Static so interpreted eval and
    * generated code share the exact arithmetic. */
  def score(table: java.util.HashMap[String, java.lang.Long],
            text: UTF8String): GenericArrayData = {
    val s = text.toString
    var n = 0L
    var sum = 0L
    val len = s.length
    if (len > 0) {
      var prev = 0 // UTF-16 start of the previous code point
      var cur = prev + Character.charCount(s.codePointAt(prev))
      while (cur < len) {
        val next = cur + Character.charCount(s.codePointAt(cur))
        val g = s.substring(prev, next) // two code points
        val p = table.get(g)
        if (p != null) { n += 1; sum += p.longValue() }
        prev = cur
        cur = next
      }
    }
    new GenericArrayData(Array(n, sum))
  }
}
