package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cavnar-Trenkle n-gram-profile language ID (`langid_ngram(text)`) — the
  * classic rank-order method behind production language filters, as ONE
  * codegen'd map expression: each document's top-[[LangIdNgram.ProfileSize]]
  * character 1-3-grams (by count, ties lexicographic) are ranked in-row
  * and compared to per-language reference profiles with the OUT-OF-PLACE
  * measure (Σ |doc rank − profile rank|, missing grams pay the max
  * penalty). Everything is integer arithmetic over frozen profiles —
  * deterministic, shuffle-free, linear in document bytes.
  *
  * Reference profiles are built BY THE SAME CODE from small seed texts
  * compiled in below (the stopword-list langid's model-based sibling; at
  * production scale the seeds are per-language training slices and the
  * profile build is the same one-pass fold). Evaluates to
  * `[dist_en, dist_es, dist_de, dist_fr, langIdx]` where langIdx indexes
  * [[LangIdNgram.Languages]] (argmin, ties to the earlier language).
  */
case class LangIdNgram(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"langid_ngram needs string, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    LangIdNgram.scores(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdNgram.scores($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdNgram {
  val Languages: Seq[String] = Seq("en", "es", "de", "fr")
  val ProfileSize = 100

  // Small seed texts (author-written everyday sentences; the point is the
  // CHARACTER-gram statistics, which a few hundred characters pin well for
  // rank-order profiles).
  private val seeds: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog while the children " +
      "are reading their books in the garden and the weather is very nice " +
      "this morning because the sun is shining and there is no rain at all " +
      "we should walk to the market and buy some bread and fresh water"),
    "es" -> ("el rapido zorro marron salta sobre el perro perezoso mientras " +
      "los ninos estan leyendo sus libros en el jardin y el tiempo es muy " +
      "bueno esta manana porque el sol brilla y no hay lluvia deberiamos " +
      "caminar hasta el mercado y comprar un poco de pan y agua fresca"),
    "de" -> ("der schnelle braune fuchs springt ueber den faulen hund " +
      "waehrend die kinder ihre buecher im garten lesen und das wetter " +
      "heute morgen sehr schoen ist weil die sonne scheint und es gar " +
      "keinen regen gibt wir sollten zum markt laufen und etwas brot und " +
      "frisches wasser kaufen"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux " +
      "pendant que les enfants lisent leurs livres dans le jardin et le " +
      "temps est tres beau ce matin parce que le soleil brille et il ne " +
      "pleut pas du tout nous devrions marcher jusqu au marche et acheter " +
      "du pain et de l eau fraiche"))

  /** Ranked profile of a text: gram → rank (0-based), top `ProfileSize`
    * character 1-3-grams by (count DESC, gram ASC). Grams are CODE-POINT
    * windows (matching CharBigrams/LmDocScore's iteration), so non-BMP
    * characters stay whole instead of splitting into lone surrogates. */
  def profile(text: String): java.util.HashMap[String, Integer] = {
    val counts = new java.util.HashMap[String, Array[Long]]()
    // code-point start offsets (UTF-16 indices), one sentinel at the end
    val len = text.length
    val starts = new Array[Int](text.codePointCount(0, len) + 1)
    var off = 0
    var np = 0
    while (off < len) {
      starts(np) = off
      off += Character.charCount(text.codePointAt(off))
      np += 1
    }
    starts(np) = len
    var i = 0
    while (i < np) {
      var n = 1
      while (n <= 3 && i + n <= np) {
        val g = text.substring(starts(i), starts(i + n))
        val cell = counts.get(g)
        if (cell == null) counts.put(g, Array(1L)) else cell(0) += 1
        n += 1
      }
      i += 1
    }
    val entries = new java.util.ArrayList[java.util.Map.Entry[String, Array[Long]]](
      counts.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val ranked = new java.util.HashMap[String, Integer]()
    var r = 0
    val itN = entries.iterator()
    while (itN.hasNext && r < ProfileSize) {
      ranked.put(itN.next().getKey, r)
      r += 1
    }
    ranked
  }

  private val langProfiles: Array[java.util.HashMap[String, Integer]] =
    Languages.map(l => profile(seeds(l))).toArray

  /** Out-of-place distance of `docProfile` against language `li`. */
  private def outOfPlace(doc: java.util.HashMap[String, Integer], li: Int): Long = {
    val ref = langProfiles(li)
    var d = 0L
    val it = doc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val rr = ref.get(e.getKey)
      d += (if (rr == null) ProfileSize.toLong
            else math.abs(e.getValue.intValue() - rr.intValue()).toLong)
    }
    d
  }

  /** [dist_en, dist_es, dist_de, dist_fr, argminIdx]. Static so
    * interpreted eval and generated code share the arithmetic. */
  def scores(text: UTF8String): GenericArrayData = {
    val doc = profile(text.toString)
    val out = new Array[Long](Languages.length + 1)
    var best = 0
    var i = 0
    while (i < Languages.length) {
      out(i) = outOfPlace(doc, i)
      if (out(i) < out(best)) best = i
      i += 1
    }
    out(Languages.length) = best.toLong
    new GenericArrayData(out)
  }
}
