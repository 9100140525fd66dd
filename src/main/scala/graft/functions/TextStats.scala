package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics for the language-ID / quality / token
  * operators (SURVEY.md §2.2 rows 44-46).
  *
  * Returns a struct of integer counts from which every downstream
  * score is derived with cheap arithmetic:
  *
  *  - `n_chars`   ≡ `length(text)` (code points)
  *  - `n_kept`    ≡ `length(regexp_replace(text, '[^a-z0-9 ]', ''))`
  *  - `tok_total` ≡ `size(split(lower(text), ' '))`
  *  - `stop_XX`   ≡ `size(filter(split(lower(text),' '), t -> t in (stopwords_XX)))`
  *  - `n_ws`      ≡ `size(split(trim(text), '\\s+'))`
  *  - `n_bpe`     ≡ `size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0))`
  *
  * Each equivalence is to the exact Spark builtin-expression
  * formulation it replaces (and hence to the DuckDB oracle replay):
  * the counts are over identical tokenizations — space-split fields of
  * `UTF8String.toLowerCase` (the same lowercasing `lower()` performs),
  * `Pattern.split`-style field counting with trailing empties, Java
  * `\s` = [ \t\n\x0B\f\r]. The prior formulation evaluated
  * interpreted higher-order-function lambdas per token per output
  * column (VERDICT r1: 37.8 s of the sf0.1 bench); this is one
  * primitive-loop pass per row inside whole-stage codegen.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "graft_textstats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_textstats requires string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    TextStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  /** Stopword lists, order fixed: en, es, fr, de. Mirrors
    * graft.ops.TextAnalysis.stopwords. */
  val Langs: Seq[String] = Seq("en", "es", "fr", "de")
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "les"),
    "de" -> Seq("der", "die", "das", "und", "zu"))

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("tok_total", IntegerType, nullable = false),
    StructField("stop_en", IntegerType, nullable = false),
    StructField("stop_es", IntegerType, nullable = false),
    StructField("stop_fr", IntegerType, nullable = false),
    StructField("stop_de", IntegerType, nullable = false),
    StructField("n_ws", IntegerType, nullable = false),
    StructField("n_bpe", IntegerType, nullable = false)))

  // stopword byte images, grouped as (bytes, langBitmask) for a single
  // comparison sweep per token; distinct words that appear in several
  // languages (la, de) carry multiple mask bits
  private val words: Array[(Array[Byte], Int)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    for ((lang, i) <- Langs.zipWithIndex; w <- Stopwords(lang))
      m(w) = m.getOrElse(w, 0) | (1 << i)
    m.map { case (w, mask) => (w.getBytes("UTF-8"), mask) }.toArray
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** langBitmask of the stopword matching bytes[from, until), or 0. */
  private def stopMask(bytes: Array[Byte], from: Int, until: Int): Int = {
    val len = until - from
    if (len < 1 || len > 3) return 0
    var w = 0
    while (w < words.length) {
      val img = words(w)._1
      if (img.length == len) {
        var k = 0
        while (k < len && img(k) == bytes(from + k)) k += 1
        if (k == len) return words(w)._2
      }
      w += 1
    }
    0
  }

  def compute(text: UTF8String): InternalRow = {
    val raw = text.getBytes

    // ---- pass 1: raw text — chars, kept chars, \s+ fields, bpe tokens
    var nChars = 0
    var nKept = 0
    var nBpe = 0
    // trim(text) strips leading/trailing 0x20 only (Spark trim default)
    var tStart = 0
    var tEnd = raw.length
    while (tStart < tEnd && raw(tStart) == ' ') tStart += 1
    while (tEnd > tStart && raw(tEnd - 1) == ' ') tEnd -= 1
    // Pattern.split(s, -1) field count = 1 + number of maximal \s runs
    var nWsRuns = 0
    var inWs = false
    var prevLetter = false
    var prevDigit = false
    var i = 0
    while (i < raw.length) {
      val b = raw(i)
      val isCont = (b & 0xc0) == 0x80 // UTF-8 continuation byte
      if (!isCont) {
        nChars += 1
        val ascii = (b & 0x80) == 0
        val isL = ascii && b >= 'a' && b <= 'z'
        val isD = ascii && b >= '0' && b <= '9'
        val ws = ascii && isWs(b)
        if (isL || isD || b == ' ') nKept += 1
        // bpe classes: letter-run | digit-run | single non-alnum-non-ws
        if (isL) { if (!prevLetter) nBpe += 1 }
        else if (isD) { if (!prevDigit) nBpe += 1 }
        else if (!ws) nBpe += 1
        prevLetter = isL
        prevDigit = isD
        if (i >= tStart && i < tEnd) {
          if (ws) { if (!inWs) { nWsRuns += 1; inWs = true } }
          else inWs = false
        }
      } else { prevLetter = false; prevDigit = false }
      i += 1
    }
    val nWs = 1 + nWsRuns

    // ---- pass 2: lowered text — space-split fields + stopword hits
    // (UTF8String.toLowerCase is exactly what lower() evaluates)
    val low = text.toLowerCase.getBytes
    var tokTotal = 1
    val stops = new Array[Int](Langs.length)
    var fieldStart = 0
    i = 0
    while (i <= low.length) {
      if (i == low.length || low(i) == ' ') {
        val mask = stopMask(low, fieldStart, i)
        if (mask != 0) {
          var l = 0
          while (l < stops.length) {
            if ((mask & (1 << l)) != 0) stops(l) += 1
            l += 1
          }
        }
        if (i < low.length) tokTotal += 1
        fieldStart = i + 1
      }
      i += 1
    }

    new GenericInternalRow(Array[Any](
      nChars, nKept, tokTotal,
      stops(0), stops(1), stops(2), stops(3), nWs, nBpe))
  }
}
