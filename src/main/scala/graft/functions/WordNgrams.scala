package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram array over a text column — the native form of
  * the `explode(transform(sequence(...), i -> concat(element_at(w,i),
  * ' ', ...)))` stream every n-gram operator shares (reference:
  * sql_to_ibis has no n-gram surface; this serves SURVEY §2.2 rows
  * 40/74/78/88/89).
  *
  * Spark's higher-order functions (`transform`/`filter` lambdas) are
  * CodegenFallback — every token and every gram pays interpreted
  * expression dispatch, and the tokenize step materializes a token
  * array column first. This expression tokenizes and builds the gram
  * strings in ONE pass over the UTF-8 bytes inside whole-stage
  * codegen (static call, like [[TopGramMax]]).
  *
  * Two dialects, matching the two tokenizations the operators use:
  *
  *  - `filterEmpty = true` (graft_word_ngrams): tokens are
  *    `filter(split(text, ' '), t -> t <> '')`; documents with fewer
  *    than n tokens return an EMPTY array — `explode` emits no rows,
  *    exactly like the callers' `size(w) >= n` pre-filter.
  *  - `filterEmpty = false, distinct = true, padShort = true`
  *    (graft_word_shingles): tokens are the raw `split(text, ' ')`
  *    (empty tokens kept), grams deduplicated in first-occurrence
  *    order like `array_distinct`, and fewer-than-n-token documents
  *    return `[null]` — byte-for-byte the historical
  *    `array_distinct(transform(sequence(1, greatest(size - n + 1,
  *    1)), ...))` form, whose out-of-bounds `element_at` turns the
  *    one gram of a short document into a null `concat`.
  *
  * Grams are token bytes joined with a single 0x20, identical to the
  * `concat(tok, ' ', tok, ...)` grouping keys the DuckDB oracles
  * replay. Lowercasing stays with the caller (`lower()` is already
  * codegen'd).
  */
case class WordNgrams(child: Expression, n: Int, filterEmpty: Boolean,
                      distinct: Boolean, padShort: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = padShort)
  override def prettyName: String =
    if (distinct) "graft_word_shingles" else "graft_word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    WordNgrams.compute(v.asInstanceOf[UTF8String], n, filterEmpty,
      distinct, padShort)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c, $n, " +
        s"$filterEmpty, $distinct, $padShort);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  /** Token n-gram array of `text` (see class doc for the dialects).
    * One pass over the bytes: space-split (0x20 is never a UTF-8
    * continuation byte), then per gram one exact-size byte copy. */
  def compute(text: UTF8String, n: Int, filterEmpty: Boolean,
              distinct: Boolean, padShort: Boolean): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token spans over the byte array; `split(text, ' ')` yields the
    // empty token between adjacent spaces and at the ends
    var cap = 8
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var count = 0
    var i = 0
    var tokStart = 0
    def push(s: Int, e: Int): Unit =
      if (!(filterEmpty && s == e)) {
        if (count == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(count) = s; ends(count) = e; count += 1
      }
    while (i < len) {
      if (bytes(i) == 0x20) { push(tokStart, i); tokStart = i + 1 }
      i += 1
    }
    push(tokStart, len)
    if (count < n)
      return if (padShort) new GenericArrayData(Array[Any](null))
      else new GenericArrayData(Array.empty[Any])
    val grams = count - n + 1
    val out = new java.util.ArrayList[AnyRef](grams)
    val seen = if (distinct) new java.util.HashSet[UTF8String](grams * 2)
      else null
    var g = 0
    while (g < grams) {
      var size = n - 1 // the joining spaces
      var j = g
      while (j < g + n) { size += ends(j) - starts(j); j += 1 }
      val buf = new Array[Byte](size)
      var pos = 0
      j = g
      while (j < g + n) {
        if (j > g) { buf(pos) = 0x20; pos += 1 }
        val tl = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), buf, pos, tl)
        pos += tl
        j += 1
      }
      val gram = UTF8String.fromBytes(buf)
      if (seen == null || seen.add(gram)) out.add(gram)
      g += 1
    }
    new GenericArrayData(out.toArray)
  }
}
