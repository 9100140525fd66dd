package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of the most frequent word n-gram WITHIN one token array —
  * the per-document half of the Gopher-style repetition signal
  * (SURVEY.md §2.2 row 71).
  *
  * Equivalent by construction to
  * `max(c)` over `select g, count(*) c from (explode n-grams) group
  * by g` per document — but computed per ROW in a single pass with a
  * small open-addressing count table, so the repetition operator
  * becomes a pure projection: no explode, no (doc_id, gram) shuffle,
  * no re-aggregation. At any corpus size the per-document work is
  * O(tokens); the distributed cost drops from two exchanges to zero.
  *
  * n-grams are compared by their exact byte content (token bytes
  * joined with a single 0x20), identical to the string-concat
  * grouping key of the exploded form the DuckDB oracle replays.
  * Null tokens are treated like the exploded form treats them:
  * `concat` of a null token yields a null gram, which count(*) would
  * group — but the operators feed `filter(split(...))` arrays that
  * cannot contain nulls, so null elements simply don't contribute.
  * Arrays with fewer than n tokens return 0 (the exploded form emits
  * no rows).
  *
  * Codegen emits a static call into [[TopGramMax.compute]] so the
  * surrounding stage stays inside whole-stage codegen.
  */
case class TopGramMax(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_topgram_max"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      "graft_topgram_max requires n >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_topgram_max requires array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    TopGramMax.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopGramMax.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TopGramMax =
    copy(child = newChild)
}

object TopGramMax {

  /** Max n-gram multiplicity in one token array (0 when fewer than n
    * usable tokens). A gram containing a null token is skipped —
    * callers pass null-free arrays; see class doc. */
  def compute(arr: ArrayData, n: Int): Int = {
    val sz = arr.numElements()
    val grams = sz - n + 1
    if (grams <= 0) return 0
    // join each window's token bytes once; dedup via a string->count
    // hash map sized for one document
    val counts = new java.util.HashMap[UTF8String, Int](grams * 2)
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val space = UTF8String.fromString(" ")
    var best = 0
    i = 0
    while (i < grams) {
      var ok = true
      var j = 0
      while (j < n) { if (toks(i + j) == null) ok = false; j += 1 }
      if (ok) {
        val gram =
          if (n == 1) toks(i)
          else {
            val parts = new Array[UTF8String](2 * n - 1)
            var k = 0
            while (k < n) {
              parts(2 * k) = toks(i + k)
              if (k < n - 1) parts(2 * k + 1) = space
              k += 1
            }
            UTF8String.concat(parts: _*)
          }
        val c = counts.merge(gram, 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}
