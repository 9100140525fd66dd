package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FastSS deletion neighborhood (Bocek et al., "Fast Similarity
  * Search in Large Dictionaries", 2007): the DISTINCT strings
  * obtained by deleting 0..k bytes from the input. Two strings with
  * ed(a,b) ≤ k always share a neighborhood member (delete each side's
  * edited positions), so equality-joining on the exploded
  * neighborhood is a complete candidate filter for short-string
  * edit-distance joins — with near-full-string keys, shared prefixes
  * or constant chunks never collide the way fixed PassJoin chunks do
  * (reference: sql_to_ibis has no fuzzy-join surface; serves SURVEY
  * §2.2 row 112).
  *
  * Byte-level like [[BandedLevenshtein]]: deleting mid-codepoint
  * bytes yields invalid UTF-8, but keys are only compared for
  * EQUALITY against keys generated the same way, so the candidate
  * filter stays complete for byte-level edit distance. Cost is
  * C(len, k) strings per row — the caller bounds the string length
  * (editDistancePairs routes longer rows to PassJoin chunking). */
case class DelNeighborhood(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_del_neighborhood"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && k <= 3 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 1 <= k <= 3 (C(len,k) keys per row)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    DelNeighborhood.compute(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DelNeighborhood.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): DelNeighborhood =
    copy(child = newChild)
}

object DelNeighborhood {

  /** All distinct byte strings from deleting 0..k positions of
    * `text`, first-occurrence order (the input itself is first).
    * Deleting more positions than the length yields the empty string
    * once. Enumerates position combinations iteratively per depth —
    * no recursion, one exact-size copy per emitted string. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef]()
    val seen = new java.util.HashSet[UTF8String]()
    def emit(del: Array[Int], d: Int): Unit = {
      val buf = new Array[Byte](n - d)
      var pos = 0; var i = 0; var di = 0
      while (i < n) {
        if (di < d && del(di) == i) di += 1
        else { buf(pos) = bytes(i); pos += 1 }
        i += 1
      }
      val s = UTF8String.fromBytes(buf)
      if (seen.add(s)) out.add(s)
    }
    emit(Array.emptyIntArray, 0)
    var d = 1
    val del = new Array[Int](math.min(k, n))
    while (d <= k && d <= n) {
      // iterate the C(n, d) ascending position combinations
      var i = 0
      while (i < d) { del(i) = i; i += 1 }
      var done = false
      while (!done) {
        emit(del, d)
        // advance to the next combination
        var j = d - 1
        while (j >= 0 && del(j) == n - d + j) j -= 1
        if (j < 0) done = true
        else {
          del(j) += 1
          var m = j + 1
          while (m < d) { del(m) = del(m - 1) + 1; m += 1 }
        }
      }
      d += 1
    }
    new GenericArrayData(out.toArray)
  }
}
