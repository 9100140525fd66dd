package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing fingerprint: lexicographic-minimum md5 over all
  * `window`-character substrings of the text.
  *
  * Equivalent to `array_min(transform(sequence(1, greatest(len-w+1,1)),
  * i -> md5(substring(text, i, w))))` — but tracks the 128-bit minimum
  * as two primitive longs (full-width hex compares like the unsigned
  * digest) instead of allocating one hex string per position.
  * Codegen is a static call into [[RollingMinHash.compute]] so the
  * stage stays inside whole-stage codegen.
  */
case class RollingMinHash(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint requires string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    RollingMinHash.compute(v.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingMinHash.compute($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  def compute(text: UTF8String, window: Int): UTF8String = {
    val nChars = text.numChars()
    val md = Md5.get()
    val digestBuf = new Array[Byte](16)
    var minHi = -1L // unsigned max
    var minLo = -1L
    val last = math.max(nChars - window, 0)

    def consume(d: Array[Byte]): Unit = {
      var hi = 0L; var lo = 0L
      var k = 0
      while (k < 8) { hi = (hi << 8) | (d(k) & 0xffL); k += 1 }
      while (k < 16) { lo = (lo << 8) | (d(k) & 0xffL); k += 1 }
      val less = java.lang.Long.compareUnsigned(hi, minHi) < 0 ||
        (hi == minHi && java.lang.Long.compareUnsigned(lo, minLo) < 0)
      if (less) { minHi = hi; minLo = lo }
    }

    if (text.numBytes == nChars) {
      // ASCII fast path: one byte per char — hash sliding byte windows
      // directly off a single copy, digest into a reused buffer
      val bytes = text.getBytes
      var i = 0
      while (i <= last) {
        md.reset()
        md.update(bytes, i, math.min(window, bytes.length - i))
        md.digest(digestBuf, 0, 16)
        consume(digestBuf)
        i += 1
      }
    } else {
      var i = 0
      while (i <= last) {
        md.reset()
        md.update(text.substringSQL(i + 1, window).getBytes)
        md.digest(digestBuf, 0, 16)
        consume(digestBuf)
        i += 1
      }
    }
    UTF8String.fromString(f"$minHi%016x$minLo%016x")
  }
}

/** One-pass SimHash over a token array: per-bit majority vote of
  * (+1/-1) weighted token hashes, where a token's hash is the first
  * 15 hex chars of md5(token) as an unsigned 60-bit value — exactly
  * the `conv(substring(md5(t), 1, 15), 16, 10)` formulation the
  * DuckDB oracle replays, without per-token string conversions.
  * Supports widths up to 60 bits. Codegen is a static call into
  * [[SimHash.compute]] so the stage stays inside whole-stage codegen.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      if (bits < 1 || bits > 60)
        TypeCheckResult.TypeCheckFailure(
          s"graft_simhash width must be in [1, 60], got $bits")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    SimHash.compute(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  def compute(arr: ArrayData, bits: Int): Long = {
    val votes = new Array[Long](bits)
    val md = Md5.get()
    val d = new Array[Byte](16)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        md.digest(d, 0, 16)
        // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
        var h = 0L
        var k = 0
        while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        h = (h << 4) | ((d(7) >> 4) & 0xfL)
        var j = 0
        while (j < bits) {
          votes(j) += (((h >> j) & 1L) * 2L - 1L)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
