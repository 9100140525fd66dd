package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass minhash signatures over a shingle array.
  *
  * Equivalent by construction to the expression pipeline
  * `array_min(transform(transform(shingles, x -> md5(concat(s,':',x))),
  * m -> substring(m, j*8+1, 8)))` for seed s and slice j — but
  * computes every (seed, slice) minimum in a single traversal with
  * one MD5 per (seed, shingle) and no intermediate arrays or
  * substring allocations. Fixed-width lowercase hex compares
  * lexicographically exactly like the unsigned 32-bit slice value, so
  * minima are tracked as primitive longs and rendered once at the
  * end; results are bit-identical to the md5-string formulation the
  * DuckDB oracle replays.
  *
  * Output: array of seeds*4 hex strings (null elements when the
  * input has no non-null shingles, matching array_min-over-empty).
  */
case class MinHashSlices(child: Expression, seeds: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string>, got $other")
  }

  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until seeds).map(s => s"$s:".getBytes("UTF-8")).toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val k = seeds * 4
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16)
    var any = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val shingle = arr.getUTF8String(i).getBytes
        var s = 0
        while (s < seeds) {
          md.reset()
          md.update(prefixes(s))
          md.update(shingle)
          md.digest(d, 0, 16)
          var j = 0
          while (j < 4) {
            val off = j * 4
            val slice = ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
              ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
            val idx = s * 4 + j
            if (slice < mins(idx)) mins(idx) = slice
            j += 1
          }
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    if (any) {
      var idx = 0
      while (idx < k) {
        out(idx) = UTF8String.fromString(f"${mins(idx)}%08x")
        idx += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSlices =
    copy(child = newChild)
}
