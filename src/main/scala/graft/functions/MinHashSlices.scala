package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  *
  * Codegen emits a static call into [[MinHashSlices.compute]] so the
  * surrounding stage stays inside whole-stage codegen (the round-1
  * CodegenFallback severed the stage).
  */
case class MinHashSlices(child: Expression, seeds: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    MinHashSlices.compute(v.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSlices.compute($c, $seeds);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSlices =
    copy(child = newChild)
}

object MinHashSlices {

  // seed prefix byte images ("0:", "1:", ...) shared across rows
  private val prefixCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixes(seeds: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(seeds,
      s => (0 until s).map(i => s"$i:".getBytes("UTF-8")).toArray)

  def compute(arr: ArrayData, seeds: Int): ArrayData = {
    val pfx = prefixes(seeds)
    val k = seeds * 4
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val md = Md5.get()
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
          md.update(pfx(s))
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
}

/** Thread-local MD5 digests: MessageDigest.getInstance allocates (and
  * walks the provider list) per call — measurable on per-row paths. */
private[functions] object Md5 {
  private val tl = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  def get(): java.security.MessageDigest = tl.get()
}
