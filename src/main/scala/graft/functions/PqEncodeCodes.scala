package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass product-quantization encoder over the int8 lattice.
  *
  * Equivalent by construction to the nested-HOF formulation in
  * `Similarity.pqEncode` (per block b, argmin over codes c of the
  * summed squared distance between the block slice of `q` and the
  * flattened codebook slice at (b, c); ties to the LOWEST code; the
  * per-block minima sum to `pq_err`) — but runs as primitive long
  * loops instead of interpreted lambda evaluation. Spark's
  * higher-order functions are CodegenFallback: at m=4, k=16, d=8 the
  * HOF form allocates ~m·k structs and re-evaluates the distance
  * aggregate per comparison, measured 1.95 s at sf0.1 where this
  * expression stays inside whole-stage codegen via a static call.
  *
  * Children: q (array<bigint>, the int8-lattice vector) and the
  * flattened block-major codebook (array<bigint>, laid out
  * [(b·k_actual + c)·sub + i] with sub = size(q) / m). A codebook
  * holding fewer than k codes (corpus smaller than k) encodes
  * against the codes present, matching the HOF form's out-of-bounds
  * skip. Output: struct(codes array<int>, pq_err bigint).
  */
case class PqEncodeCodes(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("pq_err", LongType, nullable = false)))
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    // invalid block/code counts fail HERE, at analysis, instead of as
    // a raw per-row ArithmeticException (m=0 divides by zero in
    // compute) or silent garbage (negative m skips every block)
    if (m < 1 || k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode requires m >= 1 and k >= 1, got m=$m, k=$k")
    else (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode requires (array<bigint>, array<bigint>), got $other")
    }

  override def nullSafeEval(q: Any, cb: Any): Any =
    PqEncodeCodes.compute(q.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cb) =>
      s"${ev.value} = graft.functions.PqEncodeCodes.compute($q, $cb, $m, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeCodes =
    copy(left = newLeft, right = newRight)
}

object PqEncodeCodes {

  def compute(q: ArrayData, cb: ArrayData, m: Int, k: Int): InternalRow = {
    val sub = q.numElements() / m
    // codes actually present in the codebook (may be < k on a tiny
    // corpus); the HOF form skips missing codes via null distances
    val kAvail = if (sub == 0) 0
      else math.min(k, cb.numElements() / (m * sub))
    val codes = new Array[Any](m)
    var err = 0L
    var b = 0
    while (b < m) {
      var best = Long.MaxValue
      var bestC = -1
      val qOff = b * sub
      var c = 0
      while (c < kAvail) {
        val cOff = (b * kAvail + c) * sub
        var s = 0L
        var i = 0
        // only a strictly smaller sum can win (ties keep the lower
        // code), so bail as soon as the partial sum reaches `best`
        while (i < sub && s < best) {
          val d = q.getLong(qOff + i) - cb.getLong(cOff + i)
          s += d * d
          i += 1
        }
        if (i == sub && s < best) { best = s; bestC = c }
        c += 1
      }
      codes(b) = bestC
      if (bestC >= 0) err += best
      b += 1
    }
    InternalRow(new GenericArrayData(codes), err)
  }
}
