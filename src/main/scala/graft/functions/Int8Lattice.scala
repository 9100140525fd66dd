package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass int8-lattice quantization of an embedding vector:
  * scale = max(|v_i|); q_i = floor(v_i * 127 / scale + 0.5) as bigint
  * (all-zero and empty vectors map to zeros / empty — no NaNs).
  *
  * Replaces the `array_max(transform(...))` + `transform(...)` HOF
  * projection on every PQ/IVF corpus pass (r13, guide §4): Spark HOFs
  * are CodegenFallback, so the old form paid three interpreted lambda
  * dispatch passes per row per dimension; this is two tight primitive
  * loops inside whole-stage codegen. Arithmetic is IDENTICAL — double
  * abs/max, (v · 127) / scale + 0.5 in that association, floor, long
  * truncation — so lattices are bit-identical to the HOF form
  * (spec-pinned) and the unchanged DuckDB oracle replays them.
  * Null/NaN elements are not supported (embeddings are dense finite
  * vectors); a NULL array yields NULL. */
case class Int8Lattice(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_int8"

  private val supported: Set[DataType] =
    Set(FloatType, DoubleType, IntegerType, LongType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if supported(t) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_int8 requires a numeric array, got $other")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    def get(i: Int): Double = elemType match {
      case FloatType   => arr.getFloat(i).toDouble
      case DoubleType  => arr.getDouble(i)
      case IntegerType => arr.getInt(i).toDouble
      case LongType    => arr.getLong(i).toDouble
      case other =>
        throw new IllegalArgumentException(s"unsupported element type $other")
    }
    var scale = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(get(i)); if (v > scale) scale = v; i += 1
    }
    val out = new Array[Long](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(get(i) * 127.0 / scale + 0.5).toLong; i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    def getter(arr: String, i: String): String = elemType match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case other =>
        throw new IllegalArgumentException(s"unsupported element type $other")
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val scale = ctx.freshName("scale")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $scale = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = java.lang.Math.abs(${getter(a, i)});
         |  if ($v > $scale) $scale = $v;
         |}
         |long[] $out = new long[$n];
         |if ($scale != 0.0) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $out[$j] = (long) java.lang.Math.floor(
         |      ${getter(a, j)} * 127.0 / $scale + 0.5);
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Int8Lattice = copy(child = newChild)
}
