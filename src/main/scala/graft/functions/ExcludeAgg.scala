package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** One-pass frame-EXCLUDE aggregation over a collected window frame
  * (r8): evaluates `func([DISTINCT] v)` over the frame elements
  * `(ok, rid, v)` minus the EXCLUDE-mode rows — the native form of
  * the translator's filter→transform→distinct→fold HOF chain, which
  * pays interpreted lambda dispatch PER ELEMENT per link (measured
  * 5.4 s for six fallback columns over lineitem; this expression is
  * one JVM call per row). CodegenFallback: window aggregates aren't
  * codegen'd anyway and the per-row (not per-element) interpreted
  * dispatch is the win.
  *
  * Exclusion semantics (must match the HOF chain bit-for-bit — the
  * DuckDB-native oracle q_window_exclude_ext pins both):
  *  - current row: remove the FIRST element whose rid equals the
  *    current row's (rows equal in (ok, v) are interchangeable);
  *  - group: remove every element whose ok tuple equals the current
  *    row's null-safely;
  *  - ties: remove the peers, then add ONE copy of the current row.
  * Then null values drop, DISTINCT keeps first occurrences, and the
  * survivors fold IN ARRAY ORDER (IEEE-identical to the HOF fold).
  * Sums are ANSI-faithful: long overflow and decimal(38,s) overflow
  * throw. avg stays composed at the Column level (native sum/count)
  * so division typing matches the old chain. */
case class ExcludeAgg(lst: Expression, cur: Expression, mode: String,
                      func: String, distinct: Boolean)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = lst
  override def right: Expression = cur
  override def prettyName: String = "graft_exclude_agg"
  // an empty survivor set reads NULL even over non-null children
  override def nullable: Boolean = true

  private def elemType: StructType = lst.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private def okType: DataType = elemType.fields(0).dataType
  private def vType: DataType = elemType.fields(2).dataType

  override def dataType: DataType = func match {
    case "count" => LongType
    case "min" | "max" => vType
    case "sum" => vType match {
      case ByteType | ShortType | IntegerType | LongType => LongType
      case d: DecimalType => DecimalType(38, d.scale)
      case _ => DoubleType
    }
    // r9: array-returning mode — the post-exclusion frame elements in
    // frame order, feeding the ordered-set collects' comparator-sort
    // projection (string_agg/array_agg + EXCLUDE)
    case "collect" => ArrayType(vType, containsNull = true)
    case other => throw new IllegalArgumentException(
      s"graft_exclude_agg does not implement $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (lst.dataType, cur.dataType) match {
      case (ArrayType(s: StructType, _), c: StructType)
          if s.length == 3 && c.length == 3 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_exclude_agg expects (array<struct3>, struct3), got $other")
    }

  @transient private lazy val okOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(okType)
  @transient private lazy val vOrd: Ordering[Any] =
    if (func == "min" || func == "max") TypeUtils.getInterpretedOrdering(vType)
    else null

  override def nullSafeEval(lstV: Any, curV: Any): Any = {
    val arr = lstV.asInstanceOf[ArrayData]
    val c = curV.asInstanceOf[InternalRow]
    val curOk = c.get(0, okType)
    val curRid = c.getLong(1)
    val curVal = if (c.isNullAt(2)) null else c.get(2, vType)
    val n = arr.numElements()
    // the included values, frame order (plus the ties re-add)
    val vals = new java.util.ArrayList[Any](n)
    var removedCurrent = false
    var i = 0
    while (i < n) {
      val e = arr.getStruct(i, 3)
      val excl = mode match {
        case "current row" =>
          if (!removedCurrent && e.getLong(1) == curRid) {
            removedCurrent = true; true
          } else false
        case _ => // group | ties
          okOrd.compare(e.get(0, okType), curOk) == 0
      }
      // scalar folds drop null values (they are invisible to the
      // aggregate); collect keeps them — the downstream projection
      // owns null handling (string_agg filters, array_agg keeps)
      if (!excl && (func == "collect" || !e.isNullAt(2)))
        vals.add(if (e.isNullAt(2)) null else e.get(2, vType))
      i += 1
    }
    if (mode == "ties" && (curVal != null || func == "collect"))
      vals.add(curVal)
    val it =
      if (!distinct) vals.iterator()
      else {
        // JVM equality separates -0.0 from 0.0, Catalyst's
        // array_distinct (the HOF fallback path) unifies them —
        // normalize so both lowerings dedupe identically (r8 ADVICE)
        val seen = new java.util.LinkedHashSet[Any](vals.size * 2)
        val vi = vals.iterator()
        while (vi.hasNext) seen.add(vi.next() match {
          case d: java.lang.Double if d.doubleValue == 0.0d =>
            java.lang.Double.valueOf(0.0d)
          case f: java.lang.Float if f.floatValue == 0.0f =>
            java.lang.Float.valueOf(0.0f)
          case v => v
        })
        seen.iterator()
      }
    func match {
      case "collect" =>
        // read through `it`, not `vals`: the translator always passes
        // distinct=false for collect today, but a future
        // ExcludeAgg(collect, distinct=true) must dedupe, not silently
        // ignore the flag (r9 ADVICE)
        val out = new java.util.ArrayList[Any](vals.size)
        while (it.hasNext) out.add(it.next())
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          out.toArray)
      case "count" =>
        var k = 0L; while (it.hasNext) { it.next(); k += 1 }; k
      case "min" | "max" =>
        var best: Any = null
        val sign = if (func == "min") -1 else 1
        while (it.hasNext) {
          val v = it.next()
          if (best == null || vOrd.compare(v, best) * sign > 0) best = v
        }
        best
      case "sum" =>
        if (!it.hasNext) null
        else vType match {
          case ByteType | ShortType | IntegerType | LongType =>
            var acc = 0L
            while (it.hasNext) acc = Math.addExact(acc, it.next() match {
              case b: java.lang.Byte    => b.longValue
              case s: java.lang.Short   => s.longValue
              case x: java.lang.Integer => x.longValue
              case l: java.lang.Long    => l.longValue
              case o => o.asInstanceOf[Number].longValue
            })
            acc
          case d: DecimalType =>
            var acc = java.math.BigDecimal.ZERO
            while (it.hasNext)
              acc = acc.add(it.next()
                .asInstanceOf[org.apache.spark.sql.types.Decimal]
                .toJavaBigDecimal)
            val out = org.apache.spark.sql.types.Decimal(acc)
            if (!out.changePrecision(38, d.scale))
              throw new ArithmeticException(
                "graft_exclude_agg: decimal sum overflow")
            out
          case _ =>
            var acc = 0.0
            while (it.hasNext) acc += (it.next() match {
              case f: java.lang.Float  => f.doubleValue
              case x: java.lang.Double => x.doubleValue
              case o => o.asInstanceOf[Number].doubleValue
            })
            acc
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExcludeAgg =
    copy(lst = newLeft, cur = newRight)
}
