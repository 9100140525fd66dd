package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Native multi-key sort of an array of structs (r11) — the one-pass
  * alternative to `array_sort(arr, comparator)` for the ordered-set
  * collects' comparator projection: the HOF comparator pays an
  * interpreted lambda CALL (evaluating a nested CaseWhen tree) per
  * COMPARISON — O(n log n) dispatches per row — where this expression
  * is one JVM TimSort per row with primitive field reads. The r9 A/B
  * measured the HOF faster on ≤7-element frames (per-row setup
  * dominates); this exists for the larger-frame regime — see the r11
  * crossover measurements in BASELINE.md before choosing a default.
  *
  * Sorts by the FIRST `ascs.length` struct fields with per-key
  * asc/desc and NULLS FIRST/LAST flags, whole elements carried.
  * TimSort is stable, matching `array_sort`'s stable comparator sort
  * bit-for-bit on tie keys. NULL input reads NULL; a NULL ELEMENT
  * (not produced by the collect layer, but reachable via GraftFn)
  * behaves as a struct of all-null keys — exactly what the HOF
  * comparator reads through getField(null), so the two arms stay
  * interchangeable. */
case class SortStructs(child: Expression, ascs: Seq[Boolean],
                       nullsFirsts: Seq[Boolean])
    extends UnaryExpression with CodegenFallback {
  require(ascs.length == nullsFirsts.length && ascs.nonEmpty,
    "one asc and one nullsFirst flag per sort key")

  override def prettyName: String = "graft_sort_structs"
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def withNewChildInternal(c: Expression): SortStructs =
    copy(child = c)

  private def elemType: StructType = child.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length >= ascs.length =>
      val unorderable = s.fields.take(ascs.length).find(f =>
        scala.util.Try(TypeUtils.getInterpretedOrdering(f.dataType)).isFailure)
      unorderable match {
        case Some(f) => TypeCheckResult.TypeCheckFailure(
          s"sort key field ${f.name} of type ${f.dataType} has no ordering")
        case None => TypeCheckResult.TypeCheckSuccess
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sort_structs expects array<struct> with >= ${ascs.length} " +
        s"fields, got $other")
  }

  @transient private lazy val nFields: Int = elemType.length
  @transient private lazy val keyTypes: Array[DataType] =
    elemType.fields.take(ascs.length).map(_.dataType)
  @transient private lazy val keyOrds: Array[Ordering[Any]] =
    keyTypes.map(TypeUtils.getInterpretedOrdering)
  @transient private lazy val ascArr: Array[Boolean] = ascs.toArray
  @transient private lazy val nfArr: Array[Boolean] = nullsFirsts.toArray

  @transient private lazy val cmp: java.util.Comparator[AnyRef] =
    new java.util.Comparator[AnyRef] {
      override def compare(a: AnyRef, b: AnyRef): Int = {
        // a NULL ELEMENT behaves as a struct of all-null keys — the
        // HOF comparator arm reads getField(null) = null and orders
        // by the per-key NULLS flags, so the env-swap equality holds
        // on null elements too (review r11)
        val ra = a.asInstanceOf[InternalRow]
        val rb = b.asInstanceOf[InternalRow]
        var k = 0
        while (k < keyOrds.length) {
          val an = ra == null || ra.isNullAt(k)
          val bn = rb == null || rb.isNullAt(k)
          if (an || bn) {
            if (!an || !bn) {
              val nf = if (nfArr(k)) -1 else 1
              return if (an) nf else -nf
            }
          } else {
            val c = keyOrds(k).compare(ra.get(k, keyTypes(k)),
              rb.get(k, keyTypes(k)))
            if (c != 0) return if (ascArr(k)) c else -c
          }
          k += 1
        }
        0
      }
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val elems = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      // copy: unsafe-format getStruct returns a reused view
      elems(i) =
        if (arr.isNullAt(i)) null else arr.getStruct(i, nFields).copy()
      i += 1
    }
    java.util.Arrays.sort(elems, cmp)
    new GenericArrayData(elems.asInstanceOf[Array[Any]])
  }
}
