package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  Cast, EvalMode, Expression, If, Literal, RLike, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TRY_CAST with a cheap pre-guard for string→number (r7b).
  *
  * Spark's TRY-mode cast catches a JVM exception per FAILING row —
  * ~10 µs each (measured: 1.45 s for ~450k failing casts in
  * q_try_cast), fine for occasional dirt but quadratic-feeling on
  * failure-heavy columns. This RuntimeReplaceable resolves the
  * child's type and, for string→integral, guards with the EXACT
  * regex of Spark's accepted integer format (optional sign + digits,
  * surrounded by the ≤0x20 control/space characters trimAll strips) —
  * rows failing the regex read NULL with zero exceptions, rows
  * passing it parse without one (overflow still lands in the TRY
  * path, rare). String→float/double takes a SUPERSET prefix guard
  * (digit/dot/sign/inf/nan starts) — obvious garbage short-circuits,
  * anything plausible still goes through the authoritative TRY cast,
  * so semantics are exactly try_cast's in every case. Non-string
  * inputs replace with the plain TRY cast untouched. */
case class SafeCast(child: Expression, target: DataType)
    extends UnaryExpression with RuntimeReplaceable {

  override def dataType: DataType = target
  override def prettyName: String = "try_cast"

  private def tryCast: Expression = Cast(child, target, None, EvalMode.TRY)

  override lazy val replacement: Expression = child.dataType match {
    case StringType =>
      val re = target match {
        case ByteType | ShortType | IntegerType | LongType =>
          // exact: anything UTF8String.toLongExact accepts matches
          Some("^[\\x00-\\x20]*[+-]?[0-9]+[\\x00-\\x20]*$")
        case FloatType | DoubleType =>
          // superset prefix guard: plausible numbers go to TRY
          Some("^[\\x00-\\x20]*[+-]?[0-9.iInN].*")
        case _ => None
      }
      re match {
        case Some(r) =>
          If(RLike(child, Literal(UTF8String.fromString(r), StringType)),
            tryCast, Literal(null, target))
        case None => tryCast
      }
    case _ => tryCast
  }

  override protected def withNewChildInternal(newChild: Expression): SafeCast =
    copy(child = newChild)
}
