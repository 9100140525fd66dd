package org.apache.spark.sql

/** Bridge to `Column.fn` (package-private in spark-sql-api): builds a
  * DISTINCT aggregate call (`avg(DISTINCT x)`, ...) as the native
  * Catalyst aggregate, so result types (decimal precision/scale,
  * overflow behavior) match the engine's own `AVG` instead of a
  * hand-assembled sum/count quotient. No execution-path code lives
  * here — it only constructs an unresolved function Column. */
object GraftFn {
  def distinctAgg(name: String, cols: Column*): Column =
    Column.fn(name, isDistinct = true, cols: _*)

  /** PERCENTILE_DISC(f) WITHIN GROUP (ORDER BY x): the registry entry
    * only accepts the parser's WITHIN GROUP route (its builder takes
    * the fraction alone and reads the sort from the parse tree), so
    * the Catalyst aggregate is constructed directly. */
  def percentileDisc(sortCol: Column, frac: Column): Column =
    classic.ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.PercentileDisc(
        classic.ExpressionUtils.expression(sortCol),
        classic.ExpressionUtils.expression(frac))
        .toAggregateExpression())
}
