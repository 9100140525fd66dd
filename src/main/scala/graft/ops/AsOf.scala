package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join — for each left row, the most recent right
  * row with right.time <= left.time within the same key
  * (SURVEY.md §2.2 row 52).
  *
  * Spark has no native as-of join; rather than a custom physical
  * operator, this composes built-ins the way the optimizer likes:
  * tag both sides, UNION them (no join at all!), then a single
  * last_value(ignoreNulls) window ordered by time within each key.
  * One shuffle on the key, linear in total rows — the classic
  * scalable formulation; a sort-merge-join based as-of would shuffle
  * both sides too but then pay a per-key merge with no codegen.
  *
  * Ties (equal timestamps) resolve right-side-first, matching
  * inclusive `<=` semantics.
  */
object AsOf {

  /** leftTime/rightTime are long (e.g. epoch micros) columns.
    * Returns left rows + `asof_<rightTime>` = matched right time and
    * `asof_match` columns from the right value column. */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           rightValue: String): DataFrame = {
    val l = left.withColumn("__side", F.lit(1))
      .withColumn("__t", F.col(leftTime))
      .withColumn("__rv", F.lit(null).cast(right.schema(rightValue).dataType))
      .withColumn("__rt", F.lit(null).cast("long"))
    val r = right.select(
        F.col(key), F.col(rightTime).as("__t"),
        F.col(rightValue).as("__rv"))
      .withColumn("__side", F.lit(0))
      .withColumn("__rt", F.col("__t"))
    val unioned = l.select(
      (Seq(key) ++ left.columns.filterNot(_ == key) ++
        Seq("__side", "__t", "__rv", "__rt")).distinct.map(F.col): _*)
      .unionByName(r, allowMissingColumns = true)

    // right rows sort before left rows at equal time → inclusive <=
    val w = Window.partitionBy(key)
      .orderBy(F.col("__t"), F.col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_time", F.last("__rt", ignoreNulls = true).over(w))
      .withColumn("asof_value", F.last("__rv", ignoreNulls = true).over(w))
      .filter(F.col("__side") === 1)
      .drop("__side", "__t", "__rv", "__rt")
  }
}
