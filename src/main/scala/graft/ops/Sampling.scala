package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling operators (SURVEY.md §2.2).
  *
  * Training pipelines need samples that are reproducible across runs,
  * engines and cluster sizes — `rand()` is none of those. Both
  * operators key off md5 of a stable id: the same rows are selected
  * no matter the partitioning, and any engine (or the DuckDB oracle)
  * can replay the selection exactly.
  */
object Sampling {

  /** Keeps ~`fraction` of rows: md5(key) interpreted as a uniform
    * hash, kept when below the fraction threshold. Pure filter —
    * pushdown-friendly, no shuffle, stable under repartitioning. */
  def consistentSample(df: DataFrame, keyCol: String,
                       fraction: Double): DataFrame = {
    val threshold = f"${(fraction * (1L << 32)).toLong}%08x"
    df.filter(s"substring(md5(cast($keyCol as string)), 1, 8) < '$threshold'")
  }

  /** Deterministic stratified sample: the `perGroup` rows of each
    * group whose key-hash sorts first. One shuffle on the group
    * column; within-group order is the hash order, so the sample is
    * stable and unbiased w.r.t. any value column. */
  def stratifiedSample(df: DataFrame, groupCol: String, keyCol: String,
                       perGroup: Int): DataFrame =
    df.withColumn("__hk", F.expr(s"md5(cast($keyCol as string))"))
      .withColumn("__rn", F.row_number().over(
        Window.partitionBy(groupCol).orderBy(F.col("__hk"), F.col(keyCol))))
      .filter(F.col("__rn") <= perGroup)
      .drop("__hk", "__rn")
}
