package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Skew-resilient aggregation (SURVEY.md §4).
  *
  * A plain groupBy on a skewed key sends every row of a hot key to
  * one reducer. Salting splits each key into `buckets` sub-keys
  * (deterministic hash of a per-row discriminator), partially
  * aggregates, then re-aggregates the small (key, salt) partials —
  * the hot key's work spreads over `buckets` reducers while the final
  * pass touches only |keys| x buckets rows. AQE's skew-join handling
  * covers joins; this covers aggregations.
  */
object Skew {

  /** sum+count per key via two-phase salted aggregation. `discCol`
    * is any per-row column used to derive the deterministic salt. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     discCol: String, buckets: Int = 16): DataFrame =
    df.withColumn("__salt", F.pmod(F.hash(F.col(discCol)), F.lit(buckets)))
      .groupBy(F.col(key), F.col("__salt"))
      .agg(F.sum(valueCol).as("__psum"), F.count(F.lit(1)).as("__pn"))
      .groupBy(F.col(key))
      .agg(F.round(F.sum("__psum"), 2).as("sum_value"),
           F.sum("__pn").as("n"))
}
