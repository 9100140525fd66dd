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

  /** Skew-resilient inner equi-join on `key`: the skewed (fact) side
    * gets a deterministic per-row salt; the other side is replicated
    * once per salt bucket, and the join keys on (key, salt) so a hot
    * key's rows spread over `buckets` reducers instead of one. Result
    * rows are identical to the plain join. AQE's runtime skew-join
    * split covers most cases; this explicit form is for when stats
    * are missing or wrong (freshly written data, streaming
    * micro-batches) or the non-skewed side exceeds the broadcast
    * threshold. The shuffle_hash hint keeps the demo plan on the
    * salted-shuffle path (a broadcastable right side would make
    * salting moot — at scale it is not broadcastable). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 discCol: String, buckets: Int = 16): DataFrame = {
    val salted = skewed.withColumn("__salt",
      F.pmod(F.hash(F.col(discCol)), F.lit(buckets)))
    val replicated = other.withColumn("__salt",
      F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
