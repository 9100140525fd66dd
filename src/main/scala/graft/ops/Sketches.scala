package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Persisted mergeable distinct-count sketches (SURVEY.md §2.2 row
  * 105) — the incremental-corpus-statistics architecture: each ingest
  * batch materializes a tiny per-group HLL sketch table (Spark's
  * native Datasketches hll_sketch_agg), and corpus-wide distinct
  * counts at any later time are a UNION of sketch rows — the raw
  * batches are never rescanned.
  *
  * Scale shape: building is one two-phase aggregation per batch
  * (partial sketches merge map-side, the shuffle carries one ≤2^lgK
  * buffer per group per partition); merging unions rows-of-sketches —
  * thousands of rows however many trillions of raw values produced
  * them. Estimates carry the standard HLL relative standard error
  * 1.04/sqrt(2^lgK) (~1.6% at the default lgK=12).
  */
object Sketches {

  /** Per-group HLL sketch of `valueCol` over one batch. The output
    * (groupCols..., sketch binary) is the persistable increment. */
  def distinctSketches(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, lgK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "distinctSketches needs group columns")
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    df.groupBy(groupCols.map(F.col): _*)
      .agg(F.hll_sketch_agg(F.col(valueCol), F.lit(lgK)).as("sketch"))
  }

  /** Merges sketch batches (each shaped like [[distinctSketches]]
    * output) into per-group distinct-count estimates. */
  def mergeDistinctEstimates(batches: Seq[DataFrame],
                             groupCols: Seq[String]): DataFrame = {
    require(batches.nonEmpty, "mergeDistinctEstimates needs batches")
    batches.reduce(_ unionAll _)
      .groupBy(groupCols.map(F.col): _*)
      .agg(F.hll_sketch_estimate(
        F.hll_union_agg(F.col("sketch"), F.lit(true))).as("distinct_est"))
  }
}
