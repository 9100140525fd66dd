package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Time-series regularization for training-feature pipelines:
  * resample keyed events to a fixed step and MATERIALIZE the gaps —
  * the events→model-features pass that turns an irregular event log
  * into one row per (key, bucket), missing buckets included, so
  * downstream sequence models see a dense, aligned grid. (The
  * reference engine, sql_to_ibis, has no time-series surface; this
  * extends SURVEY §2.2.)
  */
object TimeSeries {

  /** Resample + gap fill: one output row per `step`-sized bucket
    * between each key's FIRST and LAST event (inclusive), with the
    * bucket's event count and summed value; buckets with no events
    * are gaps. `fill` decides a gap's value: "null" (default),
    * "zero", or "ffill" (last seen value carries forward — the
    * sensor/metrics convention).
    *
    * Scale shape — everything rides (key)-partitioned operators:
    * one aggregation for per-key [min, max] bucket spans, a spine
    * exploded INLINE from sequence(lo, hi) (output-sized, never
    * corpus-sized; cost = buckets per key, pick `step` accordingly),
    * one (key, bucket) two-phase aggregation of the events, one
    * co-keyed left join, and forward fill as a last(ignoreNulls)
    * window over the SAME key partitioning. `tsCol` is a long
    * (e.g. epoch micros); NULL timestamps drop. */
  def resample(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, step: Long,
               fill: String = "null"): DataFrame = {
    require(step > 0, "step must be positive")
    require(Set("null", "zero", "ffill").contains(fill),
      s"fill must be null|zero|ffill, got $fill")
    val reserved = Seq("__b", "__lo", "__hi", "__sv")
    val clash = events.columns.filter(c =>
      reserved.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"input columns [${clash.mkString(", ")}] collide with reserved " +
        s"helper names [${reserved.mkString(", ")}]")
    val base = events.filter(F.col(tsCol).isNotNull)
      .withColumn("__b", F.expr(s"$tsCol div $step"))
    val spine = base.groupBy(keyCol)
      .agg(F.min("__b").as("__lo"), F.max("__b").as("__hi"))
      .selectExpr(keyCol, "explode(sequence(__lo, __hi)) as __b")
    val agg = base.groupBy(F.col(keyCol), F.col("__b"))
      .agg(F.count(F.lit(1)).as("n"), F.sum(valueCol).as("__sv"))
    val joined = spine.join(agg, Seq(keyCol, "__b"), "left_outer")
    val value = fill match {
      case "zero"  => F.coalesce(F.col("__sv"), F.lit(0.0))
      case "ffill" =>
        // the spine row's own value when present, else the nearest
        // earlier bucket's — last(ignoreNulls) over the key window,
        // same partitioning as the join
        F.last(F.col("__sv"), ignoreNulls = true)
          .over(Window.partitionBy(keyCol).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      case _ => F.col("__sv")
    }
    joined
      .withColumn("value", value)
      .select(F.col(keyCol),
        (F.col("__b") * step).as("bucket_start"),
        F.coalesce(F.col("n"), F.lit(0L)).as("n"),
        F.col("value"))
  }
}
