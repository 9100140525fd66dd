package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join — for each left row, the nearest right row
  * within the same key: backward (right.time <= left.time, the
  * default), forward (right.time >= left.time), each with an optional
  * match tolerance (SURVEY.md §2.2 row 52) — the pandas `merge_asof`
  * direction/tolerance surface.
  *
  * Spark has no native as-of join; rather than a custom physical
  * operator, this composes built-ins the way the optimizer likes:
  * tag both sides, UNION them (no join at all!), then a single
  * last_value/first_value(ignoreNulls) window ordered by time within
  * each key. One shuffle on the key, linear in total rows — the
  * classic scalable formulation; a sort-merge-join based as-of would
  * shuffle both sides too but then pay a per-key merge with no
  * codegen.
  *
  * Ties (equal timestamps) resolve to the right row, matching the
  * inclusive `<=`/`>=` semantics in both directions.
  */
object AsOf {

  /** Internal helper columns must not already exist on the input —
    * withColumn would silently REPLACE the caller's same-named column
    * and the final drop would swallow it, corrupting output. Loud
    * beats a generated fresh name here: these are reserved internal
    * names, same contract as the SQL translator's __-prefixed helper
    * namespace. */
  private def requireFree(df: DataFrame, side: String, names: String*): Unit = {
    val clash = df.columns.filter(c => names.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"$side input columns [${clash.mkString(", ")}] collide with " +
        s"reserved internal helper names [${names.mkString(", ")}]")
  }

  /** Backward as-of: the most recent right row with
    * right.time <= left.time. leftTime/rightTime are long (e.g. epoch
    * micros) columns. Returns left rows + `asof_time` (matched right
    * time) and `asof_value` (right value column); `tolerance` nulls a
    * match further than that many time units before the left time. */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, rightValue: String,
           tolerance: Option[Long] = None): DataFrame =
    asof(left, right, key, leftTime, rightTime, rightValue,
      forward = false, tolerance)

  /** Forward as-of: the EARLIEST right row with
    * right.time >= left.time (e.g. "next maintenance after failure",
    * "first response after request"). Same plan shape and cost as the
    * backward join — the window frame flips to the following rows. */
  def joinForward(left: DataFrame, right: DataFrame, key: String,
                  leftTime: String, rightTime: String, rightValue: String,
                  tolerance: Option[Long] = None): DataFrame =
    asof(left, right, key, leftTime, rightTime, rightValue,
      forward = true, tolerance)

  /** Batch interval (range) join: left rows paired with every right
    * row of the same key whose [start, end] interval contains the
    * left time (inclusive both ends) — the point-in-interval shape
    * (event ↔ enclosing session/campaign/maintenance window) that a
    * naive formulation makes a cartesian-with-filter.
    *
    * Scale shape: right intervals explode to the `bucket`-sized time
    * buckets they overlap, left rows carry their single bucket, and
    * the join is a plain equi-join on (key, bucket) with the exact
    * range predicate as a residual — a narrow hash join instead of a
    * key-only join that replays every interval of a hot key against
    * every event. Each matching pair appears exactly once because a
    * left row has exactly ONE bucket. Pick `bucket` near the typical
    * interval length: an interval spanning B buckets costs B join
    * rows (the usual interval-bucketing tradeoff). Time columns are
    * longs (e.g. epoch micros); right rows with NULL bounds and left
    * rows with NULL time cannot match and are dropped (inner join). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightStart: String, rightEnd: String,
                   bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    requireFree(left, "left", "__b")
    requireFree(right, "right", "__b")
    val r = right
      .filter(F.col(rightStart).isNotNull && F.col(rightEnd).isNotNull &&
        F.col(rightStart) <= F.col(rightEnd))
      .withColumn("__b", F.explode(F.sequence(
        F.floor(F.col(rightStart) / bucket),
        F.floor(F.col(rightEnd) / bucket))))
    val l = left.filter(F.col(leftTime).isNotNull)
      .withColumn("__b", F.floor(F.col(leftTime) / bucket))
    l.join(r, Seq(key, "__b"))
      .filter(F.col(leftTime).between(F.col(rightStart), F.col(rightEnd)))
      .drop("__b")
  }

  private def asof(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String, rightValue: String,
                   forward: Boolean, tolerance: Option[Long]): DataFrame = {
    requireFree(left, "left", "__side", "__t", "__m", "__match",
      "asof_time", "asof_value")
    val valueType = right.schema(rightValue).dataType
    val l = left.withColumn("__side", F.lit(1))
      .withColumn("__t", F.col(leftTime))
      .withColumn("__m", F.lit(null).cast(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rt",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rv", valueType)))))
    // the matched time and value travel in ONE struct so they always
    // come from the SAME right row — independent ignoreNulls scans of
    // two columns would pair the latest non-null time with the latest
    // non-null VALUE of a different row whenever rightValue has nulls.
    // Right rows with a null time cannot be "nearest" — drop them.
    val r = right.filter(F.col(rightTime).isNotNull).select(
        F.col(key), F.col(rightTime).as("__t"),
        F.struct(F.col(rightTime).cast("long").as("rt"),
                 F.col(rightValue).as("rv")).as("__m"))
      .withColumn("__side", F.lit(0))
    val unioned = l.select(
      (Seq(key) ++ left.columns.filterNot(_ == key) ++
        Seq("__side", "__t", "__m")).distinct.map(F.col): _*)
      .unionByName(r, allowMissingColumns = true)

    // Backward: right rows sort BEFORE left rows at equal time and the
    // frame looks back → inclusive <=. Forward: right rows sort AFTER
    // left rows at equal time and the frame looks ahead → inclusive >=.
    // The trailing __m struct is a deterministic tiebreak among RIGHT
    // rows sharing the same (key, time): without it last/first picks a
    // partition-arrival-dependent row, breaking run-to-run and
    // cross-engine reproducibility. Backward resolves such ties to the
    // largest (rt, value) struct, forward to the smallest; left rows
    // carry a NULL struct and are unaffected.
    val sideOrd = if (forward) F.col("__side").desc else F.col("__side").asc
    val base = Window.partitionBy(key).orderBy(F.col("__t"), sideOrd, F.col("__m"))
    val matched =
      if (forward) {
        val w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        unioned.withColumn("__match", F.first("__m", ignoreNulls = true).over(w))
      } else {
        val w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("__match", F.last("__m", ignoreNulls = true).over(w))
      }
    // a left row with a NULL time never matches (pandas NaT
    // semantics). Backward gets this for free (nulls sort first, no
    // preceding rights); forward would otherwise pair nulls-first
    // left rows with the earliest right row — guard both directions.
    val withCols = matched
      .withColumn("asof_time",
        F.when(F.col("__t").isNotNull, F.col("__match.rt")))
      .withColumn("asof_value",
        F.when(F.col("__t").isNotNull, F.col("__match.rv")))
    val bounded = tolerance match {
      case Some(tol) =>
        // a match further than `tol` from the left time is no match
        // (pandas merge_asof tolerance)
        val ok =
          if (forward) F.col("asof_time") <= F.col("__t") + tol
          else F.col("asof_time") >= F.col("__t") - tol
        withCols
          .withColumn("asof_value", F.when(ok, F.col("asof_value")))
          .withColumn("asof_time", F.when(ok, F.col("asof_time")))
      case None => withCols
    }
    bounded
      .filter(F.col("__side") === 1)
      .drop("__side", "__t", "__m", "__match")
  }
}
