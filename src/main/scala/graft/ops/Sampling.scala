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
                       fraction: Double): DataFrame =
    df.filter(
      s"substring(md5(cast($keyCol as string)), 1, 8) < '${thresholdHex(fraction)}'")

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

  /** 8-hex-char keep threshold for `fraction`; "g" sorts after every
    * hex digit, so fraction 1.0 keeps ALL rows (2^32 formats to NINE
    * chars, which lexicographic compare would get wrong). */
  def thresholdHex(fraction: Double): String =
    if (fraction >= 1.0) "g"
    else f"${(fraction.max(0) * (1L << 32)).toLong}%08x"

  /** Data-mixture reweighting: keep a DIFFERENT fraction of each
    * group (e.g. downsample web crawl to 0.3, keep curated sources at
    * 1.0). Same md5-threshold mechanics as [[consistentSample]] — a
    * pure filter, no shuffle, pushdown-friendly — with the threshold
    * selected per group; groups absent from `fractions` fall back to
    * `default`. Membership is reproducible across runs, engines and
    * partitionings, and MONOTONE in the fraction: raising a group's
    * weight only ADDS rows to the sample (the kept set at 0.3 is a
    * subset of the kept set at 0.5), which keeps successive mixture
    * tweaks comparable at 100 TB. */
  def weightedSample(df: DataFrame, groupCol: String, keyCol: String,
                     fractions: Map[String, Double],
                     default: Double = 1.0): DataFrame = {
    // Column-expression CASE (not SQL-text splicing): group values go
    // through lit(), so quotes/backslashes/newlines in group keys
    // can't break out of (or corrupt) a string literal
    val threshold = fractions.toSeq.sortBy(_._1).foldRight(
      F.lit(thresholdHex(default))) { case ((g, f), acc) =>
      F.when(F.col(groupCol) === F.lit(g), F.lit(thresholdHex(f)))
        .otherwise(acc)
    }
    df.filter(F.expr(s"substring(md5(cast($keyCol as string)), 1, 8)")
      < threshold)
  }

  /** Temperature-scaled domain mixture (r6) — the multilingual/
    * multi-source rebalancing rule (the mBERT/XLM-R exponent-smoothed
    * sampling): group d's target sampling probability is
    * p_d ∝ n_d^tau (tau < 1 upweights small domains relative to
    * their share; tau = 1 is proportional = no rebalancing), and the
    * per-group keep fraction for a `targetRows`-sized sample is
    * f_d = min(1, p_d · targetRows / n_d). Membership then uses the
    * same md5-threshold filter as [[consistentSample]] — pure,
    * reproducible, monotone in targetRows.
    *
    * Plan shape: one tiny groupBy for the per-group counts, the
    * weight normalizer folded over the SORTED weight list (sequential
    * sorted summation is bit-reproducible on any engine — a plain
    * SUM's accumulation order is not), one broadcast join of the
    * per-group threshold, then the pure filter — the corpus itself
    * never shuffles. tau = 0.5 and 1.0 use sqrt/identity (IEEE-exact,
    * oracle-replayable); other exponents go through pow, which is
    * libm-dependent across engines (documented, same caveat family
    * as ln()). NULL groups get their own class (null-safe join). */
  def temperatureMixture(df: DataFrame, groupCol: String, keyCol: String,
                         targetRows: Long, tau: Double = 0.5): DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    require(tau > 0 && tau <= 1, "temperature must be in (0, 1]")
    // same reserved-helper-name contract as AsOf/Export: an input
    // column named like a helper would be silently replaced/dropped
    locally {
      val reserved = Seq("__n", "__w", "__g", "__f", "__wsum")
      val clash = df.columns.filter(c => reserved.exists(_.equalsIgnoreCase(c)))
      require(clash.isEmpty,
        s"input columns [${clash.mkString(", ")}] collide with reserved " +
          s"internal helper names [${reserved.mkString(", ")}]")
    }
    val counts = df.groupBy(groupCol).agg(F.count(F.lit(1)).as("__n"))
    val w =
      if (tau == 0.5) F.sqrt(F.col("__n").cast("double"))
      else if (tau == 1.0) F.col("__n").cast("double")
      else F.pow(F.col("__n").cast("double"), F.lit(tau))
    val weighted = counts.withColumn("__w", w)
    val tot = weighted.agg(F.expr(
      "aggregate(array_sort(collect_list(__w)), 0D, (a, x) -> a + x)")
      .as("__wsum"))
    val frac = weighted.crossJoin(F.broadcast(tot))
      .withColumn("__f", F.least(F.lit(1.0),
        F.col("__w") / F.col("__wsum") * F.lit(targetRows.toDouble) /
          F.col("__n").cast("double")))
      .select(F.col(groupCol).as("__g"), F.col("__f"))
    val thr = F.when(F.col("__f") >= 1.0, F.lit("g"))
      .otherwise(F.lpad(F.lower(F.hex(
        F.floor(F.col("__f") * 4294967296.0).cast("bigint"))), 8, "0"))
    df.join(F.broadcast(frac), F.col(groupCol) <=> F.col("__g"))
      .filter(F.substring(F.md5(F.col(keyCol).cast("string")), 1, 8) < thr)
      .drop("__g", "__f")
  }

  /** Deterministic train/val/test (N-way) split assignment (r5): the
    * row's md5 hash lands in one of the cumulative [0,1) intervals —
    * a pure per-row projection (no shuffle, engine-replayable), and
    * STABLE under fraction tweaks the way a training pipeline needs:
    * growing a split's fraction only moves rows across the ADJACENT
    * boundary (train 0.8→0.9 moves val rows into train; membership of
    * everything else is untouched), because assignment is by fixed
    * hash position against moving thresholds. Fractions must sum to
    * ≤ 1; the last split absorbs the remainder. */
  def splitAssign(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "splitAssign needs at least one split")
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"split fractions sum to $total > 1")
    val cum = splits.init.scanLeft(0.0)(_ + _._2).tail
    val hex = F.expr(s"substring(md5(cast($keyCol as string)), 1, 8)")
    val assignment = splits.init.zip(cum).foldRight(
      F.lit(splits.last._1): org.apache.spark.sql.Column) {
      case (((name, _), c), acc) =>
        F.when(hex < F.lit(thresholdHex(c)), name).otherwise(acc)
    }
    df.withColumn("split", assignment)
  }
}
