package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Declarative data-quality constraint audit (SURVEY.md §2.2 row
  * 103) — the ingest gate a production training pipeline runs before
  * a batch is admitted to the corpus (the dbt-test / AWS-Deequ
  * pattern, re-expressed Spark-first; the reference has no quality
  * surface).
  *
  * Scale shape: every ROW-LOCAL rule (not-null, range, regex, set
  * membership) folds into ONE aggregation pass over the table — a
  * batch of k such rules costs one scan and a 1-row result no matter
  * the corpus size. Each uniqueness rule is one key-grouped
  * aggregation (two-phase, map-side partials), and each referential
  * rule one anti join against the DISTINCT key side (broadcast when
  * the dimension is small). Nothing driver-side, nothing quadratic;
  * violation counts arrive as one tiny frame of (rule, violations).
  */
object Quality {

  /** One declarative constraint; `name` keys the audit output row. */
  sealed trait Rule { def name: String }

  /** `col` must be non-null. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }

  /** Non-null `col` must fall in [lo, hi] (inclusive). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col)"
  }

  /** Non-null `col` must match `regex` (Java regex, `rlike`
    * partial-match semantics — anchor with ^...$ for full match). */
  final case class Matches(col: String, regex: String) extends Rule {
    def name = s"matches($col)"
  }

  /** Non-null `col` must be one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Rule {
    def name = s"in_set($col)"
  }

  /** `cols` must be unique together; violations = rows beyond the
    * first of each duplicated key (null keys group like values, the
    * GROUP BY convention). */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Non-null `col` must exist in `dimCol` of `dim` (foreign-key
    * presence). */
  final case class RefIntegrity(col: String, dim: DataFrame,
                                dimCol: String) extends Rule {
    def name = s"ref($col->$dimCol)"
  }

  /** Audits `df` against `rules`, returning one (rule, violations)
    * row per rule (row-local rules first, then unique/referential —
    * key on the `rule` column, not row order; violations is the
    * COUNT of offending rows, 0 when clean). See the class doc for
    * the per-rule-kind plan shapes. */
  def auditConstraints(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "auditConstraints needs at least one rule")
    val names = rules.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate rule names: ${names.diff(names.distinct).mkString(", ")}")
    def violations(c: Column): Column =
      F.sum(F.when(c, 1L).otherwise(0L)).as("violations")
    val rowLocal: Seq[(String, Column)] = rules.collect {
      case r @ NotNull(c) => r.name -> violations(F.col(c).isNull)
      case r @ InRange(c, lo, hi) => r.name ->
        violations(F.col(c).isNotNull &&
          (F.col(c) < F.lit(lo) || F.col(c) > F.lit(hi)))
      case r @ Matches(c, re) => r.name ->
        violations(F.col(c).isNotNull && !F.col(c).rlike(re))
      case r @ InSet(c, vs) => r.name ->
        violations(F.col(c).isNotNull && !F.col(c).isin(vs: _*))
    }
    val localFrame: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else Some {
        // one scan for the whole row-local batch; unpivot the single
        // result row into (rule, violations)
        val agged = df.agg(
          rowLocal.head._2.as("__v0"),
          rowLocal.tail.zipWithIndex.map { case ((_, c), i) =>
            c.as(s"__v${i + 1}") }: _*)
        agged.select(F.explode(F.map(
          rowLocal.zipWithIndex.flatMap { case ((n, _), i) =>
            Seq(F.lit(n), F.coalesce(F.col(s"__v$i"), F.lit(0L)))
          }: _*)).as(Seq("rule", "violations")))
      }
    val perRule: Seq[DataFrame] = rules.flatMap {
      case u @ Unique(cols) => Some(
        df.groupBy(cols.map(F.col): _*).agg(F.count(F.lit(1)).as("__n"))
          .agg(F.coalesce(F.sum(F.col("__n") - 1L), F.lit(0L))
            .as("violations"))
          .select(F.lit(u.name).as("rule"), F.col("violations")))
      case r @ RefIntegrity(c, dim, dc) => Some(
        df.filter(F.col(c).isNotNull)
          .join(dim.select(F.col(dc).as("__ref")).distinct(),
            F.col(c) === F.col("__ref"), "left_anti")
          .agg(F.count(F.lit(1)).as("violations"))
          .select(F.lit(r.name).as("rule"), F.col("violations")))
      case _ => None
    }
    (localFrame.toSeq ++ perRule).reduce(_ unionAll _)
  }

  /** Equi-width histogram of a numeric column over a caller-fixed
    * [lo, hi] range (r7b) — the data-profiling primitive behind
    * distribution drift checks ("did this batch's length/score
    * distribution move?").
    *
    * ONE aggregation pass (two-phase, map-side partials): bucket
    * index = least(bins−1, floor((x−lo)/w)) — floor and IEEE division
    * are exactly rounded, so bucket edges are engine-identical —
    * then every bucket materializes (empty ones read 0) by a
    * broadcast join of the tiny bucket spine against the aggregated
    * counts: bins rows total, never a corpus-sized structure. Values
    * outside [lo, hi] and NULLs are counted separately in the
    * `below`/`above`/`nulls` columns of every row (profilers need
    * the clipped mass; silently dropping it misreads drift). The
    * caller-fixed range keeps it one-pass at 100 TB; use
    * [[histogramAuto]] to spend a min/max pre-pass instead. */
  def histogram(df: DataFrame, col: String, bins: Int,
                lo: Double, hi: Double): DataFrame = {
    require(bins >= 1, "bins must be positive")
    require(lo < hi, "lo must be < hi")
    val w = (hi - lo) / bins
    val x = F.col(col).cast("double")
    val bucket = F.least(F.lit(bins - 1L),
      F.floor((x - F.lit(lo)) / F.lit(w))).cast("long")
    val counts = df
      .filter(x.isNotNull && x >= lo && x <= hi)
      .groupBy(bucket.as("bucket"))
      .agg(F.count(F.lit(1)).as("n"))
    val outside = df.agg(
      F.count(F.when(x < lo, 1)).as("below"),
      F.count(F.when(x > hi, 1)).as("above"),
      F.count(F.when(x.isNull, 1)).as("nulls"))
    val spine = df.sparkSession.range(bins).select(F.col("id").as("bucket"))
    spine.join(F.broadcast(counts), Seq("bucket"), "left_outer")
      .crossJoin(F.broadcast(outside))
      .select(F.col("bucket"),
        (F.lit(lo) + F.col("bucket") * w).as("bucket_lo"),
        (F.lit(lo) + (F.col("bucket") + 1) * w).as("bucket_hi"),
        F.coalesce(F.col("n"), F.lit(0L)).as("n"),
        F.col("below"), F.col("above"), F.col("nulls"))
  }

  /** Quality-gate feature vector (r7b): the heuristic signals as
    * MODEL FEATURES — stopword ratio, punctuation ratio, and a
    * saturating length feature n/(n+500) (rational, not log: every
    * op is exact-rounded IEEE on both engines, so scores replay
    * bit-identically cross-engine — ln/exp differ by libm ulps).
    * Consumes [[graft.ops.TextAnalysis.qualityScore]]'s rounded
    * outputs, so the features themselves are engine-deterministic. */
  def gateFeatures(docs: DataFrame): DataFrame =
    graft.ops.TextAnalysis.qualityScore(docs).selectExpr(
      "doc_id", "stop_ratio", "punct_ratio",
      // 500.0D: Spark SQL parses a bare 500.0 as DECIMAL(4,1) and the
      // whole feature silently becomes decimal — doubles keep the
      // cross-engine IEEE-exactness argument
      "n_chars_m / (n_chars_m + 500.0D) as len_sat")

  /** Linear quality scoring (r7b): margin = b + w·features, keep =
    * margin > 0 — ONE codegen'd projection at any corpus size, the
    * apply side of the fastText/CCNet-style model-based filter.
    * Weights usually come from [[trainGate]]; fixed weights replay
    * exactly in any engine (the oracle form). */
  def scoreGate(docs: DataFrame, wStop: Double, wPunct: Double,
                wLen: Double, intercept: Double): DataFrame =
    gateFeatures(docs)
      .withColumn("margin",
        F.lit(intercept) + F.col("stop_ratio") * wStop +
          F.col("punct_ratio") * wPunct + F.col("len_sat") * wLen)
      .withColumn("keep", F.col("margin") > 0)

  /** Trains the gate: logistic regression (Spark ML, L-BFGS) of a
    * labeled sample's keep/drop decisions over [[gateFeatures]].
    * Returns (wStop, wPunct, wLen, intercept) for [[scoreGate]].
    * Like pqTrain (Similarity.scala), the optimizer's result is not
    * bit-replayable in another engine — the oracle entry scores with
    * FIXED weights; the spec pins that training recovers a planted
    * separation. The fit itself runs on the labeled SAMPLE (small by
    * construction); applying the model stays a full-scale one-pass
    * projection. */
  def trainGate(docs: DataFrame, labels: DataFrame,
                labelCol: String = "label",
                maxIter: Int = 50): (Double, Double, Double, Double) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val data = gateFeatures(docs).join(labels, "doc_id")
    val assembled = new VectorAssembler()
      .setInputCols(Array("stop_ratio", "punct_ratio", "len_sat"))
      .setOutputCol("__f")
      .transform(data)
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setFeaturesCol("__f").setLabelCol(labelCol)
      .fit(assembled)
    val c = m.coefficients.toArray
    (c(0), c(1), c(2), m.intercept)
  }

  /** [[histogram]] with the range taken from the data: one extra
    * min/max aggregation pass (the small price of not knowing the
    * domain), then the fixed-range single pass. */
  def histogramAuto(df: DataFrame, col: String, bins: Int): DataFrame = {
    val x = F.col(col).cast("double")
    val r = df.agg(F.min(x), F.max(x)).head()
    require(!r.isNullAt(0) && !r.isNullAt(1),
      s"histogramAuto: column $col has no non-null values")
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    histogram(df, col, bins, lo, if (hi > lo) hi else lo + 1.0)
  }
}
