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
  /** Mixture-plan conformance audit (r12): given target proportions
    * per group (the epoch-plan/temperature-mixture output upstream),
    * reports how the ACTUAL corpus composition compares — per group:
    * observed count, observed share, target weight, expected count
    * (total × weight), and the observed/expected ratio (NULL for a
    * zero-weight group that nonetheless has rows — the loud case).
    * Groups in `weights` with NO rows still report (n = 0). The audit
    * every mixture pipeline runs after sampling: "did the corpus I
    * built match the plan?" One hash aggregation over the corpus +
    * a broadcast join against the tiny weights table; the corpus is
    * never re-scanned or shuffled wide. Weights need not sum to 1 —
    * they normalize here. Scales. */
  def mixtureAudit(df: DataFrame, groupCol: String,
                   weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "mixtureAudit needs at least one weight")
    require(weights.valuesIterator.forall(_ >= 0) &&
      weights.valuesIterator.sum > 0, "weights must be non-negative, sum > 0")
    val spark = df.sparkSession
    import spark.implicits._
    // sum in sorted-key order (map iteration order must not leak
    // into float results) and snap to 1.0 inside 1e-9: a plan whose
    // weights were WRITTEN to sum to 1 passes through verbatim
    // instead of picking up a /0.9999999999999999 ulp on every value
    val sorted = weights.toSeq.sortBy(_._1)
    val rawSum = sorted.map(_._2).sum
    val wNorm = if (math.abs(rawSum - 1.0) < 1e-9) 1.0 else rawSum
    val w = F.broadcast(
      sorted.map { case (g, v) => (g, v / wNorm) }.toDF(groupCol, "weight"))
    val counts = df.groupBy(groupCol).agg(F.count(F.lit(1)).as("n"))
    val joined = counts.join(w, Seq(groupCol), "full_outer")
      .select(F.col(groupCol),
        F.coalesce(F.col("n"), F.lit(0L)).as("n"),
        F.coalesce(F.col("weight"), F.lit(0.0)).as("weight"))
    // corpus total via an unpartitioned window over the JOINED frame
    // — one row per group by now, so the single-partition window
    // touches #groups rows; a separate agg would re-derive the
    // group-count aggregation and scan the corpus twice
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(F.lit(1))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    joined.withColumn("__total", F.sum("n").over(wAll))
      .select(F.col(groupCol), F.col("n"),
        (F.col("n").cast("double") / F.col("__total")).as("share"),
        F.col("weight"),
        (F.col("__total") * F.col("weight")).as("expected"),
        F.when(F.col("weight") > 0,
            F.col("n").cast("double") / (F.col("__total") * F.col("weight")))
          .otherwise(F.lit(null)).as("ratio"))
  }

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

  /** Gopher-style document quality rule bundle (SURVEY §2.2 row 125,
    * r11b) — the repetition-free subset of the Rae et al. 2021
    * (Gopher) / RedPajama quality heuristics as ONE codegen'd
    * projection (zero shuffle at any corpus size):
    *
    *  - word count within [minWords, maxWords]
    *  - mean word length within [minMeanLen, maxMeanLen]
    *  - symbol-to-word ratio ('#' and '...') ≤ maxSymbolRatio
    *  - ≤ maxBulletFrac of lines starting with a bullet (•, -, *)
    *  - ≤ maxEllipsisFrac of lines ending with '...'
    *  - ≥ minAlphaFrac of words containing an alphabetic character
    *  - ≥ minStopHits distinct hits from the Gopher 8-stopword list
    *
    * Every metric is counting + exact-rounded IEEE division (int/int
    * `/` is fractional in both engines), so the whole bundle replays
    * bit-identically in DuckDB — no transcendentals. Mean word length
    * reads as length(array_join(words, '')) / n_words: the join-sum
    * trick keeps it a pure string op instead of an interpreted
    * aggregate lambda. NULL text fails every rule (keep = false,
    * metrics NULL). Returns doc_id, the 6 metrics, 7 per-rule flags,
    * and the conjunction `keep`. */
  def gopherRules(docs: DataFrame,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  maxBulletFrac: Double = 0.9,
                  maxEllipsisFrac: Double = 0.3,
                  minAlphaFrac: Double = 0.8,
                  minStopHits: Int = 2): DataFrame = {
    val stopLit = GopherStopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
    docs
      .selectExpr("doc_id", "text",
        // whitespace-REGEX tokenization (the TextStats n_ws
        // convention): multi-line docs must not glue words across
        // line boundaries the way a single-space split would
        "filter(split(text, '\\\\s+'), t -> t <> '') as __w",
        "filter(split(lower(text), '\\\\s+'), t -> t <> '') as __lw",
        "split(text, chr(10)) as __ln")
      .selectExpr("doc_id", "text", "__w", "__lw", "__ln",
        "cast(size(__w) as bigint) as n_words",
        "cast(size(__ln) as bigint) as __nl")
      .selectExpr("doc_id", "n_words",
        "length(array_join(__w, '')) / n_words as mean_word_len",
        """((length(text) - length(replace(text, '#', '')))
            + (length(text) - length(replace(text, '...', ''))) / 3)
           / n_words as symbol_ratio""",
        """size(filter(__ln, l -> substring(ltrim(l), 1, 1) in ('•', '-', '*')))
           / __nl as bullet_frac""",
        """size(filter(__ln, l -> rtrim(l) like '%...'))
           / __nl as ellipsis_frac""",
        "size(filter(__w, t -> t rlike '[a-zA-Z]')) / n_words as alpha_frac",
        // array_intersect = DISTINCT common elements in both engines
        // (native set op — not a nested per-stopword HOF scan)
        s"cast(size(array_intersect(__lw, $stopLit)) as bigint) as n_stop_hits")
      // flags compare the UNROUNDED metrics (both engines compute the
      // identical IEEE doubles, so the comparisons agree; comparing
      // rounded values would flip at threshold-adjacent inputs); the
      // rounding below is display-only
      .selectExpr("*",
        s"coalesce(n_words between $minWords and $maxWords, false) as f_words",
        s"""coalesce(mean_word_len between $minMeanLen and $maxMeanLen,
           false) as f_mean_len""",
        s"coalesce(symbol_ratio <= $maxSymbolRatio, false) as f_symbols",
        s"coalesce(bullet_frac <= $maxBulletFrac, false) as f_bullets",
        s"coalesce(ellipsis_frac <= $maxEllipsisFrac, false) as f_ellipsis",
        s"coalesce(alpha_frac >= $minAlphaFrac, false) as f_alpha",
        s"coalesce(n_stop_hits >= $minStopHits, false) as f_stopwords")
      .withColumn("keep",
        F.col("f_words") && F.col("f_mean_len") && F.col("f_symbols") &&
          F.col("f_bullets") && F.col("f_ellipsis") && F.col("f_alpha") &&
          F.col("f_stopwords"))
      .selectExpr("doc_id", "n_words",
        "round(mean_word_len, 6) as mean_word_len",
        "round(symbol_ratio, 6) as symbol_ratio",
        "round(bullet_frac, 6) as bullet_frac",
        "round(ellipsis_frac, 6) as ellipsis_frac",
        "round(alpha_frac, 6) as alpha_frac", "n_stop_hits",
        "f_words", "f_mean_len", "f_symbols", "f_bullets", "f_ellipsis",
        "f_alpha", "f_stopwords", "keep")
  }

  /** Retention funnel audit (SURVEY §2.2, r11c): for an ORDERED list
    * of named boolean filter stages, the per-stage survivor counts a
    * curation pipeline reports — how many rows entered each stage,
    * how many passed it (having passed every earlier stage), and how
    * many were dropped THERE (first-failure attribution: a row that
    * fails stages 2 and 4 is charged to stage 2 only, so drop counts
    * sum to total − final survivors). The audit every multi-stage
    * filter recipe (Gopher → langid → dedup-gate …) publishes next to
    * its output corpus; without it a retention regression can't be
    * attributed to the stage that caused it.
    *
    * NULL predicates FAIL their stage (a doc with NULL text is
    * dropped by the stage that inspects it, never silently passed).
    *
    * Plan shape: stage predicates fold into cumulative pass flags in
    * ONE projection, a single global aggregation produces a 1-row
    * frame of per-stage sums (map-side partials — the exchange
    * carries one row per task), and `stack` unpivots it to one row
    * per stage. Zero joins, zero per-stage passes: cost is one corpus
    * scan regardless of stage count. */
  def retentionFunnel(df: DataFrame,
                      stages: Seq[(String, String)]): DataFrame = {
    require(stages.nonEmpty, "retentionFunnel needs at least one stage")
    require(stages.map(_._1).distinct.size == stages.size,
      s"stage names must be unique: ${stages.map(_._1).mkString(", ")}")
    val flagged = stages.zipWithIndex.foldLeft(df) {
      case (d, ((_, pred), i)) =>
        val prev = if (i == 0) "true" else s"__c${i - 1}"
        d.withColumn(s"__c$i", F.expr(s"$prev and coalesce(($pred), false)"))
    }
    val aggs = F.count(F.lit(1)).as("__total") +:
      stages.indices.map(i =>
        F.coalesce(F.sum(F.expr(s"cast(__c$i as bigint)")), F.lit(0L))
          .as(s"__n$i"))
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    val stackArgs = stages.zipWithIndex.map { case ((name, _), i) =>
      val nIn = if (i == 0) "__total" else s"__n${i - 1}"
      s"${i + 1}, '${name.replace("'", "''")}', $nIn, __n$i"
    }.mkString(", ")
    one.selectExpr(
        s"stack(${stages.size}, $stackArgs) as (stage_idx, stage, n_in, n_pass)")
      .selectExpr("cast(stage_idx as int) as stage_idx", "stage",
        "n_in", "n_pass", "n_in - n_pass as n_drop")
  }

  /** The Gopher rule set's stopword list (Rae et al. 2021 A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

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
