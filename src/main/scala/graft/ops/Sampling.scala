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

  /** Deterministic pseudo-shuffle for training order (r12): every
    * LLM pipeline must shuffle its corpus reproducibly — a real
    * random shuffle is neither repeatable nor resumable, and a
    * GLOBAL row_number is a single-partition bottleneck at corpus
    * scale. Each row gets `shuffle_key` = md5(seed:key) (uniform,
    * seed-varied per epoch), `shard` = the key's first-8-hex value
    * mod `shards` (the cross-engine conv/md5 idiom), and `pos` = its
    * rank WITHIN the shard (window over shard — shard-parallel, no
    * global sort). Reading shards in order, each ordered by pos,
    * yields the deterministic shuffled sequence; writers get there
    * with repartitionByRange(shard) + sortWithinPartitions(pos) —
    * no stage ever sees a global ordering. Scales. */
  def pseudoShuffle(df: DataFrame, keyCol: String, seed: String,
                    shards: Int): DataFrame = {
    require(shards >= 1, "shards must be at least 1")
    df.withColumn("shuffle_key",
        F.md5(F.concat_ws(":", F.lit(seed), F.col(keyCol).cast("string"))))
      .withColumn("shard", F.expr(
        s"cast(conv(substring(shuffle_key, 1, 8), 16, 10) as bigint) % $shards"))
      .withColumn("pos", F.row_number().over(
        Window.partitionBy("shard")
          .orderBy(F.col("shuffle_key"), F.col(keyCol))).cast("long"))
  }

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

  /** Per-source epoch plan (r11c) — the LLaMA-style data-recipe
    * calculator: given target mixture weights and a total token
    * budget, how many EPOCHS of each source the training run takes
    * (web 0.6 epochs, wiki 2.5 epochs, …). epochs_s =
    * budget·w_s / tokens_s; weights are normalized over the sources
    * PRESENT (sorted-order summation — bit-reproducible), sources
    * absent from `weights` get weight 0 (epochs 0 = excluded, listed
    * in the plan for auditability). Empty sources read NULL epochs
    * rather than ∞.
    *
    * Plan shape: ONE tiny groupBy over the corpus (map-side partial
    * sums), then pure driver-free arithmetic on the group frame —
    * the corpus never shuffles. Pair with [[upsampleEpochs]] to
    * materialize the recipe. */
  def epochPlan(docs: DataFrame, groupCol: String, tokenCol: String,
                weights: Map[String, Double],
                budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(weights.values.forall(_ >= 0), "weights must be nonnegative")
    // sorted-key sequential sum: reproducible across engines
    val wsum = weights.toSeq.sortBy(_._1).map(_._2).sum
    require(wsum > 0, "at least one weight must be positive")
    val w = weights.toSeq.sortBy(_._1).foldRight(F.lit(0.0): org.apache.spark.sql.Column) {
      case ((g, f), acc) =>
        F.when(F.col(groupCol) === F.lit(g), F.lit(f / wsum)).otherwise(acc)
    }
    docs.groupBy(groupCol)
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum(F.col(tokenCol).cast("bigint")).as("tokens"))
      .withColumn("weight", w)
      .withColumn("target_tokens",
        F.col("weight") * F.lit(budgetTokens.toDouble))
      .withColumn("epochs",
        F.when(F.col("tokens") > 0,
          F.col("target_tokens") / F.col("tokens").cast("double")))
  }

  /** Deterministic fractional upsampling (r11c) — materializes an
    * epoch recipe: each row of group g repeats floor(epochs_g) times,
    * plus one more when its md5-fraction falls below the fractional
    * part (so EXACTLY the epochs_g·n_g expected rows, deterministic,
    * reproducible across engines/partitionings, and monotone: raising
    * a group's epochs only ADDS copies). Output carries a 1-based
    * `epoch` column — downstream shuffling/packing can key on
    * (doc, epoch) so repeated copies spread across shards. epochs 0
    * (or an unlisted group under `default` 0) drops the group;
    * fractional membership uses the [[consistentSample]] hash, so
    * the epoch-2.3 kept set contains the epoch-2.2 one.
    *
    * Plan shape: a pure per-row projection + one Generate (explode
    * of a sequence bounded by ceil(epochs)) — no shuffle, no join;
    * the repeat factor is data-independent per group, so partition
    * sizes scale by epochs_g and nothing skews. */
  def upsampleEpochs(df: DataFrame, keyCol: String, groupCol: String,
                     epochs: Map[String, Double],
                     default: Double = 0.0): DataFrame = {
    require((epochs.values.toSeq :+ default).forall(e => e >= 0 && e <= 1000),
      "epochs must be in [0, 1000]")
    locally {
      val reserved = Seq("epoch", "__e", "__n")
      val clash = df.columns.filter(c =>
        reserved.exists(_.equalsIgnoreCase(c)))
      require(clash.isEmpty,
        s"input columns [${clash.mkString(", ")}] collide with " +
          s"output/helper names [${reserved.mkString(", ")}]")
    }
    val e = epochs.toSeq.sortBy(_._1).foldRight(
      F.lit(default): org.apache.spark.sql.Column) { case ((g, v), acc) =>
      F.when(F.col(groupCol) === F.lit(g), F.lit(v)).otherwise(acc)
    }
    // n = floor(e) + 1 more when hash-fraction < frac(e); floor+cast
    // of an integral-valued double is identical in both engines (a
    // bare double→int cast is NOT: Spark truncates, DuckDB rounds)
    val hashInt = F.expr(
      s"conv(substring(md5(cast($keyCol as string)), 1, 8), 16, 10)")
      .cast("bigint")
    val n = (F.floor(F.col("__e")) +
      F.when(hashInt < F.floor((F.col("__e") - F.floor(F.col("__e"))) *
        F.lit(4294967296.0)).cast("bigint"), 1L).otherwise(0L))
      .cast("int")
    df.withColumn("__e", e)
      .withColumn("__n", n)
      // filter before the Generate: sequence(1, 0) would DESCEND in
      // Spark ([1, 0]), not produce the empty array
      .filter(F.col("__n") >= 1)
      .withColumn("epoch", F.explode(F.expr("sequence(1, __n)")))
      .drop("__e", "__n")
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

  /** Leakage-safe split assignment (SURVEY §2.2, r11c): train/val/
    * test assignment keyed on the document's NEAR-DUP GROUP rather
    * than the document itself, so every member of a duplicate group
    * lands in the SAME split — the standard guard against eval
    * leakage (a near-copy of a test document sitting in train defeats
    * the held-out measurement; splitting by raw doc_id provides no
    * such guarantee). Groups come from the MinHash→Jaccard→connected-
    * components resolution ([[Dedup.duplicateGroups]]); singletons
    * (no near-dup) key on their own doc_id, which IS their group
    * representative, so the group keying is total.
    *
    * Plan shape: the group frame is tiny versus the corpus (only
    * near-duplicate members appear), so the doc_id join back is
    * broadcastable; assignment itself is the md5-threshold projection
    * of [[splitAssign]] on the group key — no extra shuffle beyond
    * row 67's own resolution. Stable under fraction tweaks exactly
    * like [[splitAssign]] (hash position vs moving thresholds), and
    * stable under corpus growth as long as group representatives are
    * (min-id representatives move only when a smaller id joins the
    * group).
    *
    * Returns the corpus with (group_id, split) appended. */
  def leakageSafeSplit(docs: DataFrame, splits: Seq[(String, Double)],
                       threshold: Double = 0.5): DataFrame = {
    locally {
      val reserved = Seq("group_id", "split")
      val clash = docs.columns.filter(c =>
        reserved.exists(_.equalsIgnoreCase(c)))
      require(clash.isEmpty,
        s"input columns [${clash.mkString(", ")}] collide with " +
          s"output names [${reserved.mkString(", ")}]")
    }
    val groups = Dedup.duplicateGroups(docs, threshold)
    val keyed = docs.join(groups, Seq("doc_id"), "left")
      .withColumn("group_id",
        F.coalesce(F.col("group_id"), F.col("doc_id")))
    splitAssign(keyed, "group_id", splits)
  }

  /** Deterministic hash-ring negative sampling (SURVEY §2.2 row 121,
    * r10) — contrastive-training pair mining: each anchor draws `k`
    * pseudo-random corpus partners by probing an md5 ring. Probe j of
    * anchor a lands at t = md5(a || '|' || j); the negative is the
    * corpus row with the largest hash <= t inside t's shard, wrapping
    * to the shard's max hash below the shard minimum — uniform over
    * the corpus (hashes are uniform), reproducible across runs and
    * engines (no RNG), and stable under corpus growth the way
    * md5-threshold sampling is.
    *
    * Shards are the first `shardHexChars` hex chars of the hash
    * (16^chars sub-rings): they bound the ring-walk sort AND set the
    * parallelism — 2 (256 shards) suits hundreds of executors; 3 is
    * the 100 TB dial. Plan: one union, ONE shard-key window pass
    * (match scan + shard max share the exchange), one hash-unique
    * join back for the partner id. Self-draws are filtered (an anchor
    * is its own nearest with probability ~1/n per probe), so an
    * anchor occasionally yields k-1 pairs; probes landing in an empty
    * shard (toy corpora only) draw nothing.
    *
    * Returns (anchor_id, j, neg_id). Ids must be distinct (the ring
    * is built on DISTINCT ids). */
  def hashNegatives(df: DataFrame, idCol: String, k: Int,
                    shardHexChars: Int = 2): DataFrame = {
    require(k >= 1, "k must be positive")
    require(shardHexChars >= 1 && shardHexChars <= 8,
      "shardHexChars must be in [1, 8]")
    import org.apache.spark.sql.expressions.Window
    val idType = df.schema(df.columns.find(_.equalsIgnoreCase(idCol))
      .getOrElse(idCol)).dataType
    val ids = df.select(F.col(idCol).as("__nid")).distinct()
    val ring = ids
      .withColumn("__h", F.md5(F.col("__nid").cast("string")))
      .withColumn("__b", F.substring(F.col("__h"), 1, shardHexChars))
    val probes = ids.select(F.col("__nid").as("anchor_id"))
      .withColumn("j",
        F.explode(F.expr(s"sequence(cast(1 as bigint), cast($k as bigint))")))
      .withColumn("__t", F.md5(F.concat_ws("|",
        F.col("anchor_id").cast("string"), F.col("j"))))
      .withColumn("__b", F.substring(F.col("__t"), 1, shardHexChars))
    val u = ring.select(F.col("__b"), F.col("__h").as("__o"),
        F.lit(0).as("__side"), F.col("__h").as("__rh"),
        F.lit(null).cast(idType).as("anchor_id"),
        F.lit(null).cast("bigint").as("j"))
      .unionByName(probes.select(F.col("__b"), F.col("__t").as("__o"),
        F.lit(1).as("__side"), F.lit(null).cast("string").as("__rh"),
        F.col("anchor_id"), F.col("j")))
    // ring rows sort before probes at equal hash (inclusive <=); the
    // backward scan and the shard max share one exchange
    val wScan = Window.partitionBy("__b")
      .orderBy(F.col("__o"), F.col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("__b")
    val matched = u
      .withColumn("__mh", F.last("__rh", ignoreNulls = true).over(wScan))
      .withColumn("__xh", F.max("__rh").over(wAll))
      .filter(F.col("__side") === 1)
      .withColumn("__gh", F.coalesce(F.col("__mh"), F.col("__xh")))
    matched.join(ring.select(F.col("__b"), F.col("__h").as("__gh"),
        F.col("__nid").as("neg_id")), Seq("__b", "__gh"))
      .filter(F.col("neg_id") =!= F.col("anchor_id"))
      .select("anchor_id", "j", "neg_id")
  }

  /** The shared hashed-feature layer of DSIR (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"):
    * word unigrams + bigrams hash into `buckets` ids via the
    * cross-engine md5-prefix (conv(md5[1:8], 16, 10) % buckets — the
    * same bucket in any engine), target/source corpora aggregate to
    * per-bucket counts (narrow int rows, map-side partials), each
    * scored doc's features map-side-combine to (doc, bucket, n), and
    * two bucket-key joins attach the model counts. Corpus totals ride
    * broadcast 1-row frames. Text never shuffles anywhere. */
  private def dsirLayer(docs: DataFrame, target: DataFrame,
                        source: DataFrame, buckets: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(buckets >= 2, "buckets must be at least 2")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val gramsExpr =
      "concat(graft_word_ngrams(lower(text), 1), graft_word_ngrams(lower(text), 2))"
    val bucketExpr =
      s"cast(conv(substring(md5(__g), 1, 8), 16, 10) as bigint) % $buckets"
    def bucketed(df: DataFrame, side: Int): DataFrame = df
      .select(F.explode(F.expr(gramsExpr)).as("__g"),
        F.lit(side).as("__side"))
      .selectExpr(s"$bucketExpr as __b", "__side")
    // ONE model aggregation over the side-tagged union (r12, VERDICT
    // r11 #4: target/source were two hash aggs joined twice — same
    // narrow int rows, twice the stages). sum(when) with no otherwise
    // keeps the unseen-bucket contract: a bucket with no TARGET
    // occurrences reads NULL __ct (all-NULL sum), exactly as the old
    // per-side aggregation's missing row did after the left join —
    // the OOV isNull tests downstream are unchanged.
    // The aggregated model table is ≤ `buckets` narrow rows — bounded
    // by construction, never by corpus size — and it has TWO
    // consumers (the per-doc bucket join and the corpus totals).
    // Without materialization each consumer re-runs the whole model
    // derivation (two full text scans + gram explodes + md5 per gram:
    // column pruning gives the consumers different projections, so
    // exchange reuse never fires). localCheckpoint computes it once
    // per invocation (guide §3.3 "materialise an intermediate"): a
    // table already small enough to broadcast is always small enough
    // to checkpoint (r12 opening measure: q_dsir_parts 1.65 s, the
    // totals branch re-exploded both model corpora). Materialize runs
    // a job at construction time; spark.graft.checkpointDir flips it
    // to reliable checkpoints (the 100 TB executor-loss posture).
    val mb = Materialize(bucketed(target, 1).unionAll(bucketed(source, 0))
      .groupBy("__b")
      .agg(F.sum(F.when(F.col("__side") === 1, F.lit(1L))).as("__ct"),
        F.sum(F.when(F.col("__side") === 0, F.lit(1L))).as("__cs")))
    val totals = F.broadcast(
      mb.agg(F.coalesce(F.sum("__ct"), F.lit(0L)).as("__nt"),
        F.coalesce(F.sum("__cs"), F.lit(0L)).as("__ns")))
    val docF = docs
      .select(F.col("doc_id"), F.explode(F.expr(gramsExpr)).as("__g"))
      .selectExpr("doc_id", s"$bucketExpr as __b")
      .groupBy("doc_id", "__b").agg(F.count(F.lit(1)).as("__n"))
    (docF.join(mb, Seq("__b"), "left"), totals, docs.select("doc_id"))
  }

  /** Integer anchor for DSIR (the bigramLmParts convention): the
    * per-document count layer feeding the ln-fold — n_feats (Σ n_b),
    * sum_t / sum_s (Σ n_b·count_b in the target/source model),
    * n_oov_t / n_oov_s (feature mass in buckets the model never saw),
    * and the corpus totals nt / ns — all exact integers, so a DuckDB
    * oracle verifies every input to [[dsirWeights]]' libm-bound
    * score. Docs with no features read all-zero rows. */
  def dsirParts(docs: DataFrame, target: DataFrame, source: DataFrame,
                buckets: Int = 8192): DataFrame = {
    val (joined, totals, ids) = dsirLayer(docs, target, source, buckets)
    dsirPartsFold(joined, totals, ids)
  }

  /** DSIR parts for the SELF-SPLIT shape (r12): target and source are
    * complementary predicate splits of the scored corpus itself (the
    * calibration / ablation setup — `dsirParts(docs, docs.filter(p),
    * docs.filter(!p))` computes exactly this). The generic layer
    * cannot see that all three frames share one corpus and pays THREE
    * full text passes (tokenize + per-gram md5 each); here the per-doc
    * (bucket, n) features compute ONCE, carry the side tag, and the
    * model counts aggregate FROM the feature table — one text pass
    * total. The feature table (narrow ints, ≤ min(buckets, grams)
    * rows per doc) is checkpointed because it has two consumers
    * (model aggregation + the bucket join); materializing it replaces
    * a second corpus scan — the guide §3.3 / §8 "decide on small
    * rows" trade, documented as the 100 TB posture too.
    * Result is row-identical to the generic form (spec-pinned). */
  def dsirPartsSelf(docs: DataFrame, targetCond: String,
                    buckets: Int = 8192): DataFrame = {
    require(buckets >= 2, "buckets must be at least 2")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val gramsExpr =
      "concat(graft_word_ngrams(lower(text), 1), graft_word_ngrams(lower(text), 2))"
    val bucketExpr =
      s"cast(conv(substring(md5(__g), 1, 8), 16, 10) as bigint) % $buckets"
    val feats = Materialize(docs
      .select(F.col("doc_id"), F.expr(targetCond).as("__side"),
        F.explode(F.expr(gramsExpr)).as("__g"))
      .selectExpr("doc_id", "__side", s"$bucketExpr as __b")
      .groupBy("doc_id", "__side", "__b").agg(F.count(F.lit(1)).as("__n")))
    // sum(when) with no otherwise keeps the unseen-bucket NULL
    // contract (the dsirLayer convention)
    val mb = Materialize(feats.groupBy("__b")
      .agg(F.sum(F.when(F.col("__side"), F.col("__n"))).as("__ct"),
        F.sum(F.when(!F.col("__side"), F.col("__n"))).as("__cs")))
    val totals = F.broadcast(
      mb.agg(F.coalesce(F.sum("__ct"), F.lit(0L)).as("__nt"),
        F.coalesce(F.sum("__cs"), F.lit(0L)).as("__ns")))
    dsirPartsFold(
      feats.drop("__side").join(mb, Seq("__b"), "left"), totals,
      docs.select("doc_id"))
  }

  private def dsirPartsFold(joined: DataFrame, totals: DataFrame,
                            ids: DataFrame): DataFrame = {
    val parts = joined.groupBy("doc_id")
      .agg(F.sum("__n").as("n_feats"),
        F.sum(F.col("__n") * F.coalesce(F.col("__ct"), F.lit(0L)))
          .as("sum_t"),
        F.sum(F.col("__n") * F.coalesce(F.col("__cs"), F.lit(0L)))
          .as("sum_s"),
        F.sum(F.when(F.col("__ct").isNull, F.col("__n"))
          .otherwise(F.lit(0L))).as("n_oov_t"),
        F.sum(F.when(F.col("__cs").isNull, F.col("__n"))
          .otherwise(F.lit(0L))).as("n_oov_s"))
    ids.join(parts, Seq("doc_id"), "left")
      .crossJoin(totals)
      .select(F.col("doc_id"),
        F.coalesce(F.col("n_feats"), F.lit(0L)).as("n_feats"),
        F.coalesce(F.col("sum_t"), F.lit(0L)).as("sum_t"),
        F.coalesce(F.col("sum_s"), F.lit(0L)).as("sum_s"),
        F.coalesce(F.col("n_oov_t"), F.lit(0L)).as("n_oov_t"),
        F.coalesce(F.col("n_oov_s"), F.lit(0L)).as("n_oov_s"),
        F.col("__nt").as("nt"), F.col("__ns").as("ns"))
  }

  /** DSIR importance weights (SURVEY §2.2 row 127, r11b): per-doc
    * log importance weight under add-k-smoothed hashed bag-of-ngram
    * models of a TARGET distribution (what you want more of) vs the
    * SOURCE distribution (what the corpus is),
    * log w = Σ_b n_b · [ln((ct_b+k)/(nt+k·B)) − ln((cs_b+k)/(ns+k·B))]
    * — resample ∝ w to shift the corpus toward the target (the DSIR
    * recipe; pair with [[consistentSample]]/quantile gates for the
    * deterministic selection step). Unseen buckets back off to pure
    * smoothing mass, so out-of-model docs score, never crash; empty
    * model corpora degrade to uniform (k·B > 0 guards every
    * denominator). ln is the JVM's — the gate entry for this score is
    * rows-only and [[dsirParts]] anchors its entire input layer
    * (the bigram-LM precedent). Returns (doc_id, dsir_logw, n_feats);
    * docs with no features read NULL weight, 0 features. */
  def dsirWeights(docs: DataFrame, target: DataFrame, source: DataFrame,
                  buckets: Int = 8192, addK: Double = 0.5): DataFrame = {
    require(addK > 0, "additive smoothing constant must be positive")
    val (joined, totals, ids) = dsirLayer(docs, target, source, buckets)
    val scored = joined
      .crossJoin(totals)
      .select(F.col("doc_id"), F.col("__n"),
        (F.col("__n") *
          (F.log((F.coalesce(F.col("__ct"), F.lit(0L)) + F.lit(addK)) /
                 (F.col("__nt") + F.lit(addK * buckets))) -
           F.log((F.coalesce(F.col("__cs"), F.lit(0L)) + F.lit(addK)) /
                 (F.col("__ns") + F.lit(addK * buckets))))).as("__lw"))
      .groupBy("doc_id")
      .agg(F.sum("__lw").as("dsir_logw"), F.sum("__n").as("n_feats"))
    ids.join(scored, Seq("doc_id"), "left")
      .select(F.col("doc_id"), F.col("dsir_logw"),
        F.coalesce(F.col("n_feats"), F.lit(0L)).as("n_feats"))
  }
}
