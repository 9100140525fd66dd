package graft

/** Guards the scale-critical physical-plan properties (SURVEY.md §4):
  * pushdown, pruning, broadcast choice, partial aggregation. A
  * regression that silently turns a broadcast join into a shuffle or
  * loses a pushed filter fails here, not at 100 TB. */
class PlanAuditSpec extends SparkTestBase {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
    df.queryExecution.executedPlan.toString()
  }

  test("filters are pushed to the parquet scan") {
    val p = plan("q_where_cmp")
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("GreaterThan(l_quantity,45.0)"), p.take(2000))
  }

  test("projection prunes the scan schema") {
    val p = plan("q_select_cols")
    assert(p.contains("ReadSchema"))
    // lineitem has 11 columns; only the 4 selected reach the scan
    assert(!p.contains("l_shipdate"), "unselected column was scanned")
  }

  test("dimension join broadcasts the small side") {
    assert(plan("q_join_inner").contains("BroadcastHashJoin"))
  }

  test("aggregation is two-phase with map-side partials") {
    val p = plan("q_aggregates")
    assert(p.contains("partial_sum") || p.contains("partial_"), p.take(1500))
  }

  test("in-subquery lowers to a semi join") {
    assert(plan("q_in_subquery").toLowerCase.contains("leftsemi"))
  }

  test("jaccard verification broadcasts the candidate set, not the corpus") {
    val p = plan("q_dedup_jaccard")
    assert(p.contains("BroadcastExchange"))
  }

  test("scans use whole-stage codegen") {
    // codegen'd operators render with a "*(n)" stage prefix
    assert(plan("q_case_when").contains("*("))
  }

  test("multi-join analytics broadcasts dims, no cartesian products") {
    val p = plan("q_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_sum"), "aggregation not two-phase")
  }

  test("OR-position in-subquery joins keys, no cartesian blowup") {
    val p = plan("q_in_subquery_or")
    // existence-flag join is key-equi (hash join on the probe key);
    // the only nested-loop is the broadcast 1-row summary cross join
    assert(p.contains("LeftOuter") || p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), "existence lowering produced a cartesian product")
  }

  test("simhash pair candidates join on (band, chunk) keys") {
    val df = SparkEntry.queries("q_dedup_simhash_pairs")(spark, TestSpark.sfDir)
    val joinConds = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.map(_.toString).getOrElse("")
    }
    assert(joinConds.exists(c => c.contains("band") && c.contains("chunk")),
      joinConds.mkString("\n"))
  }

  test("correlated NOT IN lowers to a hash anti join, no cartesian") {
    val p = plan("q_not_in_corr")
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "anti join fell back to a nested loop")
    assert(!p.contains("CartesianProduct"))
  }

  test("EXISTS under OR lowers to a key-equi presence join") {
    val p = plan("q_exists_or")
    assert(p.contains("LeftOuter"), p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "presence join is not hash/merge keyed")
    assert(!p.contains("CartesianProduct"))
  }

  test("HAVING in-subquery joins flags onto the aggregated result") {
    val p = plan("q_having_in_subquery")
    // the only nested-loop is the broadcast 1-row summary cross join;
    // the key join itself is hash-equi and aggregation stays two-phase
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("partial_count") || p.contains("partial_"),
      "aggregation not two-phase")
    assert(!p.contains("CartesianProduct"))
  }

  test("tfidf joins on keys with partial aggregation, no cartesian") {
    val p = plan("q_text_tfidf")
    assert(p.contains("partial_count") || p.contains("partial_"),
      "tf/df aggregation not two-phase")
    assert(!p.contains("CartesianProduct"),
      "tfidf produced a cartesian product")
    // the only nested-loop is the broadcast 1-row corpus-size N
    val bnl = "BroadcastNestedLoopJoin"
    assert(!p.contains(bnl) ||
      p.indexOf(bnl) == p.lastIndexOf(bnl), p.take(2000))
  }

  test("contamination joins the distinct train-shingle set on the key") {
    val p = plan("q_contamination")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_"), "shingle distinct/count not two-phase")
    assert(p.toLowerCase.contains("generate"),
      "shingle explode missing from the plan")
  }

  test("incremental dedup is a hash anti join on the text hash") {
    val p = plan("q_dedup_incremental")
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("label centroids aggregate with map-side partials after explode") {
    val p = plan("q_embed_centroids")
    assert(p.contains("partial_"), "centroid mean not two-phase")
    assert(p.toLowerCase.contains("generate"), "posexplode missing")
  }

  test("shard stats are a pure projection plus two-phase aggregation") {
    val p = plan("q_shard_stats")
    assert(p.contains("partial_"), "shard stats not map-side combined")
    assert(!p.contains("Join"), "shard assignment must not join")
  }

  // AQE wraps the executed plan in AdaptiveSparkPlanExec, which hides
  // its inner plan from collect() — count shuffles in the rendering
  private def shuffleCount(name: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan(name)).length

  test("sequence packing runs on ONE exchange, no (shard, seq) reshuffle") {
    // the whole packing (cumsum, seq, seq_pos) reuses the single
    // hashpartitioning(shard) exchange — the naive row_number over
    // (shard, seq) would add a second corpus-wide shuffle
    val p = plan("q_pack_sequences")
    assert(shuffleCount("q_pack_sequences") == 1, p.take(3000))
    assert(p.contains("hashpartitioning(shard"), p.take(3000))
  }

  test("quantization is shuffle-free whole-stage projection") {
    val p = plan("q_embed_quantize")
    assert(shuffleCount("q_embed_quantize") == 0, "quantization must not shuffle")
    assert(p.contains("*("), "quantization fell out of codegen")
  }

  test("projected subquery flags join on keys, no cartesian blowup") {
    val p = plan("q_in_select")
    assert(!p.contains("CartesianProduct"),
      "select-position flag lowering produced a cartesian product")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "flag join is not hash/merge keyed")
  }

  test("ngram top-k is a per-partition heap, not a global sort") {
    val p = plan("q_ngram_top")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("partial_"), "gram counts not map-side combined")
    // r4: the (gram, doc) pre-aggregate replaced count-distinct's
    // Expand, which doubled every exploded row before the shuffle
    assert(!p.contains("Expand"), "ngram counts regressed to Expand")
  }

  test("repetition stats are a shuffle-free per-row projection") {
    // r4: native graft_topgram_max — no explode, no (doc_id, gram)
    // shuffle, no join; two exchanges eliminated at any scale
    val p = plan("q_text_repetition")
    assert(shuffleCount("q_text_repetition") == 0, p.take(3000))
    assert(!p.contains("Generate"), "repetition regressed to explode")
    assert(!p.toLowerCase.contains("join"), "repetition regressed to a join")
  }

  test("tfidf derives df without a join (window over the tf table)") {
    val p = plan("q_text_tfidf")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "tfidf regressed to a df equi-join")
    // exchanges: (doc_id, term) agg, term window, doc_id top-k window
    assert(shuffleCount("q_text_tfidf") <= 3, p.take(3000))
  }

  test("theta flag lowerings join on equality keys, no row multiplication") {
    val p = plan("q_in_theta_or")
    assert(!p.contains("CartesianProduct"),
      "theta IN flag produced a cartesian product")
    assert(p.contains("partial_min") || p.contains("partial_max"),
      "theta decorrelation lost its per-group min/max partials")
  }

  test("grouped correlated scalar joins the grouped inner on corr keys") {
    val p = plan("q_scalar_corr_grouped")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("partial_"), "inner aggregation not two-phase")
  }

  test("grouped-inner EXISTS/IN decorrelate through keyed aggregates") {
    for (q <- Seq("q_exists_grouped", "q_in_grouped",
                  "q_exists_having", "q_in_having")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1500)}")
      assert(p.contains("partial_"), s"$q: inner aggregation not two-phase")
    }
  }

  test("<>-correlated flag lowers via (count,min,max) triple, no blowup") {
    val p = plan("q_exists_ne_flag")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("partial_count"), "lost the per-group count partial")
  }

  test("theta scalar subquery fuses to union + ONE key exchange + window") {
    // the r9 fusion: single-equality-keys + one-range-theta scalar
    // subqueries read the running aggregate from one window over the
    // unioned outer/inner rows — no join, no per-tuple aggregation
    val p = plan("q_scalar_theta")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("Union"), "lost the outer/inner union")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      "fused theta scalar must shuffle ONCE on the correlation keys\n" +
        p.take(2000))
    assert(p.contains("Window"), "lost the running-aggregate window")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "fused form must not join\n" + p.take(2000))
  }

  test("joint-theta flags join the distinct tuple table on keys") {
    for (q <- Seq("q_exists_theta_joint", "q_in_theta_joint",
                  "q_scalar_theta_joint")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1500)}")
      assert(p.contains("HashAggregate"),
        s"$q: lost the distinct-tuple aggregation")
    }
  }

  test("quantified comparisons join a grouped summary, no row blowup") {
    // correlated ANY/ALL: per-key (count, has-null, min, max) summary
    // left-joined on the correlation keys — a narrow key shuffle, no
    // cartesian, two-phase aggregation
    for (q <- Seq("q_quant_all", "q_quant_any_flag")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1500)}")
      assert(p.contains("HashAggregate"), s"$q: lost the summary aggregation")
    }
  }

  test("semantic dedup pairs join inside cells, never all-pairs") {
    val p = plan("q_dedup_semantic")
    assert(!p.contains("CartesianProduct"),
      "semantic dedup degenerated to an all-pairs cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "semantic dedup pair join lost its cell equi-key")
  }

  // ---- round 5 ------------------------------------------------------

  test("bloom dedup probes a broadcast filter in codegen") {
    val p = plan("q_dedup_bloom")
    assert(p.contains("graft_bloom_contains"), p.take(2000))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      "the 1-row Bloom filter should broadcast")
  }

  test("chunking is a pure Generate — zero exchanges") {
    val p = plan("q_text_chunks")
    assert(p.contains("Generate"), p.take(1500))
    assert(!p.contains("Exchange"), "chunking must not shuffle")
  }

  test("unnest lowers to one Generate with the array inlined") {
    val p = plan("q_unnest")
    assert(p.contains("Generate explode"), p.take(1500))
  }

  test("pivot is ONE two-phase aggregation") {
    val p = plan("q_pivot")
    assert(p.contains("partial_"), "pivot lost map-side partials")
    val shuffles = p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(shuffles == 1, s"pivot should shuffle once, saw $shuffles")
  }

  test("unpivot is a pure projection — zero exchanges") {
    val p = plan("q_unpivot")
    assert(!p.contains("Exchange"), "unpivot must not shuffle")
  }

  test("semi/anti join types reach the physical plan") {
    assert(plan("q_join_semi").toLowerCase.contains("leftsemi"))
    assert(plan("q_join_anti").toLowerCase.contains("leftanti"))
  }

  // ---- r5b additions ------------------------------------------------

  test("lateral top-n is one window plus one equi-join, no re-execution") {
    val p = plan("q_lateral_topn")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      p.take(3000))
    assert(!p.toLowerCase.contains("cartesian"), "top-n must not cartesian")
    // row_number filter happens BEFORE the join back — the join's
    // build side is the k-per-group survivors, not the full inner
    assert(p.contains("row_number"), p.take(3000))
  }

  test("from-position unnest is a single Generate over the scan") {
    val p = plan("q_unnest_from")
    assert("Generate ".r.findAllIn(p).length == 1, p.take(2000))
    assert(shuffleCount("q_unnest_from") == 0,
      "from-position unnest must not shuffle")
  }

  test("parallel unnest zip explodes the index sequence, not the arrays") {
    val p = plan("q_unnest_multi")
    // the Generate child is sequence(1, greatest(...)), and values are
    // re-read positionally (try_element_at renders as
    // element_at(..., None, false)) — arrays never feed the Generate
    assert(p.contains("sequence(1"), p.take(3000))
    assert(p.contains("element_at(__un_a"), p.take(3000))
  }

  test("domain cap is ONE window shuffle on the domain key") {
    assert(shuffleCount("q_domain_cap") == 1, plan("q_domain_cap").take(3000))
  }

  test("quantile gate broadcasts a one-row threshold, rows never move") {
    val p = plan("q_quality_filter")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(3000))
    assert(shuffleCount("q_quality_filter") == 0,
      "the corpus side of the quantile gate must not shuffle")
  }

  test("misra-gries is one global aggregation of bounded partials") {
    val p = plan("q_ngram_mg")
    // partial_misragries on every partition, ONE single-partition
    // exchange of the k-bounded sketches, no per-gram hashpartitioning
    assert(!p.contains("Exchange hashpartitioning(g"),
      "MG must not shuffle per-gram rows")
    assert(p.toLowerCase.contains("misragries"), p.take(3000))
  }

  test("windowed ordered-set aggregate is one partition-key window") {
    assert(shuffleCount("q_agg_string_window") == 1,
      plan("q_agg_string_window").take(3000))
  }

  test("theta lateral aggregates per distinct tuple, no cartesian") {
    val p = plan("q_lateral_theta")
    assert(!p.toLowerCase.contains("cartesian"), p.take(3000))
  }

  test("USING SAMPLE is a pure scan filter, no shuffle") {
    val p = plan("q_sample_sql")
    assert(p.contains("md5"), p.take(2000))
    // the sampled aggregate is one two-phase aggregation over the
    // filtered scan — the sample itself adds no exchange
    assert(shuffleCount("q_sample_sql") == 0, p.take(3000))
  }

  test("HAVING correlation joins flags/summaries on keys, no cartesian") {
    for (q <- Seq("q_having_exists_corr", "q_having_in_corr",
                  "q_having_quant_corr")) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("cartesian"), s"$q: ${p.take(1500)}")
      assert(p.contains("partial_"), s"$q: aggregation not two-phase")
    }
  }

  // ---- r5c lowerings ---------------------------------------------------

  test("mixed-side correlation keeps the equality hash join") {
    // q_scalar_mixed_corr has one equality conjunct + one mixed-side
    // residual: the tuple join must stay a HASH join on the equality
    // (the residual rides as its condition), never a nested loop over
    // orders × lineitem
    val p = plan("q_scalar_mixed_corr")
    assert(p.contains("HashJoin"), p.take(3000))
    assert(!p.toLowerCase.contains("nestedloop"), p.take(3000))
  }

  test("pure-OR correlation nested-loops the DISTINCT tuple table only") {
    // no decomposition exists for pure-OR correlation — the expected
    // plan is a BroadcastNestedLoopJoin whose build side is the
    // DEDUPLICATED tuple table (bounded by |distinct outer tuples|),
    // plus the null-safe hash join back
    val p = plan("q_exists_or_corr")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("HashAggregate") || p.contains("Deduplicate") ||
      p.contains("distinct"), p.take(3000))
  }

  test("pageRank rounds pre-aggregate contributions map-side") {
    // the public method checkpoints each round (its executed plan is
    // a checkpoint scan), so audit ONE round's plan directly
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val nodes = e.selectExpr("src as node")
      .union(e.selectExpr("dst as node")).distinct()
    val outDeg = e.groupBy("src")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("outdeg"))
    val ranks = nodes.withColumn("rank",
      org.apache.spark.sql.functions.lit(1.0 / 3))
    val p = graft.ops.Curation
      .pageRankRound(nodes, e, outDeg, ranks, 3L, 0.85)
      .queryExecution.executedPlan.toString()
    // in-degree skew collapses before the exchange; the dangling
    // mass is a broadcast, never a shuffle of ranks
    assert(p.contains("partial_sum"), p.take(3000))
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(!p.toLowerCase.contains("cartesian"), p.take(3000))
  }

  test("pq ADC search scans codes, broadcasts tables and candidates (r9)") {
    val p = plan("q_ann_pq")
    // the per-query distance tables and both rerank sides ride
    // broadcasts; the corpus never cross-joins anything unbounded
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.toLowerCase.contains("cartesianproduct"), p.take(3000))
    // the ADC candidate ranking is a window over the narrow scored
    // stream
    assert(p.contains("Window"), p.take(3000))
  }

  test("tuple IN semi/anti joins keep composite hash keys (r9)") {
    val g = Graft.forDir(spark, TestSpark.sfDir)
    val semi = g.query(
      """select o_orderkey from orders
         where (o_custkey, o_orderstatus) in
           (select c_custkey, 'F' from customer)""")
      .queryExecution.executedPlan.toString()
    // both tuple components are equi-keys -> hash semi join, no
    // nested loop, no cartesian
    assert(semi.contains("LeftSemi"), semi.take(3000))
    assert(!semi.toLowerCase.contains("nestedloop") ||
      semi.contains("BroadcastHashJoin"), semi.take(3000))
    assert(!semi.toLowerCase.contains("cartesianproduct"), semi.take(3000))
  }

  test("vocabulary stats broadcast the vocabulary, one term window") {
    val p = plan("q_text_vocab")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the top-V vocabulary comes from per-partition heaps, not a
    // global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.toLowerCase.contains("cartesian"), p.take(3000))
  }

  test("interval join is a (key, bucket) equi-join with a range residual") {
    val df = SparkEntry.queries("q_interval_join")(spark, TestSpark.sfDir)
    // the join must carry BOTH equi-keys — a key-only join would
    // replay every interval of a hot key against every event
    val joinConds = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.map(_.toString).getOrElse("")
    }
    assert(joinConds.exists(c => c.contains("user_id") && c.contains("__b")),
      joinConds.mkString("\n"))
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.toLowerCase.contains("cartesian"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("corpus overlap sketch pass is bounded map-side state, no hash shuffle") {
    val p = plan("q_corpus_overlap")
    // r7: BottomKDistinct partials cap per-partition state at k, so
    // the only shingle-side exchange carries one ≤k array per
    // partition (SinglePartition) — the former distinct() hash
    // shuffle of every distinct hash is gone entirely
    assert(p.contains("partial_graft_bottom_k"), p.take(3000))
    assert(!p.contains("Exchange hashpartitioning"),
      "a corpus-sized hash shuffle crept back into the sketch pass\n" +
        p.take(3000))
    assert(!p.contains("rangepartitioning"), p.take(3000))
    // the post-sketch union bottom-k stays a TakeOrdered heap
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("two-stage retrieval broadcasts queries and survivors, corpus never shuffles") {
    val df = SparkEntry.queries("q_two_stage")(spark, TestSpark.sfDir)
    val p = df.queryExecution.executedPlan.toString()
    // stage 1 broadcasts the query set; stage 2 broadcasts the
    // survivor id list into a hash join against the corpus scan
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(!p.toLowerCase.contains("cartesianproduct"), p.take(3000))
    // no exchange repartitions the corpus by anything but the two
    // per-query rank windows
    val corpusExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") &&
        !l.contains("query_id"))
    assert(corpusExchanges == 0,
      s"corpus-side shuffle leaked into the plan\n" + p.take(3000))
  }

  test("tpch q9: 6-way join broadcasts every dim, no cartesian, two-phase agg") {
    val p = plan("q_tpch_q9")
    // part/supplier/orders/nation all broadcast against the streamed
    // lineitem scan — the only exchanges are the final group-by's
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("SortMergeJoin"),
      "a dim join fell back to sort-merge\n" + p.take(3000))
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj == 4, s"expected 4 broadcast joins, saw $bhj\n" + p.take(3000))
    assert(p.contains("partial_sum"), "profit aggregation not two-phase")
    // the LIKE filter reaches the part scan
    assert(p.contains("StringContains(p_name,gear)"), p.take(3000))
  }

  test("tpch q18: HAVING-IN lowers to a semi join, not a re-aggregation join") {
    val p = plan("q_tpch_q18")
    assert(p.contains("LeftSemi"), "order-qualifier IN is not a semi join\n" +
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // exactly two shuffles: the inner per-order sum and the final
    // group-by (a re-aggregation join would add a third)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, s"expected 2 exchanges, saw $exchanges\n" + p.take(3000))
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 not pushed into TakeOrderedAndProject")
  }

  test("tpch q21: exists/not-exists pair is semi+anti on the order key, one exchange") {
    val p = plan("q_tpch_q21")
    // both correlated subqueries join key-equi on l_orderkey with the
    // <> suppkey theta as residual — never a cartesian or key-less loop
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "exists lowering lost its equi key\n" + p.take(3000))
    // the semi/anti carry the theta residual on the join itself
    assert(p.contains("NOT (l_suppkey"), p.take(3000))
    // the only shuffle is the final s_name group-by
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 exchange, saw $exchanges\n" + p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("GROUPS frames ride one partition exchange (ordinal + frames co-planned)") {
    // the hidden dense_rank ordinal windows by the SAME partition keys
    // as the frames it serves — all five window computations (ordinal,
    // g_sum, g_cnt, and the exclude algebra's frame/peer pairs) must
    // share the single hashpartitioning(c_mktsegment) exchange
    val p = plan("q_window_groups")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 exchange, saw $exchanges\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("asof SQL join is joinless: union + one key window") {
    val df = SparkEntry.queries("q_asof_sql")(spark, TestSpark.sfDir)
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("Join"), p.take(3000))
    assert(p.contains("Window"), p.take(3000))
    assert(p.contains("Union"), p.take(3000))
  }

  test("resample rides key-partitioned operators, no cartesian") {
    val p = plan("q_resample")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("Generate"), p.take(3000)) // the inline spine explode
    assert(p.contains("Window"), p.take(3000))   // the forward fill
  }

  test("try_cast lowering carries the regex pre-guard, not a bare TRY cast") {
    val p = plan("q_try_cast")
    // the failure-heavy casts must route through the RLike guard
    assert(p.contains("RLIKE") || p.contains("rlike"), p.take(3000))
    assert(p.contains("*("), p.take(2000)) // stays in whole-stage codegen
  }

  test("scd2 is one key-window exchange, no self-join") {
    val df = SparkEntry.queries("q_scd2")(spark, TestSpark.sfDir)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("Window"), p.take(3000))
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.isEmpty, "scd2 must not self-join")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected ONE key exchange, saw $exchanges\n" + p.take(3000))
  }

  test("rank-limit pushdown (WindowGroupLimit) fires on every top-k window (r10)") {
    // every `row_number over (partition by …) <= k` filter must plant
    // a WindowGroupLimit below the Window: each partition's stream is
    // heap-bounded to k rows per task BEFORE the sort/window, so no
    // per-query reducer ever materializes a corpus-sized partition
    // (VERDICT r9: the q_ann_pq candidate window risk). Spark plants
    // a Partial limit before the exchange and a Final one after —
    // pin at least one pair per query.
    for (q <- Seq("q_ann_brute", "q_ann_lsh", "q_ann_pq", "q_ann_ivfpq",
                  "q_two_stage", "q_lateral_topn", "q_domain_cap",
                  "q_text_bm25", "q_knn_graph")) {
      val p = plan(q)
      val n = p.linesIterator.count(_.contains("WindowGroupLimit"))
      assert(n >= 2, s"$q: expected a partial+final WindowGroupLimit " +
        s"pair, saw $n\n" + p.take(3000))
    }
    // q_ann_pq ranks twice (ADC candidates, exact rerank) — both
    // windows must be group-limited (2 pairs)
    val pq = plan("q_ann_pq")
    val nPq = pq.linesIterator.count(_.contains("WindowGroupLimit"))
    assert(nPq >= 4, s"q_ann_pq: expected 2 limited windows (4 nodes), " +
      s"saw $nPq\n" + pq.take(3000))
  }

  test("ivfAssign broadcasts the one-row centroid table, corpus never shuffles (r11)") {
    val df = SparkEntry.queries("q_ann_assign")(spark, TestSpark.sfDir)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastExchange"), p.take(3000))
    // the corpus side is a pure projection: the only exchange is the
    // tiny centroid-side single-partition collect, never a hash
    // repartition of the embeddings
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 0, s"corpus shuffled ($hashEx hash exchanges)\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("span dedup ranks first occurrences two-phase, no single-key window (r11)") {
    // a viral boilerplate span (one hash × 10^5 occurrences — exactly
    // this operator's target input) must never land in one task:
    // first-occurrence ranking is a two-phase min(struct(doc_id,pos))
    // aggregation (partial_min collapses hot hashes map-side) plus a
    // unique-keyed join — NOT a `row_number over (partition by hash)`
    // window (VERDICT r10 "What's wrong" #2).
    for (q <- Seq("q_dedup_remove_spans", "q_dedup_spans_cross")) {
      val p = plan(q)
      assert(p.contains("partial_min"),
        s"$q: no map-side partial_min on the span hash\n" + p.take(3000))
      val hashWindow = p.linesIterator.exists(l =>
        l.contains("Window") && l.contains("row_number"))
      assert(!hashWindow,
        s"$q: span hash row_number window reappeared\n" + p.take(3000))
      assert(!p.contains("CartesianProduct"), p.take(3000))
    }
  }

  test("ivf-pq ADC scan is cell-bounded: codes hash-join the probe set on the cell key (r10)") {
    val p = plan("q_ann_ivfpq")
    // the corpus codes scan must reach the broadcast (query, probe
    // cell, dtab) set through a HASH join keyed on the cell — never a
    // per-query full-code nested loop (pqTopK's flat shape)
    val hashOnCell = p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("[cell#"))
    assert(hashOnCell, "no BroadcastHashJoin keyed on cell\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // both rank windows (ADC candidates, exact rerank) group-limited
    val n = p.linesIterator.count(_.contains("WindowGroupLimit"))
    assert(n >= 4, s"expected 2 limited windows (4 nodes), saw $n\n" +
      p.take(3000))
  }

  test("pseudoShuffle never plans a global sort or single partition (r12)") {
    val p = plan("q_shuffle_order")
    // the window partitions by shard — hashpartitioning, never the
    // rangepartitioning/SinglePartition a global row_number would need
    assert(!p.contains("SinglePartition"), p.take(3000))
    assert(!p.contains("rangepartitioning"), p.take(3000))
    assert(p.contains("hashpartitioning(shard"), p.take(3000))
  }

  test("annRecall joins narrow pairs, no cartesian (r12)") {
    val p = plan("q_ann_recall")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // both top-k windows remain group-limited upstream of the audit
    assert(p.linesIterator.count(_.contains("WindowGroupLimit")) >= 2,
      p.take(3000))
  }

  test("mixtureAudit scans the corpus once; weights/total broadcast (r12)") {
    val df = SparkEntry.queries("q_mixture_audit")(spark, TestSpark.sfDir)
    val p = df.queryExecution.executedPlan.toString()
    // one aggregation over documents; the weights table and the 1-row
    // total both arrive as broadcasts
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents")) == 1,
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }
}
