package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Text analysis operators (SURVEY.md §2.2 rows 44-47): language ID,
  * quality scoring, token counting, fingerprinting. Pure per-row
  * projections — whole-stage codegen, zero shuffle, trivially
  * data-parallel at any scale.
  */
object TextAnalysis {

  /** Small stopword lists keyed by language for the n-gram/stopword
    * language-ID heuristic (single source of truth: the native
    * expression's tables — the oracle SQL builders read this too). */
  val stopwords: Map[String, Seq[String]] = graft.functions.TextStats.Stopwords

  /** doc_id + the one-pass stats struct (graft.functions.TextStats):
    * every count the text operators need from a single primitive-loop
    * traversal inside whole-stage codegen. The previous formulation
    * (interpreted higher-order `filter` lambdas, re-evaluated per
    * referencing output column) was 37.8 s of the round-1 sf0.1 bench;
    * the derived arithmetic below is bit-identical to it. */
  private def withStats(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.selectExpr("doc_id", "graft_textstats(text) as __st")
  }

  /** Language-ID scores per language + argmax prediction
    * (deterministic tie-break in en>es>fr>de order). Scores are
    * stopword-hit / token-count ratios: int/int division, same IEEE
    * double as the size(filter(...))/size(...) formulation. */
  def langId(docs: DataFrame): DataFrame =
    withStats(docs)
      .selectExpr("doc_id",
        "round(__st.stop_en / __st.tok_total, 6) as s_en",
        "round(__st.stop_es / __st.tok_total, 6) as s_es",
        "round(__st.stop_fr / __st.tok_total, 6) as s_fr",
        "round(__st.stop_de / __st.tok_total, 6) as s_de")
      .selectExpr("doc_id", "s_en", "s_es", "s_fr", "s_de",
        """case when s_en >= s_es and s_en >= s_fr and s_en >= s_de then 'en'
                when s_es >= s_fr and s_es >= s_de then 'es'
                when s_fr >= s_de then 'fr'
                else 'de' end as pred_lang""")

  /** Heuristic quality score from stopword density and
    * punctuation/symbol ratio. The composite is computed from the RAW
    * ratios — deriving it from pre-rounded values puts it exactly on
    * rounding boundaries where engines' modes diverge. */
  def qualityScore(docs: DataFrame): DataFrame =
    withStats(docs)
      .selectExpr("doc_id",
        "cast(__st.n_chars as bigint) as n_chars_m",
        "__st.stop_en / __st.tok_total as __stop",
        "(__st.n_chars - __st.n_kept) / __st.n_chars as __punct")
      .selectExpr("doc_id", "n_chars_m",
        "round(__stop, 6) as stop_ratio",
        "round(__punct, 6) as punct_ratio",
        "round(__stop * 0.5 + (1.0 - __punct) * 0.5, 6) as quality")

  /** Whitespace token count + a BPE-ish regex token count (letter
    * runs, digit runs, single symbols). */
  def tokenCounts(docs: DataFrame): DataFrame =
    withStats(docs).selectExpr("doc_id",
      // bigint casts align output dtypes with engines where len() is
      // 64-bit (the DuckDB oracle)
      "cast(__st.n_ws as bigint) as n_ws_tokens",
      "cast(__st.n_bpe as bigint) as n_bpe_tokens")

  /** Normalization for dedup/training prep: lowercase, collapse
    * whitespace runs, strip non-printable/control characters, trim.
    * Pure projection — codegen'd, shuffle-free. */
  def normalize(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id",
      """trim(regexp_replace(regexp_replace(lower(text),
           '[^ -~]', ''), ' +', ' ')) as norm_text""")

  /** Light PII-style masking: digit runs become '#', email-shaped
    * spans become '<email>'. Regex-only — the shape of a masking
    * stage; production would swap in real recognizers. */
  def maskSensitive(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id",
      """regexp_replace(regexp_replace(text,
           '[a-z0-9.+_-]+@[a-z0-9-]+\\.[a-z]+', '<email>'),
           '[0-9]+', '#') as masked_text""")

  /** Winnowing-style fingerprint: minimum md5 over all character
    * 8-grams, via the one-pass native expression
    * (graft.functions.RollingMinHash). */
  def fingerprint(docs: DataFrame, window: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.selectExpr("doc_id", s"graft_fingerprint(text, $window) as fp")
  }

  /** BM25 keyword retrieval (r7, SURVEY §2.2 row 106): top-k
    * documents per query by the Okapi BM25 score over whitespace
    * terms — the lexical-retrieval complement of the embedding ANN
    * family (two-stage RAG pipelines run exactly this next to
    * `Similarity.twoStageTopK`).
    *
    * Scale shape: doc term frequencies shuffle ONCE on (doc_id,
    * term) with map-side partials; the query-term table (tiny by
    * construction) broadcasts, and tf rows for non-query terms die
    * at that broadcast semi join BEFORE the document-frequency
    * aggregation, so df/idf work is proportional to matched rows,
    * not the corpus vocabulary. Document lengths ride the same tf
    * table (sum over the doc partition of tf — no second text
    * scan); N and avgdl are a broadcast one-row aggregate; the final
    * top-k is one row_number window per query. Nothing quadratic —
    * cost is bounded by |postings of query terms|.
    *
    * The idf factor is the BM25 ratio WITHOUT the log —
    * (N - df + 0.5) / (df + 0.5) — for the same reason as
    * [[tfidfTopTerms]]: +,-,*,/ are IEEE-bit-identical across
    * engines, ln() is not, and the DuckDB oracle must reproduce
    * scores exactly. Production would wrap log1p; the plan shape is
    * unchanged. Term matching is exact lowercase whitespace tokens
    * (the corpus tokenization). */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be positive")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // r12 restructure (guide §2.3 — project/filter BEFORE the
    // exchange): the old shape built the FULL corpus tf table
    // (explode every word, shuffle every (doc, term) pair) and then
    // derived dl / avgdl / hits from it — with the tf subtree
    // recomputed per consumer, four corpus text passes and a
    // corpus-wide shuffle for a query that only ever needs the
    // postings of the query terms. Now: corpus stats fold in ONE
    // text pass with no explode (dl ≡ sum of tf over a doc's terms ≡
    // word count; docs whose every token is empty have no tf rows,
    // so avgdl averages only dl > 0), and the postings aggregate
    // only AFTER the broadcast term filter — the exchange carries
    // matching (doc, term, dl) rows instead of the whole corpus.
    val stats = docs
      .select(F.expr("size(graft_word_ngrams(lower(text), 1))").as("__dl"))
      .agg(F.count(F.lit(1)).as("__n"),
        F.avg(F.when(F.col("__dl") > 0, F.col("__dl"))).as("__avgdl"))
    val qTerms = queries
      .selectExpr("query_id",
        "explode(graft_word_ngrams(lower(terms), 1)) as term")
      .distinct()
    // Document frequency MUST count distinct docs per term, so the
    // semi filter here is against the distinct TERM set — joining
    // against (query_id, term) first would replicate each tf row per
    // query containing the term and multiply df accordingly (r7
    // ADVICE). hits rows stay distinct (doc, term) by construction,
    // so df is a plain count — no count-distinct Expand.
    val qTermSet = qTerms.select("term").distinct()
    // the doc length rides the explode as a scalar (the ngram
    // expression stays INLINE in the generator — materializing the
    // array column first would copy it per element, the 13× Generate
    // trap), so no corpus-side dl join is ever needed
    // hits (the query-term postings) has two consumers — df and the
    // scoring join. Materialize it so the text scan + explode runs
    // once (guide §3.3; spark.graft.checkpointDir flips the blocks to
    // reliable checkpoints — the 100 TB posture); df then aggregates
    // two-phase over the materialized postings (skew-safe — a
    // per-term window would concentrate a stopword's postings in one
    // task, the vocabularyStats lesson).
    val hits = Materialize(docs
      .withColumn("__dl", F.expr("size(graft_word_ngrams(lower(text), 1))"))
      .select(F.col("doc_id"), F.col("__dl"),
        F.explode(F.expr("graft_word_ngrams(lower(text), 1)")).as("term"))
      .join(F.broadcast(qTermSet), Seq("term"))
      .groupBy("doc_id", "term", "__dl").agg(F.count(F.lit(1)).as("tf")))
    val df = hits.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val scored = hits
      .join(F.broadcast(qTerms), Seq("term"))
      .join(F.broadcast(df), Seq("term"))
      .crossJoin(F.broadcast(stats))
      .withColumn("__contrib",
        (F.col("__n").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5) *
          (F.col("tf") * (k1 + 1)) /
          (F.col("tf") + F.lit(k1) *
            (F.lit(1 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))))
      .groupBy("query_id", "doc_id")
      // 6dp round BEFORE ranking (the ANN-entry convention): the
      // per-pair contribution sum's accumulation order is the only
      // cross-engine nondeterminism, and ranking the rounded score
      // keeps the k-boundary stable
      .agg(F.round(F.sum("__contrib"), 6).as("score"),
        F.count(F.lit(1)).as("n_terms"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("score").desc, F.col("doc_id").asc)
    scored.withColumn("rnk", F.row_number().over(w))
      .filter(F.col("rnk") <= k)
      .select("query_id", "doc_id", "score", "n_terms", "rnk")
  }

  /** Greedy longest-match subword token counts against a fixed vocab
    * (r8, verdict item 2): the deterministic MaxMatch encoder — the
    * inference-time half of BPE/WordPiece — as a REAL token counter
    * for the budget operators (packSequences, budgetSelect,
    * retentionCurve weights), replacing the whitespace heuristic
    * where a caller supplies a vocab. One codegen'd trie walk per
    * document (functions/BpeTokens.scala); the vocab broadcasts as a
    * plan literal, so the count is engine-replayable — the DuckDB
    * oracle reproduces it with a longest-first `(?s)` regex
    * alternation plus `.` (identical semantics, proven in OpsSpec by
    * differential against regexp_extract_all). */
  def bpeCount(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.selectExpr("doc_id",
      s"graft_bpe_count(lower(text), ${vocabLit(vocab)}) as n_bpe")
  }

  /** The token array itself (diagnostics / downstream encoders). */
  def bpeTokens(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.selectExpr("doc_id",
      s"graft_bpe_tokens(lower(text), ${vocabLit(vocab)}) as toks")
  }

  // Spark SQL's lexer treats '' as two ADJACENT literals concatenated
  // ('don''t' → 'dont'), not an escaped quote — backslash-escape
  // instead (r8 ADVICE; escapedStringLiterals=false default).
  private def vocabLit(vocab: Seq[String]): String =
    vocab.map(v => "'" +
        v.replace("\\", "\\\\").replace("'", "\\'") + "'")
      .mkString("array(", ", ", ")")

  /** A demonstration subword vocab over the synthetic corpus'
    * word stock — overlapping entries ("table"/"tab", "window"/"win")
    * exercise the longest-match rule; single letters and the space
    * keep unknown fallbacks rare but present. */
  val DemoVocab: Seq[String] = Seq(
    "window", "stream", "table", "batch", "value", "scan", "sort",
    "quer", "tab", "win", "val", "a", "e", "s", "t", " ")

  /** Learns a BPE merge vocabulary from the corpus (r8): classic
    * byte-pair encoding over the WORD-FREQUENCY table — iteratively
    * merge the most frequent adjacent symbol pair, ties broken
    * lexicographically (fully deterministic, engine-replayable).
    *
    * Scale shape: ONE distributed job — tokenize + word counts (a
    * (word) two-phase aggregation) + top-`maxWordTypes` by (count,
    * word) — then the merge loop runs DRIVER-LOCAL over that bounded
    * table (the pqTrain pattern: training state is vocabulary-sized
    * by construction, never corpus-sized; 100k word types × merge
    * rounds is milliseconds). No per-merge Spark jobs — a
    * distributed pair-count per merge would pay `numMerges` job
    * floors for data that fits in one partition.
    *
    * Returns (base single characters ++ merged subwords in merge
    * order) — a ready vocab for the [[bpeCount]]/[[bpeTokens]]
    * greedy MaxMatch encoder. (Greedy longest-match is the standard
    * WordPiece-style inference; it does not replay merge ORDER like
    * a strict BPE encoder, which is fine for the token-budget use —
    * the counts are deterministic either way.) */
  def learnBpeVocab(docs: DataFrame, numMerges: Int,
                    maxWordTypes: Int = 100000): Seq[String] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val wordFreq: Array[(String, Long)] = docs
      .selectExpr("explode(graft_word_ngrams(lower(text), 1)) as w")
      .groupBy("w").agg(F.count(F.lit(1)).as("c"))
      .orderBy(F.col("c").desc, F.col("w").asc)
      .limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // driver-local BPE: words as symbol sequences
    var words: Array[(Array[String], Long)] =
      wordFreq.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = Seq.newBuilder[String]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        val merged = best._1 + best._2
        merges += merged
        words = words.map { case (syms, c) =>
          val out = Array.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 &&
                syms(j + 1) == best._2) { out += merged; j += 2 }
            else { out += syms(j); j += 1 }
          }
          (out.result(), c)
        }
        i += 1
      }
    }
    val baseChars = wordFreq.iterator.flatMap(_._1.iterator)
      .map(_.toString).toSeq.distinct.sorted
    (baseChars ++ merges.result()).distinct
  }

  /** Top-k salient terms per document by a TF-IDF-style score.
    *
    * Shape at scale: the token explode is a flatMap (no shuffle); term
    * frequencies shuffle on (doc_id, term) with map-side partials; the
    * document frequency is a WINDOW count over the term partition of
    * that same tf table — df(term) = number of tf rows for the term —
    * which replaces the former groupBy("term")+join-back-on-term pair
    * (two exchanges and a join) with one exchange and no join at any
    * scale; the corpus size N is a broadcast 1-row aggregate; the
    * final top-k is one window shuffle on doc_id. Nothing quadratic,
    * nothing driver-side.
    *
    * The idf factor is the BM25 ratio WITHOUT the log —
    * (N - df + 0.5) / (df + 0.5) — because +,-,*,/ are IEEE-defined
    * bit-identically across engines while ln() is not, so the driver's
    * DuckDB oracle reproduces scores (and therefore top-k membership)
    * exactly. Production at 100 TB would wrap it in log1p; the plan
    * shape is unchanged. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs
      .selectExpr("doc_id", "explode(split(lower(text), ' ')) as term")
      .filter("term <> ''")
    val tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).as("tf"))
    val n = docs.agg(F.count(F.lit(1)).as("__n"))
    val scored = tf
      .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
      .crossJoin(F.broadcast(n))
      .withColumn("score",
        F.col("tf") * (F.col("__n").cast("double") - F.col("df") + F.lit(0.5)) /
          (F.col("df").cast("double") + F.lit(0.5)))
    val w = Window.partitionBy("doc_id")
      .orderBy(F.col("score").desc, F.col("term").asc)
    scored.withColumn("rnk", F.row_number().over(w))
      .filter(F.col("rnk") <= k)
      .select("doc_id", "term", "tf", "score", "rnk")
  }

  /** Corpus-relative vocabulary statistics per document (r5c) — the
    * CCNet-style language-model quality gate without the KenLM
    * dependency: documents whose tokens are mostly OUTSIDE the
    * corpus's core vocabulary (or whose tokens are corpus-rare on
    * average) are gibberish, wrong-language, or boilerplate-coded
    * text. Per document: token count, out-of-vocabulary token count
    * and ratio against the `vocabSize` most frequent corpus tokens
    * (ties broken lexicographically — deterministic vocabulary), and
    * the mean corpus frequency of its tokens. All ratios are exact
    * integer sums over one IEEE division, so the DuckDB oracle
    * replays them bit-identically (no log-probabilities — ln() is
    * libm-dependent; the ranking is order-equivalent).
    *
    * 100 TB shape: tokens pre-aggregate to (doc_id, term, cnt)
    * map-side (instance-level stopword skew collapses before any
    * exchange — same as tfidf); corpus term totals are a
    * groupBy('term') — TWO-PHASE, so a hot stopword collapses to one
    * partial row per map task before the exchange — joined back onto
    * the probe on the term key (r6; the previous `sum over (partition
    * by term)` window concentrated every document's row for a hot
    * stopword into one task with no skew remedy — a join lets AQE's
    * skew handling split the probe side, which a window never can);
    * the vocabulary is ≤ vocabSize rows via per-partition TakeOrdered
    * heaps and BROADCASTS to the probe; the final aggregation keys
    * on doc_id. Nothing quadratic, nothing driver-side. */
  def vocabularyStats(docs: DataFrame, vocabSize: Int = 1000): DataFrame = {
    val toks = docs
      .selectExpr("doc_id", "explode(split(lower(text), ' ')) as term")
      .filter("term <> ''")
    val tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).as("cnt"))
    val totals = tf.groupBy("term").agg(F.sum("cnt").as("tc"))
    val vocab = totals
      .orderBy(F.col("tc").desc, F.col("term").asc)
      .limit(vocabSize)
      .select("term").withColumn("__iv", F.lit(true))
    tf.join(totals, Seq("term"))
      .join(F.broadcast(vocab), Seq("term"), "left_outer")
      .groupBy("doc_id")
      .agg(
        F.sum("cnt").as("n_tokens"),
        F.sum(F.when(F.col("__iv").isNull, F.col("cnt"))
          .otherwise(F.lit(0L))).as("n_oov"),
        (F.sum(F.when(F.col("__iv").isNull, F.col("cnt"))
          .otherwise(F.lit(0L))).cast("double") /
          F.sum("cnt")).as("oov_ratio"),
        (F.sum(F.col("cnt") * F.col("tc")).cast("double") /
          F.sum("cnt")).as("mean_tok_freq"))
  }

  /** Gopher-style repetition signals per document: fraction of
    * repeated words (1 - distinct/total) and the frequency share of
    * the most common bigram. High values flag boilerplate/spam for
    * training-data filtering.
    *
    * Every signal is a PER-ROW computation — no explode, no shuffle,
    * no join: `size(array_distinct(w))` is the exploded
    * COUNT(DISTINCT) value, and the top-bigram count is the native
    * one-pass [[graft.functions.TopGramMax]] (`max(c)` of the
    * exploded per-doc bigram counts; the bigram total is just
    * `size(w) - 1`). The r3 formulation shuffled the exploded bigrams
    * on (doc_id, gram) and re-aggregated on doc_id — two exchanges
    * that this pure projection eliminates at every scale. Fractions
    * are int/int IEEE divisions left UNROUNDED: word counts are often
    * powers of two, which puts rounded values exactly on .xx5
    * boundaries where engines' rounding modes diverge (identical
    * doubles canonicalize identically instead). Documents with fewer
    * than two words surface a NULL top_bigram_frac (the exploded form
    * emits no rows for them). */
  def repetitionStats(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.selectExpr("doc_id",
        "filter(split(lower(text), ' '), t -> t <> '') as w")
      .filter("size(w) > 0")
      .selectExpr("doc_id",
        "cast(size(w) as bigint) as n_words",
        "cast(size(array_distinct(w)) as double) as __nd",
        """case when size(w) >= 2
             then cast(graft_topgram_max(w, 2) as double) / (size(w) - 1)
           end as top_bigram_frac""")
      .withColumn("dup_word_frac",
        F.lit(1.0) - F.col("__nd") / F.col("n_words"))
      .select("doc_id", "n_words", "dup_word_frac", "top_bigram_frac")
  }

  /** Within-document span dedup: splits `text` on a LITERAL separator
    * (regex-quoted) and keeps only the FIRST occurrence of each span,
    * preserving order — the line-level cleanup web-scale pipelines
    * run before corpus dedup (navigation chrome and boilerplate lines
    * repeat inside a page; dropping repeats sharpens every downstream
    * near-dup signal). Pure per-row projection: whole-stage codegen,
    * no shuffle, embarrassingly parallel.
    *
    * First-occurrence filtering is SPARK's array_distinct (r12): it
    * appends elements in input order, so it IS the first-occurrence
    * filter, one O(m) hash pass per row inside codegen. The previous
    * `array_position(sp, sp[i]) = i` spelling paid interpreted HOF
    * dispatch per element TIMES an O(m) array_position scan per
    * element — O(m²) per document (measured 0.36 s vs DuckDB's
    * 0.03 s at sf0.1). Cross-engine the ORACLE keeps the
    * array_position spelling (array_distinct order is NOT an
    * engine-portable contract — DuckDB's differs — but Spark's is
    * documented first-occurrence and OpsSpec pins it on planted
    * out-of-order duplicates). The two forms differ only on NULL
    * array ELEMENTS (dropped before; array_distinct keeps one) —
    * unreachable here because split() never yields null elements;
    * NULL text stays NULL. */
  def dedupSpans(docs: DataFrame, sep: String = "\n"): DataFrame = {
    val quoted = java.util.regex.Pattern.quote(sep)
    val kept = F.expr("array_distinct(__sp)")
    docs.withColumn("__sp", F.split(F.col("text"), quoted))
      .withColumn("text",
        F.when(F.col("text").isNull, F.lit(null))
          .otherwise(F.array_join(kept, sep)))
      .drop("__sp")
  }

  /** Corpus-level n-gram heavy hitters: the `k` most frequent word
    * n-grams with occurrence and document counts — the discovery pass
    * behind boilerplate blocklists (navigation chrome, license
    * headers, templated spam repeat across millions of pages; the
    * repetition signals above are per-document, this is the
    * cross-document view).
    *
    * Scale shape: ONE explode pass, pre-aggregated on (gram, doc_id)
    * and re-aggregated on gram. A single
    * count(*) + count(distinct doc_id) aggregate looks cheaper but
    * Spark lowers it through an Expand that DOUBLES every exploded
    * row before the first shuffle; the two-step form dedups per-doc
    * repeats map-side (an exploded doc's grams are all in one
    * partition), so the first shuffle carries at most one row per
    * (gram, doc) and the second one row per gram. The global top-k is
    * TakeOrderedAndProject (per-partition heaps, k rows per partition
    * reach the final sort), never a full global sort. Tie-break on
    * the gram text keeps the k-boundary deterministic. */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 20): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be positive")
    // native one-pass gram stream (WordNgrams): short documents yield
    // an empty array — explode drops them like the old size() filter
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .selectExpr("doc_id",
        s"explode(graft_word_ngrams(lower(text), $n)) as g")
      .groupBy("g", "doc_id").agg(F.count(F.lit(1)).as("__c"))
      .groupBy("g")
      .agg(F.sum("__c").as("n_occ"), F.count(F.lit(1)).as("n_docs"))
      .orderBy(F.col("n_occ").desc, F.col("g").asc)
      .limit(k)
  }

  /** Approximate corpus n-gram heavy hitters (r5b): same inlined-
    * explode gram stream as [[topNgrams]], summarized by ONE global
    * Misra–Gries aggregation (graft.functions.HeavyHitters) instead
    * of the exact per-gram hash shuffle. Partials carry at most
    * `sketch` counters per partition regardless of gram cardinality —
    * the bounded-state plan for key spaces that outgrow a shuffle.
    * Counts are lower bounds within n/(sketch+1); with `sketch` above
    * the distinct-gram count they are exact (the oracle regime).
    * Output: the k largest estimates, gram-text tie-break. */
  def approxTopNgrams(docs: DataFrame, n: Int = 2, k: Int = 20,
                      sketch: Int = 4096): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be positive")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .selectExpr(s"explode(graft_word_ngrams(lower(text), $n)) as g")
      .agg(graft.functions.HeavyHitters.misraGries(F.col("g"), sketch).as("mg"))
      .select(F.explode(F.col("mg")).as(Seq("g", "n_est")))
      .orderBy(F.col("n_est").desc, F.col("g").asc)
      .limit(k)
  }

  /** Sliding-window document chunking (r5): long documents become
    * overlapping token-window chunks — the long-context training prep
    * that follows cleaning/dedup (chunk i covers whitespace tokens
    * [i·stride, i·stride+size), i while i·stride < n, so the tail
    * chunk may be short and consecutive chunks overlap by
    * size − stride tokens).
    *
    * Scale shape: a pure per-row Generate — the exploded sequence is
    * the (tiny) chunk-index list, never a token array (exploding a
    * materialized array column copies it per emitted element —
    * measured 13×, see topNgrams); the token slice re-derives from
    * `text` per chunk inside codegen. No shuffle at all: chunking
    * pipelines straight into the pack/shard exporters. NULL text
    * produces zero chunks. */
  def chunkDocuments(docs: DataFrame, size: Int = 64,
                     stride: Int = 48): DataFrame = {
    require(size >= 1 && stride >= 1, "size and stride must be positive")
    docs.filter(F.col("text").isNotNull)
      .selectExpr("doc_id", "text",
        s"explode(sequence(0, (size(split(text, ' ')) - 1) div $stride)) " +
          "as chunk_id")
      .selectExpr("doc_id", "chunk_id",
        s"array_join(slice(split(text, ' '), chunk_id * $stride + 1, $size)" +
          ", ' ') as chunk_text",
        s"size(slice(split(text, ' '), chunk_id * $stride + 1, $size)) " +
          "as n_tokens")
  }

  /** Bigram language-model quality score (SURVEY §2.2 row 122, r10) —
    * the CCNet-style LM filter: documents score by their mean bigram
    * log-probability under an add-k-smoothed bigram model,
    * score = (1/N) Σ n_g · ln((c(w1 w2) + k) / (c(w1 ·) + k · V)),
    * trained on `modelDocs` (a reference corpus — the CCNet shape) or
    * on `docs` itself (self-perplexity: boilerplate scores HIGH,
    * rare/garbled text scores LOW — both ends are filter signals).
    * Unseen bigrams/contexts back off to pure smoothing mass, so
    * out-of-model text is scored, never dropped.
    *
    * Plan shape: model counts are two hash aggregations over the
    * native one-pass gram stream (map-side partials); the vocabulary
    * size V rides a broadcast 1-row frame (no driver action — the
    * whole score is ONE lazy plan). Scoring aggregates each doc's
    * bigrams to (doc, gram, n) FIRST (map-side combine shrinks
    * repeated grams), then two key joins attach bigram and context
    * counts, and one doc_id aggregation folds the weighted mean.
    * Everything shuffles narrow gram/count rows, never text.
    *
    * Returns (doc_id, lm_score, n_bigrams); documents with fewer
    * than 2 tokens (or NULL text) read NULL score and 0 bigrams.
    * ln is the JVM's — cross-engine replay differs in final ulps, so
    * the gate entry is rows-only (documented; specs pin values). */
  def bigramLmScore(docs: DataFrame, modelDocs: Option[DataFrame] = None,
                    addK: Double = 0.5): DataFrame = {
    require(addK > 0, "additive smoothing constant must be positive")
    val (joined, vocab) = bigramLmCounts(docs, modelDocs)
    val scored = joined
      .crossJoin(vocab)
      .select(F.col("doc_id"), F.col("__n"),
        // in-plan guard (the raise_error FILTER pattern): an EMPTY
        // model has V = 0 and every probability collapses to x/0 =
        // +Inf - garbage that would flow downstream unflagged
        (F.when(F.col("__v") > 0,
          F.log((F.coalesce(F.col("__cb"), F.lit(0L)) + F.lit(addK)) /
                (F.coalesce(F.col("__cu"), F.lit(0L)) +
                  F.lit(addK) * F.col("__v"))))
          .otherwise(F.raise_error(F.lit(
            "bigram LM model corpus has no tokens"))) *
          F.col("__n")).as("__lp"))
      .groupBy("doc_id")
      .agg((F.sum("__lp") / F.sum("__n")).as("lm_score"),
        F.sum("__n").as("n_bigrams"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(F.col("doc_id"), F.col("lm_score"),
        F.coalesce(F.col("n_bigrams"), F.lit(0L)).as("n_bigrams"))
  }

  /** The shared count layer of the bigram LM: per-doc (gram, n) rows
    * left-joined to the model's bigram (`__cb`) and context (`__cu`)
    * counts, plus the broadcast 1-row vocabulary size (`__v`). All
    * exact integers — [[bigramLmParts]] anchors exactly this layer
    * cross-engine; [[bigramLmScore]] folds it into ln-space. */
  private def bigramLmCounts(docs: DataFrame,
                             modelDocs: Option[DataFrame])
      : (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val m = modelDocs.getOrElse(docs)
    val uni = m.select(
        F.explode(F.expr("graft_word_ngrams(lower(text), 1)")).as("__w1"))
      .groupBy("__w1").agg(F.count(F.lit(1)).as("__cu"))
    val vocab = F.broadcast(uni.agg(F.count(F.lit(1)).as("__v")))
    val bi = m.select(
        F.explode(F.expr("graft_word_ngrams(lower(text), 2)")).as("__g"))
      .groupBy("__g").agg(F.count(F.lit(1)).as("__cb"))
    val docGrams = docs.select(F.col("doc_id"),
        F.explode(F.expr("graft_word_ngrams(lower(text), 2)")).as("__g"))
      .groupBy("doc_id", "__g").agg(F.count(F.lit(1)).as("__n"))
      .withColumn("__w1", F.expr("substring_index(__g, ' ', 1)"))
    // r12 probe, for the record: BOTH materialization variants of this
    // layer measured WORSE at sf0.1 and were reverted — (a)
    // checkpointing `uni` so the 1-row vocabulary stops re-running the
    // model unigram pass (a wash: the saved pass equals the added
    // barrier job), and (b) the dsirPartsSelf treatment (per-doc gram
    // table checkpointed once with a model-side tag, bi derived from
    // it — one bigram pass instead of two): same-session closing pair
    // read q_text_lm_parts 0.87 s vs 0.50 s before the change, the
    // two checkpoint barriers costing more than the saved half-corpus
    // explode at this corpus size. The recompute-vs-materialize trade
    // only pays when the saved pass is large relative to a barrier
    // job (dsirLayer saves TWO full gram+md5 passes and keeps its
    // checkpoints; this layer saves one cheap explode).
    (docGrams.join(bi, Seq("__g"), "left").join(uni, Seq("__w1"), "left"),
      vocab)
  }

  /** Integer anchor for the bigram LM (r11, VERDICT r10 "What's
    * wrong" #1): the model counts behind [[bigramLmScore]] are exact
    * integers — only the final ln() is libm-dependent — so this
    * emits the per-document count layer for a full cross-engine
    * oracle: n_bigrams (Σ n_g), sum_num (Σ n_g·c(w1 w2), the
    * numerators before smoothing), sum_den (Σ n_g·c(w1 ·), the
    * context denominators), n_oov (Σ n_g over bigrams unseen in the
    * model — 0 when the model is the corpus itself), and the model
    * vocabulary size v. A gate entry over these verifies every input
    * to the ln-fold; the score itself stays spec-pinned.
    *
    * Same plan shape as the score: two model hash aggregations,
    * map-side-combined doc grams, two key joins, one doc_id fold;
    * the 1-row vocabulary broadcast joins LAST (after the per-doc
    * fold) so it multiplies nothing. */
  def bigramLmParts(docs: DataFrame,
                    modelDocs: Option[DataFrame] = None): DataFrame = {
    val (joined, vocab) = bigramLmCounts(docs, modelDocs)
    val parts = joined
      .groupBy("doc_id")
      .agg(F.sum("__n").as("n_bigrams"),
        F.sum(F.col("__n") * F.coalesce(F.col("__cb"), F.lit(0L)))
          .as("sum_num"),
        F.sum(F.col("__n") * F.coalesce(F.col("__cu"), F.lit(0L)))
          .as("sum_den"),
        F.sum(F.when(F.col("__cb").isNull, F.col("__n"))
          .otherwise(F.lit(0L))).as("n_oov"))
    docs.select("doc_id").join(parts, Seq("doc_id"), "left")
      .crossJoin(vocab)
      .select(F.col("doc_id"),
        F.coalesce(F.col("n_bigrams"), F.lit(0L)).as("n_bigrams"),
        F.coalesce(F.col("sum_num"), F.lit(0L)).as("sum_num"),
        F.coalesce(F.col("sum_den"), F.lit(0L)).as("sum_den"),
        F.coalesce(F.col("n_oov"), F.lit(0L)).as("n_oov"),
        F.col("__v").as("v"))
  }
}
