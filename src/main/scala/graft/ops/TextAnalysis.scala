package graft.ops

import org.apache.spark.sql.DataFrame

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
}
