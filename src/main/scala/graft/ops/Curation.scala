package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Web-crawl curation primitives for training-data pipelines: URL
  * canonicalization, registered-domain extraction, and per-domain
  * document caps (the standard crawl-mixture control: no domain may
  * contribute more than N documents, keeping the best N by a caller-
  * chosen ordering).
  *
  * All three are pure codegen'd column expressions / one-window plans
  * — no UDFs, no driver-side work — so they run unchanged at any
  * scale. (The reference engine, sql_to_ibis, has no crawl-curation
  * surface; these extend the pipeline-operator set of SURVEY.md §2.2.)
  */
object Curation {

  /** Canonical URL form: lowercase, scheme stripped, a leading
    * `www.` stripped, query string and fragment stripped, trailing
    * slashes stripped. Every step is one anchored regexp (at most one
    * match), so Spark's replace-all and other engines' replace-first
    * semantics agree — the DuckDB oracle replays the identical chain.
    */
  def normalizedUrl(url: Column): Column = {
    val lower    = F.lower(url)
    val noScheme = F.regexp_replace(lower, "^[a-z][a-z0-9+.-]*://", "")
    val noWww    = F.regexp_replace(noScheme, "^www\\.", "")
    val noQuery  = F.regexp_replace(noWww, "[?#].*$", "")
    F.regexp_replace(noQuery, "/+$", "")
  }

  /** Host part of a canonicalized URL (up to the first `/`). */
  def host(url: Column): Column =
    F.regexp_extract(normalizedUrl(url), "^([^/]+)", 1)

  /** Registered-domain heuristic: the last two dot-separated labels
    * of the host (`a.b.example.com` → `example.com`); a dot-free host
    * is its own domain. A production pipeline would broadcast-join
    * the public-suffix list instead — same plan shape (a tiny
    * broadcast lookup), different table. */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    F.coalesce(
      F.nullif(F.regexp_extract(h, "([^.]+\\.[^.]+)$", 1), F.lit("")), h)
  }

  /** Quantile-threshold filtering — "keep the top `keepFrac` of the
    * corpus by this score", the standard quality-gate after scoring.
    * Two aggregations, no extra shuffle of the data itself: the
    * (1 − keepFrac) quantile reduces to ONE broadcast row and the
    * corpus filters against it — rows never move. `exact = true` uses
    * Spark's exact interpolating percentile (≡ DuckDB quantile_cont,
    * so the oracle replays it bit-for-bit); at 100 TB pass
    * `exact = false` for approx_percentile — identical plan shape
    * (mergeable sketch partials instead of a per-value map) with a
    * bounded rank error. */
  def keepTopQuantile(df: DataFrame, score: Column, keepFrac: Double,
                      exact: Boolean = true): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, "keepFrac must be in (0, 1]")
    val q = 1.0 - keepFrac
    val thrCol =
      if (exact) F.call_function("percentile", score, F.lit(q))
      else F.call_function("approx_percentile", score, F.lit(q), F.lit(10000))
    val thr = df.agg(thrCol.as("__q_thr"))
    df.crossJoin(F.broadcast(thr))
      .filter(score >= F.col("__q_thr"))
      .drop("__q_thr")
  }

  /** Keep at most `n` rows per domain, best-first by `order` (pass a
    * total order — include a unique id as the last key — so the kept
    * set is deterministic). ONE row_number window partitioned by the
    * domain: a single hash shuffle on the domain key at any corpus
    * size, with per-group state bounded by the running counter (the
    * window needs no buffering beyond the sort). Heavy-hitter domains
    * concentrate their rows in one task by construction — for a
    * pathological single-domain corpus, pre-filter with a salted
    * count-and-sample pass before the exact cap. */
  def capPerDomain(docs: DataFrame, url: Column, n: Int,
                   order: Seq[Column]): DataFrame = {
    require(n > 0, "cap must be positive")
    docs
      .withColumn("__dom", registeredDomain(url))
      .withColumn("__dom_rn",
        F.row_number().over(
          Window.partitionBy(F.col("__dom")).orderBy(order: _*)))
      .filter(F.col("__dom_rn") <= n)
      .drop("__dom", "__dom_rn")
  }
}
