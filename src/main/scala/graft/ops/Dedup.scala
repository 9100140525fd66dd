package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}

/** Document deduplication operators (SURVEY.md §2.2 rows 37-40).
  *
  * Everything is built from native Spark SQL expressions (codegen'd,
  * no UDFs) and banded LSH joins: candidate generation shuffles on
  * (band, signature) keys — never an O(n²) cross product — which is
  * the only shape that survives 100 TB. md5 is the cross-engine hash
  * (identical in Spark and DuckDB, so the driver's oracle can replay
  * the exact algorithm).
  */
object Dedup {

  /** Minhash permutations; one band per hash (OR-amplified LSH). */
  val NumHashes = 8
  /** Shingle width in tokens. */
  val ShingleN = 3

  /** Exact duplicate groups: hash-groupBy on the full text. Map-side
    * partial aggregation makes this one shuffle of (hash, id) pairs,
    * not documents. */
  def exactDuplicates(docs: DataFrame): DataFrame =
    docs.groupBy(F.md5(F.col("text")).as("text_hash"))
      .agg(F.min("doc_id").as("keep_id"), F.count(F.lit(1)).as("copies"))
      .filter(F.col("copies") > 1)
      .select("keep_id", "copies")

  /** doc_id + distinct token-n-gram shingles. */
  def withShingles(docs: DataFrame, n: Int = ShingleN): DataFrame = {
    val gram = (0 until n).map(k => s"element_at(__toks, i+$k)")
      .mkString(", ' ', ")
    docs.selectExpr("doc_id", "split(lower(text), ' ') as __toks")
      .selectExpr("doc_id",
        s"""array_distinct(transform(
              sequence(1, greatest(size(__toks) - ${n - 1}, 1)),
              i -> concat($gram))) as shingles""")
  }

  /** doc_id + NumHashes minhash signatures h0..h{k-1}; signature i is
    * the lexicographic min of md5("<i>:" + shingle). */
  def withMinhash(shingled: DataFrame): DataFrame =
    shingled.selectExpr(
      "doc_id" +: (0 until NumHashes).map(i =>
        s"array_min(transform(shingles, s -> md5(concat('$i:', s)))) as h$i"): _*)

  /** (doc_id, band, h) — one row per band signature, the LSH shuffle
    * key. */
  private def bandTable(docs: DataFrame): DataFrame = {
    val hs = (0 until NumHashes).map("h" + _).mkString(", ")
    withMinhash(withShingles(docs))
      .selectExpr("doc_id", s"posexplode(array($hs)) as (band, h)")
  }

  /** Candidate near-duplicate pairs: documents sharing any band
    * signature. The join shuffles on (band, h) — bucket sizes stay
    * bounded because equal signatures imply near-identical shingle
    * sets. */
  def minhashCandidates(docs: DataFrame): DataFrame = {
    val bands = bandTable(docs)
    bands.alias("a")
      .join(bands.alias("b"),
        F.col("a.band") === F.col("b.band") &&
        F.col("a.h") === F.col("b.h") &&
        F.col("a.doc_id") < F.col("b.doc_id"))
      .select(F.col("a.doc_id").as("id_a"), F.col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Candidates verified by exact n-gram Jaccard >= threshold.
    * Shingle arrays are only joined onto the (small) candidate set,
    * not shuffled wholesale. */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = withShingles(docs)
    minhashCandidates(docs)
      .join(sh.select(F.col("doc_id"), F.col("shingles").as("sh_a")),
            F.col("id_a") === F.col("doc_id")).drop("doc_id")
      .join(sh.select(F.col("doc_id"), F.col("shingles").as("sh_b")),
            F.col("id_b") === F.col("doc_id")).drop("doc_id")
      .selectExpr("id_a", "id_b",
        "size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b)) as jacc")
      .filter(F.col("jacc") >= threshold)
      .selectExpr("id_a", "id_b", "round(jacc, 4) as jacc")
  }

  /** 16-bit SimHash over token hashes: per-bit majority vote of
    * (+1/-1), entirely inside one whole-stage-codegen'd projection —
    * no shuffle at all. Hamming-band pair generation composes with
    * `minhashCandidates`-style banding on signature bytes. */
  def withSimhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    val hashed = docs.selectExpr("doc_id",
      """transform(split(lower(text), ' '),
         t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)) as __hs""")
    val terms = (0 until bits).map { j =>
      s"""(case when aggregate(__hs, 0L,
            (acc, h) -> acc + ((shiftright(h, $j) & 1) * 2 - 1)) > 0
          then 1 else 0 end) * ${1L << j}L"""
    }
    hashed.selectExpr("doc_id",
      s"cast(${terms.mkString(" + ")} as bigint) as simhash")
  }
}
