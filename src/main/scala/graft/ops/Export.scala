package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Training-data export operators (SURVEY.md §2.2 rows 75-76):
  * deterministic shard assignment and token-budget sequence packing.
  *
  * A 100 TB corpus ships to trainers as a fixed set of shards whose
  * membership must be reproducible across runs, engines and cluster
  * sizes — `rand()` or partition-index-based assignment is none of
  * those. Both operators key off md5 of a stable id (the same
  * cross-engine hash the dedup/sampling family uses), so the DuckDB
  * oracle replays the exact assignment.
  */
object Export {

  /** Backtick-quoted identifier for SQL-text fragments: a column name
    * with a space, hyphen or reserved word must not misparse when
    * spliced (embedded backticks double). */
  private def q(name: String): String = "`" + name.replace("`", "``") + "`"

  /** First 8 hex chars of md5(key) as a uniform unsigned 32-bit
    * value — identical in Spark (`conv(hex,16,10)`) and DuckDB
    * (`('0x'||hex)::BIGINT`). Column API, so any column name works. */
  private def hash32(key: Column): Column =
    F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Adds a deterministic `shard` column in [0, numShards): uniform
    * md5-hash of the key, mod the shard count. Pure projection — no
    * shuffle; membership is stable under repartitioning and identical
    * on any engine. Downstream writers `repartition($"shard")` +
    * `partitionBy("shard")` so each output file is one shard. */
  def withShard(df: DataFrame, keyCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    df.withColumn("shard", hash32(F.col(keyCol)) % numShards)
  }

  /** Per-shard row/byte totals — the balance check run before an
    * export is shipped (a skewed shard means a skewed training job).
    * One narrow (shard) shuffle with map-side partials. */
  def shardStats(df: DataFrame, keyCol: String, numShards: Int,
                 bytesCol: String): DataFrame =
    withShard(df, keyCol, numShards)
      .groupBy("shard")
      .agg(F.count(F.lit(1)).as("n_docs"),
           F.sum(F.col(bytesCol).cast("long")).as("n_bytes"))

  /** Writes the sharded corpus as one Hive partition per shard:
    * repartition on the shard column so each partition directory is
    * written by exactly one task (no small-file explosion — the
    * default would write numShards files from every input task). */
  def writeSharded(df: DataFrame, keyCol: String, numShards: Int,
                   path: String): Unit =
    withShard(df, keyCol, numShards)
      .repartition(F.col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Packs documents into training sequences of ~`budget` tokens:
    * documents are dealt to `numShards` independent streams by key
    * hash, laid out in hash order within each stream, and cut into
    * sequences by cumulative token count — `seq` is the sequence
    * index within the shard, `seq_pos` the document's position in its
    * sequence. A document whose tokens straddle a budget boundary
    * belongs to the sequence where it starts (contiguous fill; a
    * packer that splits documents works on the offsets this emits).
    *
    * Scale shape: the cumulative sum is a window per SHARD, so
    * parallelism is numShards and each window holds corpus/numShards
    * rows — at 100 TB, numShards is O(total tokens / executor-window
    * budget), e.g. 10k-100k shards, never a single global ordering.
    * Determinism: hash order is engine- and partitioning-independent,
    * so shard/seq/seq_pos are reproducible end-to-end. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, numShards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val reserved = Seq("__hk", "__cum", "__rn", "__prev", "__bstart",
      "__start", "seq", "seq_pos")
    val clash = df.columns.filter(c => reserved.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"input columns [${clash.mkString(", ")}] collide with reserved " +
        "packSequences helper/output names")
    val sharded = withShard(df, idCol, numShards)
      .withColumn("__hk", F.md5(F.col(idCol).cast("string")))
    val order = Window.partitionBy("shard")
      .orderBy(F.col("__hk"), F.col(idCol))
    val running = order
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // seq_pos (= row_number within (shard, seq)) is derived from
    // windows over the SAME (shard, hash-order) spec instead of a
    // second window partitioned by (shard, seq): every step below
    // reuses the one exchange+sort, where the naive formulation
    // re-shuffles the corpus on (shard, seq). A sequence's first row
    // is where `seq` steps (lag differs), and seq_pos is the distance
    // to that row.
    sharded
      .withColumn("__cum", F.sum(F.col(tokensCol).cast("long")).over(running))
      .withColumn("__rn", F.row_number().over(order))
      .withColumn("seq", F.expr(s"(__cum - ${q(tokensCol)}) div $budget"))
      .withColumn("__prev", F.lag("seq", 1).over(order))
      .withColumn("__bstart",
        F.when(F.col("__prev").isNull || F.col("__prev") =!= F.col("seq"),
               F.col("__rn")))
      .withColumn("__start", F.max("__bstart").over(running))
      .withColumn("seq_pos", (F.col("__rn") - F.col("__start") + 1).cast("int"))
      .drop("__hk", "__cum", "__rn", "__prev", "__bstart", "__start")
  }

  /** Materializes the packed training sequences: one output row per
    * (shard, seq) with the documents concatenated in seq_pos order —
    * what actually ships to the trainer after [[packSequences]]
    * assigns the layout.
    *
    * collect_list here is bounded by construction: a sequence holds at
    * most ~budget tokens, so per-group state is one training sequence,
    * never a corpus-sized buffer. Ordering is pinned by sorting the
    * (seq_pos, text) structs INSIDE the group (collect_list order is
    * otherwise partition-arrival order), making the concatenation
    * deterministic and engine-reproducible. One shuffle on
    * (shard, seq) with map-side partials.
    *
    * NULL text coalesces to the empty string BEFORE collection:
    * array_join would otherwise silently skip the element, making
    * n_docs/seq_tokens disagree with the shipped text (callers should
    * still filter null-text docs before packing). */
  def concatSequences(packed: DataFrame, textCol: String,
                      tokensCol: String, sep: String = " "): DataFrame = {
    val pieces = F.array_sort(
      F.collect_list(F.struct(F.col("seq_pos"),
        F.coalesce(F.col(textCol), F.lit("")).as("__txt"))))
    packed.groupBy("shard", "seq")
      .agg(F.count(F.lit(1)).as("n_docs"),
           F.sum(F.col(tokensCol).cast("long")).as("seq_tokens"),
           F.array_join(
             F.transform(pieces, s => s.getField("__txt")), sep).as("text"))
  }

  /** Z-order (Morton) interleave of `cols`' low `bits` bits (r5c) —
    * the multi-dimensional data-skipping layout key (the Delta/
    * Iceberg OPTIMIZE ZORDER technique): rows sorted by the
    * interleaved value cluster in EVERY key dimension at once, so
    * per-file min/max column statistics prune scans for predicates
    * on ANY of the keys, not just a lexicographic prefix. Columns
    * must be non-negative integers in [0, 2^bits) — rank/bucket
    * upstream (a percentile bucketing is one window per key); the
    * interleave itself is a pure codegen projection, exact integer
    * arithmetic, engine-replayable. */
  def zorderValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zorderValue needs at least one column")
    val n = cols.length
    require(bits * n <= 62, "interleaved width must fit a long")
    (0 until bits).foldLeft(F.lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a + F.shiftleft(
          F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1L)),
          i * n + j)
      }
    }
  }

  /** Range-partition + sort by the z-value: one range exchange (the
    * same cost as any global layout pass), after which every output
    * partition covers a compact z-range — the write-side half of
    * z-ordered data skipping. */
  def zorderBy(df: DataFrame, cols: Seq[Column], bits: Int = 16,
               partitions: Int = 0): DataFrame = {
    // withColumn would silently REPLACE a caller's __z and the final
    // drop would swallow it — reserved internal name, loud collision
    require(!df.columns.exists(_.equalsIgnoreCase("__z")),
      "input column __z collides with the reserved internal z-value name")
    val parts =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.withColumn("__z", zorderValue(cols, bits))
      .repartitionByRange(parts, F.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Keyed corpus upsert (r5c) — the recrawl/refresh maintenance
    * shape: batch rows REPLACE same-key corpus rows, new keys append.
    * One key-shuffled anti-join plus a name-matched union: corpus
    * rows whose key the batch re-delivers never materialize twice,
    * and (unlike a MERGE over a sorted table) nothing rewrites the
    * untouched remainder. Batch-internal duplicate keys are the
    * caller's contract (run the dedup family first); schemas must
    * agree by name. At 100 TB this pairs with the persisted-hash
    * incremental-dedup table: both jobs shuffle only (key) columns. */
  def upsert(corpus: DataFrame, batch: DataFrame,
             keyCol: String): DataFrame = {
    require(corpus.columns.map(_.toLowerCase).sorted.sameElements(
        batch.columns.map(_.toLowerCase).sorted),
      "upsert requires matching corpus/batch schemas")
    corpus.join(batch.select(keyCol).distinct(), Seq(keyCol), "left_anti")
      .unionByName(batch)
  }

  /** SCD2 history build (r5c): turns a keyed, timestamped change log
    * into validity intervals — each row becomes effective at its own
    * timestamp and expires at the key's NEXT change (`valid_from`
    * inclusive, `valid_to` exclusive, NULL while current +
    * `is_current`) — the slowly-changing-dimension versioning shape
    * every metadata/provenance table needs (license changes, domain
    * recategorization, quality-score revisions) so corpus snapshots
    * are reproducible AS OF a date.
    *
    * One (key) shuffle + one window sort; no self-join, no extra
    * pass: rows sharing a key AND timestamp would produce zero-width
    * intervals the as-of reader can't order, so the guard rides the
    * same window as a `raise_error` branch — the job fails loudly at
    * the first duplicate instead of shipping ambiguous history.
    * Pairs with [[upsert]] (which keeps only the latest) when the
    * history itself must ship. tsCol is a long (e.g. epoch micros). */
  def scd2(log: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(F.col(tsCol))
    val next = F.lead(F.col(tsCol).cast("long"), 1).over(w)
    log
      .withColumn("valid_from", F.col(tsCol).cast("long"))
      .withColumn("valid_to",
        F.when(next === F.col(tsCol).cast("long"), F.raise_error(F.lit(
          s"scd2: duplicate ($keyCol, $tsCol) in change log — " +
            "zero-width validity interval; deduplicate the log first")
          ).cast("long"))
         .otherwise(next))
      .withColumn("is_current", F.col("valid_to").isNull)
  }
}
