package graft.streaming

import graft.{SparkTestBase, TestSpark}
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming parity: the watermarked streaming aggregation
  * must agree with the batch aggregation over the same finite input
  * (SURVEY.md §2.2 row 49). */
class StreamingSpec extends SparkTestBase {

  test("streaming windowed counts equal batch windowed counts") {
    // file-stream sources need a directory; stage the single file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"))
    val path = dir.toString
    val batch = Streaming.windowedCounts(spark.read.parquet(path))

    val q = Streaming.streamingWindowedCounts(spark, path)
      .writeStream
      .format("memory")
      .queryName("stream_counts")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)

    assertSameRows(spark.table("stream_counts"), batch)
  }

  test("RocksDB state store produces the same results as the default (r6)") {
    // the 100 TB streaming posture: state lives in RocksDB on local
    // disk instead of the executor heap. The provider only changes
    // WHERE state sits — results must be identical; pin windowed
    // counts under RocksDB against the batch oracle.
    val dir = java.nio.file.Files.createTempDirectory("events_rocks")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"))
    val path = dir.toString
    val batch = Streaming.windowedCounts(spark.read.parquet(path))
    val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(ProviderConf)
    spark.conf.set(ProviderConf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Streaming.streamingWindowedCounts(spark, path)
        .writeStream.format("memory").queryName("stream_counts_rocks")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000L)
      // the running query really used RocksDB (not a silently ignored
      // conf): the state operator's custom metrics are provider-
      // specific
      val prog = q.lastProgress
      assert(prog != null && prog.stateOperators.nonEmpty &&
        prog.stateOperators(0).customMetrics.toString.contains("rocksdb"),
        s"expected rocksdb state metrics, got: $prog")
      assertSameRows(spark.table("stream_counts_rocks"), batch)
    } finally prior match {
      case Some(p) => spark.conf.set(ProviderConf, p)
      case None    => spark.conf.unset(ProviderConf)
    }
  }

  test("stream-stream interval join equals the batch interval join") {
    val dir = java.nio.file.Files.createTempDirectory("events_ssjoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"))
    val path = dir.toString
    val batch = Streaming.batchIntervalJoin(spark.read.parquet(path))
    val q = Streaming.streamingIntervalJoin(spark, path)
      .writeStream.format("memory").queryName("stream_ssjoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    assertSameRows(spark.table("stream_ssjoin"), batch)
  }

  test("stream-static enrichment equals the batch join") {
    val dir = java.nio.file.Files.createTempDirectory("events_enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"))
    val path = dir.toString
    val batchEvents = spark.read.parquet(path)
    val dim = batchEvents.select("event_type").distinct()
      .withColumn("type_rank", org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window.orderBy("event_type"))
        .cast("long"))
    val batch = Streaming.withEventTime(batchEvents)
      .join(dim, Seq("event_type"), "left_outer")

    val q = Streaming.streamingEnrich(spark, path, dim, "event_type")
      .writeStream.format("memory").queryName("stream_enrich")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)

    assertSameRows(spark.table("stream_enrich"), batch)
  }

  test("streaming batches assign against a frozen quantizer (r11)") {
    // the incremental-index workflow end-to-end: a persisted centroid
    // table assigns a STREAM of new embeddings exactly as it assigns
    // a batch — ivfAssign's broadcast one-row centroid shape is
    // stream-compatible (stream-static join, no stream-side shuffle)
    val dir = java.nio.file.Files.createTempDirectory("emb_assign")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/embeddings.parquet"),
      dir.resolve("embeddings.parquet"))
    val batchEmb = spark.read.parquet(dir.toString)
      .select("vec_id", "embedding")
    val cent = graft.ops.Similarity.ivfSeedCentroids(batchEmb, 8)
    val stream = spark.readStream.schema(batchEmb.schema)
      .parquet(dir.toString).select("vec_id", "embedding")
    val q = graft.ops.Similarity.ivfAssign(stream, cent)
      .select("vec_id", "cell", "cell_d")
      .writeStream.format("memory").queryName("stream_assign")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    assertSameRows(spark.table("stream_assign"),
      graft.ops.Similarity.ivfAssign(batchEmb, cent)
        .select("vec_id", "cell", "cell_d"))
  }

  test("streaming dedup drops duplicate event ids") {
    val dir = java.nio.file.Files.createTempDirectory("events_dedup")
    // stage the file twice => every event is duplicated across files
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("b.parquet"))
    val q = Streaming.streamingDedup(spark, dir.toString)
      .writeStream.format("memory").queryName("dedup_events")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val n = spark.table("dedup_events").count()
    val distinct = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet").count()
    assert(n == distinct, s"expected $distinct deduped events, got $n")
  }

  test("streaming near-dedup keeps one doc per simhash signature") {
    val dir = java.nio.file.Files.createTempDirectory("docs_neardedup")
    // stage the corpus twice: every document's signature arrives twice
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      dir.resolve("b.parquet"))
    val q = Streaming.streamingNearDedup(spark, dir.toString)
      .writeStream.format("memory").queryName("near_dedup_docs")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val n = spark.table("near_dedup_docs").count()
    // one survivor per distinct signature in the original corpus
    graft.functions.GraftFunctions.register(spark)
    val distinctSigs = spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet")
      .selectExpr("graft_simhash(split(lower(text), ' '), 60) as s")
      .distinct().count()
    assert(n == distinctSigs, s"expected $distinctSigs survivors, got $n")
  }

  test("streaming near-dedup vs a persisted corpus equals the batch path (r8)") {
    import org.apache.spark.sql.{functions => F}
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    // corpus = even doc_ids; their signature table is the persisted
    // batch artifact the stream anti-joins against
    val sigDir = java.nio.file.Files.createTempDirectory("sig_tbl")
    graft.ops.Dedup.writeSignatureTable(
      docs.filter("doc_id % 2 = 0"), sigDir.toString + "/sig")
    // the stream carries ALL docs, staged twice (within-stream dups)
    val dir = java.nio.file.Files.createTempDirectory("docs_vs_corpus")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      dir.resolve("b.parquet"))
    val q = Streaming.streamingNearDedupVsCorpus(spark, dir.toString,
        sigDir.toString + "/sig")
      .writeStream.format("memory").queryName("near_dedup_vs_corpus")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val got = spark.table("near_dedup_vs_corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // batch replay: same band anti joins, then one survivor per
    // distinct full signature
    val sig = spark.read.parquet(sigDir.toString + "/sig")
    val banded = graft.ops.Dedup.withBandCols(docs)
    val surv = (0 until graft.ops.Dedup.numBands).foldLeft(banded) {
      (df, b) =>
        df.join(graft.ops.Dedup.bandHashes(sig, b), Seq(s"__band$b"),
          "left_anti")
    }
    val sigAll = (0 until graft.ops.Dedup.numBands).map(b => s"__band$b")
      .mkString("concat(", ", ", ")")
    // one survivor per distinct signature; WHICH doc of a
    // same-signature cluster survives is arrival-order-dependent, so
    // the equivalence pins the SIGNATURE set and the count
    val expectedSigs = surv.selectExpr(s"$sigAll as __sig")
      .distinct().collect().map(_.getString(0)).toSet
    assert(expectedSigs.nonEmpty && expectedSigs.size < docs.count(),
      s"fixture degenerate: ${expectedSigs.size} survivors")
    assert(got.length == expectedSigs.size,
      s"stream ${got.length} vs batch ${expectedSigs.size}")
    val gotSigs = banded
      .join(spark.table("near_dedup_vs_corpus").select("doc_id"),
        Seq("doc_id"), "left_semi")
      .selectExpr(s"$sigAll as __sig")
      .distinct().collect().map(_.getString(0)).toSet
    assert(gotSigs == expectedSigs)
  }

  test("stateful user totals equal batch aggregation on finite input") {
    val dir = java.nio.file.Files.createTempDirectory("events_state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"))
    val q = Streaming.streamingUserTotals(spark, dir.toString)
      .writeStream.format("memory").queryName("user_totals")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)

    // single input batch → one emitted row per user == batch totals
    val batch = Streaming.withEventTime(
        spark.read.parquet(s"${TestSpark.sfDir}/events.parquet"))
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
             org.apache.spark.sql.functions.lit(1)).as("n_events"),
           org.apache.spark.sql.functions.round(
             org.apache.spark.sql.functions.sum("value"), 2).as("sum_value"))
    assertSameRows(spark.table("user_totals"), batch)
  }

  test("streaming top keys converge to the exact batch top-k across batches") {
    import org.apache.spark.sql.{functions => F}
    // two files -> two micro-batches: the second folds into the
    // first's sketch state, so the test exercises the state merge
    val dir = java.nio.file.Files.createTempDirectory("events_topk")
    val ev = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    ev.filter("event_id % 2 = 0").coalesce(1)
      .write.parquet(dir.resolve("a").toString)
    ev.filter("event_id % 2 = 1").coalesce(1)
      .write.parquet(dir.resolve("b").toString)
    val glob = s"$dir/*/*.parquet"
    val q = Streaming.streamingTopKeys(spark, glob, k = 5,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("top_keys")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val out = spark.table("top_keys")
    // at least two distinct n_seen per window proves multi-batch state
    assert(out.select("bucket_start", "n_seen").distinct()
      .groupBy("bucket_start").count().agg(F.max("count")).head.getLong(0) >= 2)
    // final emission per window (largest n_seen) == exact batch top-5
    // (sketch 256 > 100 distinct keys -> exact counts)
    val finalTop = out
      .withColumn("rk", F.rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("bucket_start").orderBy(F.col("n_seen").desc)))
      .filter("rk = 1").select("bucket_start", "key", "est").distinct()
    val exact = Streaming.withEventTimeKeepAll(ev)
      .select(F.date_trunc("hour", F.col("event_time")).cast("long").as("bucket_start"),
        F.get_json_object(F.col("props"), "$.k").as("key"))
      .filter("key is not null")
      .groupBy("bucket_start", "key").agg(F.count(F.lit(1)).as("est"))
      .withColumn("rn", F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("bucket_start")
          .orderBy(F.col("est").desc, F.col("key"))))
      .filter("rn <= 5").select("bucket_start", "key", "est")
    assertSameRows(finalTop, exact)
  }
}
