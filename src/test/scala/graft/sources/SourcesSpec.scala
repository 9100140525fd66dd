package graft.sources

import graft.{SparkTestBase, TestSpark}
import java.nio.file.Files

/** Source/sink parity (SURVEY.md §2.3): every interchange format
  * round-trips losslessly with an explicit schema. */
class SourcesSpec extends SparkTestBase {

  private def docsSubset =
    spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars")

  test("csv round-trip preserves rows and schema") {
    val tmp = Files.createTempDirectory("graft_csv_spec").toString
    val back = Sources.roundTrip(docsSubset, "csv", tmp)
    assert(back.schema == docsSubset.schema)
    assertSameRows(back, docsSubset)
  }

  test("json round-trip preserves rows") {
    val tmp = Files.createTempDirectory("graft_json_spec").toString
    assertSameRows(Sources.roundTrip(docsSubset, "json", tmp), docsSubset)
  }

  test("orc round-trip preserves rows and schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc_spec").toString
    val back = Sources.roundTrip(docsSubset, "orc", tmp)
    assert(back.schema == docsSubset.schema)
    assertSameRows(back, docsSubset)
  }

  test("parquet round-trip preserves rows including arrays") {
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val tmp = Files.createTempDirectory("graft_pq_spec").toString
    val back = Sources.roundTrip(emb, "parquet", tmp)
    assert(back.count() == emb.count())
    assert(back.schema == emb.schema)
  }

  test("csv reader with explicit schema skips inference") {
    val tmp = Files.createTempDirectory("graft_csv_schema").toString
    Sources.writeCsv(docsSubset, tmp)
    val read = Sources.csv(spark, tmp, docsSubset.schema)
    assert(read.schema == docsSubset.schema)
  }

  test("partitioned parquet write prunes partitions on read") {
    val tmp = Files.createTempDirectory("graft_part").toString
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    Sources.writeParquetPartitioned(
      docs.select("doc_id", "lang", "n_chars"), tmp, Seq("lang"))
    val back = spark.read.parquet(tmp).filter("lang = 'en'")
    assert(back.count() == docs.filter("lang = 'en'").count())
    // partition pruning: only the lang=en directory is scanned
    val scan = back.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters") || !scan.contains("lang=fr"))
  }

  test("bucketed tables join without a shuffle") {
    val customer = spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")
    val orders = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
    // clean both catalog entries and leftover warehouse dirs from
    // prior JVMs (catalog is per-JVM in-memory; the dirs persist)
    Seq("b_customer", "b_orders").foreach { t =>
      spark.sql(s"drop table if exists $t")
      val dir = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Sources.writeBucketed(customer, "b_customer", "c_custkey", 4)
    Sources.writeBucketed(
      orders.withColumnRenamed("o_custkey", "c_custkey"), "b_orders", "c_custkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_customer")
        .join(spark.table("b_orders"), "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n${plan.take(1500)}")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sharded export writes one pruned partition per shard") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    graft.ops.Export.writeSharded(docs, "doc_id", 4, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.sameElements((0 until 4).map(s => s"shard=$s")))
    // each shard directory holds exactly one data file (repartition on
    // shard pins one writing task per shard — no small-file explosion)
    dirs.foreach { d =>
      val files = new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d has ${files.length} files")
    }
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // shard is a partition column: a shard filter prunes the scan
    val pruned = back.filter("shard = 2")
    val scan = pruned.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters: [isnotnull(shard"), scan.take(1200))
    assert(pruned.count() ==
      graft.ops.Export.withShard(docs, "doc_id", 4).filter("shard = 2").count())
  }

  test("raw text readers: per-line and per-file with provenance") {
    val dir = java.nio.file.Files.createTempDirectory("rawtext")
    java.nio.file.Files.write(dir.resolve("a.txt"),
      "line one\nline two\n".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.txt"),
      "solo line\n".getBytes("UTF-8"))
    val lines = Sources.textLines(spark, dir.toString).collect()
    assert(lines.length == 3)
    assert(lines.forall(_.getString(0).endsWith(".txt")))
    assert(lines.map(_.getString(1)).sorted.toSeq ==
      Seq("line one", "line two", "solo line"))
    val whole = Sources.wholeTextFiles(spark, dir.toString).collect()
    assert(whole.length == 2)
    assert(whole.exists(r => r.getString(0).endsWith("a.txt") &&
      r.getString(1) == "line one\nline two\n"))
  }

  test("sessionize groups events by 30-minute gaps") {
    val events = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    val sessions = graft.streaming.Streaming.sessionize(events).collect()
    assert(sessions.nonEmpty)
    // total event count is preserved across sessions
    assert(sessions.map(_.getLong(2)).sum == events.count())
  }
}
