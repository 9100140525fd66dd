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

  test("sessionize groups events by 30-minute gaps") {
    val events = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    val sessions = graft.streaming.Streaming.sessionize(events).collect()
    assert(sessions.nonEmpty)
    // total event count is preserved across sessions
    assert(sessions.map(_.getLong(2)).sum == events.count())
  }
}
