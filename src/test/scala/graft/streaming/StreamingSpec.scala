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
}
