package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.Streaming

/** Dev tool: runs ONLY the streaming throughput bench with the Bench
  * session settings — for idle-window re-measures (VERDICT r9 #6). */
object StreamBenchOnly {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val json = Streaming.benchJson(spark, sfDir,
      sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "rocksdb"))
    println(s"""{"streaming":$json}""")
    spark.stop()
  }
}
