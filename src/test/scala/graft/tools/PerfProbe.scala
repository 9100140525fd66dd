package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch timing probe for heavy queries (Test scope only; not part
  * of the library). Run: Test/runMain graft.tools.PerfProbe */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime(); exec(df)
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_contamination", "q_text_tfidf", "q_text_repetition",
               "q_dedup_incremental", "q_embed_centroids")
    for (name <- names; r <- 1 to 4)
      time(s"$name r$r")(graft.SparkEntry.queries(name)(spark, dir))
    spark.stop()
  }
}
