package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Probe of the per-query scheduling floor under different runtime
  * confs (Test scope only). Toggles AQE / shuffle-partition settings
  * between timed passes over a mixed query sample to pick the bench
  * session config. Run via tools/standalone_run.sh graft.tools.FloorProbe */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("floorprobe")
      .config("spark.sql.shuffle.partitions", "32")
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

    val floorQs = Seq("q_union", "q_order_by", "q_rank", "q_qualify_agg",
      "q_scalar_subquery", "q_group_by", "q_having", "q_with_cte",
      "q_not_in_select_null", "q_rollup_scalar")
    val heavyQs = Seq("q_text_tfidf", "q_ngram_top", "q_tpch_q3",
      "q_text_repetition", "q_contamination", "q_dedup_groups",
      "q_window_agg", "q_skew_agg")
    val qs = floorQs ++ heavyQs

    // warmup all shapes
    qs.foreach(n => exec(graft.SparkEntry.queries(n)(spark, dir)))

    val configs: Seq[(String, Map[String, String])] = Seq(
      "noaqe_sp4" -> Map("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.autoBroadcastJoinThreshold" -> "10485760"),
      "noaqe_sp8" -> Map("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.autoBroadcastJoinThreshold" -> "10485760"),
      "noaqe_sp16" -> Map("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "16",
        "spark.sql.autoBroadcastJoinThreshold" -> "10485760"),
      "sp8_bc64m" -> Map("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.autoBroadcastJoinThreshold" -> "67108864"),
      "aqe_sp8_bc64m" -> Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.autoBroadcastJoinThreshold" -> "67108864",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true"),
    )
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    for ((tag, conf) <- configs) {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val per = qs.map { n =>
        val ts = (1 to rounds).map { _ =>
          val t0 = System.nanoTime()
          exec(graft.SparkEntry.queries(n)(spark, dir))
          (System.nanoTime() - t0) / 1e9
        }.sorted
        n -> ts(ts.length / 2)
      }
      val floorSum = per.filter(p => floorQs.contains(p._1)).map(_._2).sum
      val heavySum = per.filter(p => heavyQs.contains(p._1)).map(_._2).sum
      println(f"[floor] $tag%-12s floor10=${floorSum}%.2f s heavy8=${heavySum}%.2f s " +
        per.map { case (n, t) => f"$n=$t%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
