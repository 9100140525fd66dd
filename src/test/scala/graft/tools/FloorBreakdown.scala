package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev probe: split the per-query bench floor into DataFrame
  * construction (graft parse/translate + plan assembly) vs action
  * (Catalyst analyze/optimize/codegen + job run) for a sample of
  * floor-tier queries, under the exact Bench session config.
  * Usage: Test/runMain graft.tools.FloorBreakdown <sfDir> [rounds] [q...]
  */
object FloorBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 5
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("q_select_star", "q_select_cols", "q_where_cmp", "q_alias",
        "q_between", "q_in_list", "q_group_by", "q_order_by", "q_limit",
        "q_join_inner", "q_case_when", "q_cast", "q_math", "q_union_all",
        "q_rank", "q_text_tokens", "q_sample_consistent", "q_literals",
        "q_coalesce", "q_is_null")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024 * 1024).toString)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: run everything once
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    var cTot = 0.0; var eTot = 0.0
    val per = names.map { n =>
      var c = Double.MaxValue; var e = Double.MaxValue
      (1 to rounds).foreach { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        c = math.min(c, (t1 - t0) / 1e9); e = math.min(e, (t2 - t1) / 1e9)
      }
      cTot += c; eTot += e
      (n, c, e)
    }
    per.foreach { case (n, c, e) =>
      println(f"[floor] $n%-24s construct=${c}%.4f exec=${e}%.4f")
    }
    println(f"[floor] TOTAL construct=$cTot%.3f exec=$eTot%.3f over ${names.length} queries (min of $rounds)")
    spark.stop()
  }
}
