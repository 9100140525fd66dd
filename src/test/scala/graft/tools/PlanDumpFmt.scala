package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps a named SparkEntry query's physical plan — `formatted`
  * explain plus the executed-plan tree — under the exact Bench
  * session posture (local[32], shuffle.partitions=8, AQE off, 64 MB
  * broadcast threshold), for the committed plans/rNN artifacts.
  * Usage: runMain graft.tools.PlanDumpFmt <query> [sfDir] [outFile]. */
object PlanDumpFmt {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sf)
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")) +
      "\n" + df.queryExecution.executedPlan.toString
    out match {
      case Some(p) =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p), s)
      case None => println(s)
    }
    spark.stop()
  }
}
