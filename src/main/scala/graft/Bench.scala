package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Results are materialized through the `noop` sink — a bare count()
  * lets Catalyst prune projections/windows/joins down to a scan-count
  * and would time almost nothing. A JVM+IO warmup pass (flagship
  * entry query) runs first so per-query numbers measure the engine,
  * not classloading.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warmup at the smallest SF: runs every query shape once so JIT +
    // codegen compilation happen before timing (measured: first
    // execution of a codegen-heavy query costs 3-4x steady state).
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      queries.foreach { case (_, fn) =>
        try exec(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
    else try exec(SparkEntry.entry(spark)) catch { case _: Throwable => () }

    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
