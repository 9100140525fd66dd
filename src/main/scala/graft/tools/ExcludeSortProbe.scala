package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B fixture for the ordered-set EXCLUDE comparator (r11, VERDICT
  * r10 "Next round" #9): the r9 A/B ran on ≤7-element frames; this
  * measures the HOF comparator sort vs the native SortStructs
  * TimSort at 100- and 1000-element frames. Run twice:
  *   SPARK_GRAFT_EXCLUDE_SORT=hof    sbt "runMain graft.tools.ExcludeSortProbe"
  *   SPARK_GRAFT_EXCLUDE_SORT=native sbt "runMain graft.tools.ExcludeSortProbe"
  * (the switch is read at plan build, so each arm needs its own JVM).
  * Usage: ExcludeSortProbe [runs] */
object ExcludeSortProbe {
  def main(args: Array[String]): Unit = {
    val runs = if (args.length > 0) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val arm = sys.env.getOrElse("SPARK_GRAFT_EXCLUDE_SORT", "hof")
    // (rows, preceding) pairs: small frames locate the crossover,
    // 100/1000 confirm the large-frame regime
    val pairs =
      if (args.length > 1) args.drop(1).map { p =>
        val Array(r, f) = p.split("x"); (r.toInt, f.toInt - 1)
      }.toSeq
      else Seq((50000, 99), (10000, 999))
    for ((rows, prec) <- pairs) {
      val df = spark.range(rows).selectExpr(
        "cast(id % 50 as bigint) as g",
        "id as o",
        "cast((id * 7) % 1000 as bigint) as k",
        "concat('v', id % 100) as v")
      df.write.mode("overwrite").parquet("/tmp/exclsort_t")
      val g = new graft.Graft(spark)
      g.registerTable("t", spark.read.parquet("/tmp/exclsort_t"))
      val q = s"""select g, o,
          string_agg(v, ',' order by k desc, v) over (
            partition by g order by o
            rows between $prec preceding and current row
            exclude group) as s
        from t"""
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        g.query(q).write.format("noop").mode("overwrite").save()
        println(f"[exclsort] arm=$arm frame=${prec + 1} rows=$rows " +
          f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
