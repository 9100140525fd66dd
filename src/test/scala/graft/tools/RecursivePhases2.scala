package graft.tools

import org.apache.spark.sql.{functions => F, SparkSession}

/** Scratch: variant-B tiny-tier fixpoint — fused tagged seen frame +
  * RDD-level count (no per-round Aggregate compile). */
object RecursivePhases2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 << 20).toString)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("nation")
    val NK = "__new"

    def loop(): Long = {
      val base = spark.sql(
        "select cast(n_nationkey as int) as k from nation where n_nationkey=0")
        .distinct().coalesce(1)
      var seen = base.select(F.col("k"), F.lit(1).as(NK))
        .localCheckpoint(false)
      var seenRows = seen.queryExecution.toRdd.count()
      var done = seenRows == 0
      while (!done) {
        val working = seen.where(F.col(NK) === 1).drop(NK)
        val stepped = working.selectExpr("cast((k*2+3)%11 as int) as k")
        val newSeen = seen.select(F.col("k"), F.lit(0).as(NK))
          .union(stepped.select(F.col("k"), F.lit(1).as(NK)))
          .coalesce(1)
          .groupBy("k").agg(F.min(NK).as(NK))
          .localCheckpoint(false)
        val n = newSeen.queryExecution.toRdd.count()
        if (n == seenRows) done = true
        else { seen = newSeen; seenRows = n }
      }
      seenRows
    }
    loop()
    for (r <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = loop()
      println(f"runB $r wall=${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
