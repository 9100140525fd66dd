package graft.tools

import org.apache.spark.sql.{functions => F, SparkSession}

/** Scratch: variant-C tiny-tier fixpoint — K rounds unrolled into one
  * plan/job per block; dedup only at block end. */
object RecursivePhases3 {
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
    val K = sys.env.getOrElse("K","4").toInt

    def loop(): Long = {
      var seen = spark.sql(
        "select cast(n_nationkey as int) as k from nation where n_nationkey=0")
        .distinct().coalesce(1)
        .select(F.col("k"), F.lit(1).as(NK)).localCheckpoint(false)
      var seenRows = seen.queryExecution.toRdd.count()
      var done = seenRows == 0
      while (!done) {
        var frontier = seen.where(F.col(NK) === 1).drop(NK)
        var rs = Vector.empty[org.apache.spark.sql.DataFrame]
        for (_ <- 1 to K) {
          val r = frontier.selectExpr("cast((k*2+3)%11 as int) as k")
          rs :+= r
          frontier = r
        }
        val tagged = seen.select(F.col("k"), F.lit(0).as(NK))
          .union(rs.map(_.select(F.col("k"), F.lit(1).as(NK)))
            .reduce(_ union _))
          .coalesce(1)
        val newSeen = tagged.groupBy("k").agg(F.min(NK).as(NK))
          .localCheckpoint(false)
        val total = newSeen.queryExecution.toRdd.count()
        if (total == seenRows) done = true
        else { seen = newSeen; seenRows = total }
      }
      seenRows
    }
    loop()
    for (r <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = loop()
      println(f"runC $r wall=${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
