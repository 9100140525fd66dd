package graft.tools

import org.apache.spark.sql.{functions => F, DataFrame, SparkSession}

/** Scratch: phase timings for a replica of the tiny-tier fixpoint. */
object RecursivePhases {
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

    def loop(report: Boolean): Unit = {
      var tStep, tCkpt, tCount, tCons = 0L
      def timed[A](acc: Int)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        val d = System.nanoTime() - t0
        acc match {
          case 0 => tStep += d; case 1 => tCkpt += d
          case 2 => tCount += d; case 3 => tCons += d
        }
        r
      }
      var seen = spark.sql(
        "select cast(n_nationkey as int) as k from nation where n_nationkey=0")
        .distinct().coalesce(1).localCheckpoint(false)
      var working = seen
      var done = seen.count() == 0
      while (!done) {
        val stepped = timed(0) {
          working.selectExpr("cast((k*2+3)%11 as int) as k") }
        val merged = timed(0) {
          seen.withColumn(NK, F.lit(0))
            .union(stepped.withColumn(NK, F.lit(1))).coalesce(1)
            .groupBy("k").agg(F.min(NK).as(NK))
            .where(F.col(NK) === 1).drop(NK) }
        val next = timed(1) { merged.localCheckpoint(false) }
        val n = timed(2) { next.count() }
        if (n == 0) done = true
        else {
          seen = timed(3) {
            seen.union(next).coalesce(1).localCheckpoint(false) }
          working = next
        }
      }
      if (report)
        println(f"phases: step+build=${tStep / 1e9}%.3f ckpt=${tCkpt / 1e9}%.3f count=${tCount / 1e9}%.3f consolidate=${tCons / 1e9}%.3f")
    }
    loop(false)
    for (r <- 1 to 4) {
      val t0 = System.nanoTime()
      loop(true)
      println(f"run $r wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
