package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}

/** Dev probe: digit count of carried sizeInBytes stats per CC round
  * (plain localCheckpoint, no reset) — confirms/refutes the
  * stats-squaring diagnosis. */
object CcStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 24
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val edges = pairs.selectExpr("id_a as src", "id_b as dst")
      .union(pairs.selectExpr("id_b as src", "id_a as dst"))
      .localCheckpoint(true)
    println("[ccstats] edges sizeInBytes digits: " +
      edges.queryExecution.optimizedPlan.stats.sizeInBytes.toString.length)
    var labels = edges.selectExpr("src as id").distinct()
      .selectExpr("id", "id as label").localCheckpoint(true)
    for (r <- 1 to 12) {
      val t0 = System.nanoTime()
      val prop = edges.alias("e")
        .join(labels.alias("l"), F.col("e.dst") === F.col("l.id"))
        .groupBy(F.col("e.src").as("pid"))
        .agg(F.min("l.label").as("nlabel"))
      val next = labels.alias("l0")
        .join(prop, F.col("l0.id") === F.col("pid"), "left_outer")
        .select(F.col("l0.id").as("id"),
          F.least(F.col("l0.label"),
            F.coalesce(F.col("nlabel"), F.col("l0.label"))).as("label"))
      labels = next.localCheckpoint(true)
      val digits =
        labels.queryExecution.optimizedPlan.stats.sizeInBytes.toString.length
      println(f"[ccstats] round $r: ckpt=${(System.nanoTime()-t0)/1e9}%.2f s " +
        s"sizeInBytes digits=$digits")
    }
    spark.stop()
  }
}
