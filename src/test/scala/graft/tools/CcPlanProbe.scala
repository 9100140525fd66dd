package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}

/** Dev probe: print one CC propagation round's physical plan from
  * checkpointed inputs, to verify partitioning reuse. */
object CcPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val edges = pairs.selectExpr("id_a as src", "id_b as dst")
      .union(pairs.selectExpr("id_b as src", "id_a as dst"))
      .repartition(F.col("dst"))
      .localCheckpoint(true)
    val labels = edges.groupBy(F.col("src"))
      .agg(F.min("dst").as("__m"))
      .select(F.col("src").as("id"),
        F.least(F.col("src"), F.col("__m")).as("label"))
      .localCheckpoint(true)
    println("edges partitioning preserved: " +
      edges.queryExecution.optimizedPlan)
    val prop = edges.alias("e")
      .join(labels.alias("l"), F.col("e.dst") === F.col("l.id"))
      .groupBy(F.col("e.src").as("pid"))
      .agg(F.min("l.label").as("nlabel"))
    val next = labels.alias("l0")
      .join(prop, F.col("l0.id") === F.col("pid"), "left_outer")
      .select(F.col("l0.id").as("id"),
        F.least(F.col("l0.label"),
          F.coalesce(F.col("nlabel"), F.col("l0.label"))).as("label"))
    next.explain("formatted")
    spark.stop()
  }
}
