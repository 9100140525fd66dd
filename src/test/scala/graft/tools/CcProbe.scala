package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}

/** Dev probe: time the phases of q_dedup_semantic (pairs vs CC) and
  * count CC rounds at a given SF under the Bench session config. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    graft.functions.GraftFunctions.register(spark)
    // replicate semanticDedupFrom's pair stage
    val norm2 = "aggregate(transform(embedding, x -> cast(x as double) * x), 0D, (a, x) -> a + x)"
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      val e = emb.selectExpr("vec_id", "embedding", "label as cell", s"$norm2 as norm2")
      val a = e.select(F.col("cell").as("cell_a"), F.col("vec_id").as("id_a"),
        F.col("embedding").as("ea"), F.col("norm2").as("na"))
      val b = e.select(F.col("cell").as("cell_b"), F.col("vec_id").as("id_b"),
        F.col("embedding").as("eb"), F.col("norm2").as("nb"))
      val pairs = a.join(b, F.col("cell_a") === F.col("cell_b") && F.col("id_a") < F.col("id_b"))
        .filter(F.expr("graft_dot(ea, eb) / (sqrt(na) * sqrt(nb))") >= 0.3)
        .select("id_a", "id_b")
      val n = pairs.count()
      val t1 = System.nanoTime()
      val groups = graft.ops.Dedup.connectedComponents(pairs)
      groups.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[ccprobe] $tag pairs=$n pairStage=${(t1-t0)/1e9}%.2f " +
        f"cc=${(t2-t1)/1e9}%.2f s rounds=${graft.ops.Dedup.lastCcRounds}")
    }
    run("warm1"); run("warm2"); run("run3")
    spark.stop()
  }
}
