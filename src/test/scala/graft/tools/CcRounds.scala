package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}

/** Dev probe: replicate connectedComponents round loop with per-round
  * timing on the real q_dedup_semantic pair graph. */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    graft.functions.GraftFunctions.register(spark)
    val norm2 = "aggregate(transform(embedding, x -> cast(x as double) * x), 0D, (a, x) -> a + x)"
    val e = emb.selectExpr("vec_id", "embedding", "label as cell", s"$norm2 as norm2")
    val a = e.select(F.col("cell").as("cell_a"), F.col("vec_id").as("id_a"),
      F.col("embedding").as("ea"), F.col("norm2").as("na"))
    val b = e.select(F.col("cell").as("cell_b"), F.col("vec_id").as("id_b"),
      F.col("embedding").as("eb"), F.col("norm2").as("nb"))
    val pairs = a.join(b, F.col("cell_a") === F.col("cell_b") && F.col("id_a") < F.col("id_b"))
      .filter(F.expr("graft_dot(ea, eb) / (sqrt(na) * sqrt(nb))") >= 0.3)
      .select("id_a", "id_b")
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccrounds] $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    val edges = t("edges ckpt")(pairs.selectExpr("id_a as src", "id_b as dst")
      .union(pairs.selectExpr("id_b as src", "id_a as dst"))
      .repartition(F.col("dst")).localCheckpoint(true))
    var labels = t("labels init")(edges.groupBy(F.col("src"))
      .agg(F.min("dst").as("__m"))
      .select(F.col("src").as("id"),
        F.least(F.col("src"), F.col("__m")).as("label")).localCheckpoint(true))
    var converged = false
    var round = 1
    while (!converged && round < 50) {
      round += 1
      val sc = labels
        .join(labels.select(F.col("id").as("__lid"),
          F.col("label").as("__llabel")), F.col("label") === F.col("__lid"))
        .select(F.col("id"), F.col("__llabel").as("label"),
          (F.col("__llabel") < F.col("label")).as("__scChanged"))
      val prop = edges.alias("e")
        .join(sc.alias("l"), F.col("e.dst") === F.col("l.id"))
        .groupBy(F.col("e.src").as("pid"))
        .agg(F.min("l.label").as("nlabel"))
      val next = sc.alias("l0")
        .join(prop, F.col("l0.id") === F.col("pid"), "left_outer")
        .select(F.col("l0.id").as("id"),
          F.least(F.col("l0.label"),
            F.coalesce(F.col("nlabel"), F.col("l0.label"))).as("label"),
          (F.col("__scChanged") || (F.col("nlabel").isNotNull &&
            F.col("nlabel") < F.col("l0.label"))).as("__changed"))
      val nextCk = t(s"round $round ckpt")(next.localCheckpoint(true))
      converged = t(s"round $round isEmpty")(
        nextCk.filter(F.col("__changed")).isEmpty)
      labels = nextCk.drop("__changed")
    }
    println(s"[ccrounds] converged after $round rounds (incl. fused init)")
    spark.stop()
  }
}
