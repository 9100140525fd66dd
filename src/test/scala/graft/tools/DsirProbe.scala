package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}

/** Dev probe: decompose q_dsir_parts (dsirPartsSelf) cost into the
  * feats materialization, the model materialization and the final
  * fold, under the Bench session posture. */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.locality.wait", "0")
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val buckets = 512
    val gramsExpr =
      "concat(graft_word_ngrams(lower(text), 1), graft_word_ngrams(lower(text), 2))"
    val bucketExpr =
      s"cast(conv(substring(md5(__g), 1, 8), 16, 10) as bigint) % $buckets"
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      val feats = docs
        .select(F.col("doc_id"), F.expr("doc_id % 3 = 0").as("__side"),
          F.explode(F.expr(gramsExpr)).as("__g"))
        .selectExpr("doc_id", "__side", s"$bucketExpr as __b")
        .groupBy("doc_id", "__side", "__b").agg(F.count(F.lit(1)).as("__n"))
        .localCheckpoint(true)
      val t1 = System.nanoTime()
      val mb = feats.groupBy("__b")
        .agg(F.sum(F.when(F.col("__side"), F.col("__n"))).as("__ct"),
          F.sum(F.when(!F.col("__side"), F.col("__n"))).as("__cs"))
        .localCheckpoint(true)
      val t2 = System.nanoTime()
      val full = graft.ops.Sampling.dsirPartsSelf(docs, "doc_id % 3 = 0", buckets)
      // rebuild via public API for the end-to-end number
      val t3 = System.nanoTime()
      full.write.format("noop").mode("overwrite").save()
      val t4 = System.nanoTime()
      println(f"[dsirprobe] $tag feats=${(t1 - t0) / 1e9}%.2f mb=${(t2 - t1) / 1e9}%.2f " +
        f"build=${(t3 - t2) / 1e9}%.2f finalExec=${(t4 - t3) / 1e9}%.2f total=${(t4 - t2) / 1e9}%.2f")
    }
    run("warm1"); run("warm2"); run("run3")
    spark.stop()
  }
}
