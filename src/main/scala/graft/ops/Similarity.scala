package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.functions.GraftFunctions

/** Embedding similarity operators (SURVEY.md §2.2 rows 41-43).
  *
  * Dot products run as `zip_with` + `aggregate` higher-order
  * expressions over the embedding arrays — sequential double
  * accumulation, codegen'd, identical bit-for-bit to the DuckDB
  * oracle's list_transform/list_sum evaluation.
  *
  * Scale design: the brute-force path broadcasts only the (small)
  * query set and streams the corpus — one scan, no shuffle. The LSH
  * path buckets by random-hyperplane sign bits so candidate
  * generation shuffles on bucket ids; hyperplanes are a deterministic
  * integer pattern so any engine (and the oracle) derives the same
  * buckets without sharing state.
  */
object Similarity {

  /** Embedding dimensionality of the testdata corpus. */
  val Dim = 64
  /** Number of hyperplane sign bits (2^8 = 256 buckets). */
  val Planes = 8

  /** Deterministic "random" hyperplane: component d of plane j is
    * ((d*31 + j*17) % 7) - 3 — integer arithmetic reproducible in any
    * engine. Materialized as a double-array literal so the codegen'd
    * graft_dot expression (graft.functions.ArrayDotProduct) computes
    * the projection in a primitive loop. */
  private def planeDot(j: Int, emb: String): String = {
    val plane = (1 to Dim)
      .map(d => s"${((d * 31 + j * 17) % 7 - 3).toDouble}D").mkString(", ")
    s"graft_dot($emb, array($plane))"
  }

  private val norm2Expr = "graft_dot(embedding, embedding)"

  /** vec_id, embedding, LSH bucket (Planes sign bits), squared norm. */
  def withBucketAndNorm(emb: DataFrame): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val bucket = (0 until Planes).map { j =>
      s"(case when ${planeDot(j, "embedding")} >= 0 then 1 else 0 end) * ${1 << j}"
    }.mkString(" + ")
    emb.selectExpr("vec_id", "embedding",
      s"cast($bucket as int) as bucket", s"$norm2Expr as norm2")
  }

  private val pairCos = "graft_dot(ea, eb) / (sqrt(na) * sqrt(nb))"

  /** Near-duplicate pairs by embedding cosine within an LSH bucket
    * (SURVEY row 41): shuffles on bucket id, never all-pairs. */
  def embeddingDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val e = withBucketAndNorm(emb)
    e.select(F.col("vec_id").as("id_a"), F.col("embedding").as("ea"),
             F.col("bucket"), F.col("norm2").as("na"))
      .join(e.select(F.col("vec_id").as("id_b"), F.col("embedding").as("eb"),
                     F.col("bucket").as("bucket_b"), F.col("norm2").as("nb")),
            F.col("bucket") === F.col("bucket_b") && F.col("id_a") < F.col("id_b"))
      .selectExpr("id_a", "id_b", s"$pairCos as cos")
      .filter(F.col("cos") >= threshold)
      .selectExpr("id_a", "id_b", "round(cos, 4) as cos_sim")
  }

  /** Brute-force cosine top-k: broadcast the query set, scan the
    * corpus once, rank per query. The scale baseline for ANN. */
  def bruteForceTopK(emb: DataFrame, queryPred: String, k: Int): DataFrame = {
    val e = withBucketAndNorm(emb)
    val q = F.broadcast(
      e.filter(queryPred)
        .select(F.col("vec_id").as("query_id"), F.col("embedding").as("ea"),
                F.col("norm2").as("na")))
    val scored = q.join(
        e.select(F.col("vec_id").as("neighbor_id"), F.col("embedding").as("eb"),
                 F.col("norm2").as("nb")),
        F.col("query_id") =!= F.col("neighbor_id"))
      .selectExpr("query_id", "neighbor_id", s"round($pairCos, 6) as sim")
    scored
      .withColumn("rnk", F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(F.col("sim").desc, F.col("neighbor_id"))).cast("long"))
      .filter(F.col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** IVF-style ANN: the corpus is partitioned into coarse cells (an
    * inverted file); a query probes only its own cell and exact-ranks
    * within it. Here the precomputed `label` column stands in for the
    * coarse-quantizer assignment (in production: k-means centroid
    * ids, same plan shape). Scale: cell-key shuffle, corpus scan
    * touches one cell per query. */
  def ivfTopK(emb: DataFrame, queryPred: String, k: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val e = emb.selectExpr("vec_id", "embedding", "label",
      s"$norm2Expr as norm2")
    val q = F.broadcast(
      e.filter(queryPred)
        .select(F.col("vec_id").as("query_id"), F.col("embedding").as("ea"),
                F.col("norm2").as("na"), F.col("label").as("qcell")))
    q.join(e.select(F.col("vec_id").as("neighbor_id"),
                    F.col("embedding").as("eb"), F.col("norm2").as("nb"),
                    F.col("label")),
           F.col("qcell") === F.col("label") &&
           F.col("query_id") =!= F.col("neighbor_id"))
      .selectExpr("query_id", "neighbor_id", s"round($pairCos, 6) as sim")
      .withColumn("rnk", F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(F.col("sim").desc, F.col("neighbor_id"))).cast("long"))
      .filter(F.col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** LSH-bucketed ANN: probe only the query's own bucket, then exact
    * rerank — the 100 TB path (bucket-key shuffle instead of full
    * scan per query). */
  def lshTopK(emb: DataFrame, queryPred: String, k: Int): DataFrame = {
    val e = withBucketAndNorm(emb)
    val q = F.broadcast(
      e.filter(queryPred)
        .select(F.col("vec_id").as("query_id"), F.col("embedding").as("ea"),
                F.col("norm2").as("na"), F.col("bucket").as("qbucket")))
    q.join(e.select(F.col("vec_id").as("neighbor_id"),
                    F.col("embedding").as("eb"), F.col("norm2").as("nb"),
                    F.col("bucket")),
           F.col("qbucket") === F.col("bucket") &&
           F.col("query_id") =!= F.col("neighbor_id"))
      .selectExpr("query_id", "neighbor_id", s"round($pairCos, 6) as sim")
      .withColumn("rnk", F.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(F.col("sim").desc, F.col("neighbor_id"))).cast("long"))
      .filter(F.col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }
}
