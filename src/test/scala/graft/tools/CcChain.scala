package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Dev probe: round counts of CC variants on planted chain graphs
  * (worst-case diameter) with different id orderings. */
object CcChain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(pairs: DataFrame, shortcut: Boolean): (Int, Long, Long) = {
      val ckpt: DataFrame => DataFrame = df => df.localCheckpoint(true)
      val edges = ckpt(pairs.selectExpr("id_a as src", "id_b as dst")
        .union(pairs.selectExpr("id_b as src", "id_a as dst"))
        .repartition(F.col("dst")))
      var labels = ckpt(edges.groupBy(F.col("src"))
        .agg(F.min("dst").as("__m"))
        .select(F.col("src").as("id"),
          F.least(F.col("src"), F.col("__m")).as("label")))
      var converged = false
      var round = 1
      while (!converged && round < 200) {
        round += 1
        val base =
          if (shortcut)
            labels.join(labels.select(F.col("id").as("__lid"),
                F.col("label").as("__llabel")),
                F.col("label") === F.col("__lid"))
              .select(F.col("id"), F.col("__llabel").as("label"),
                (F.col("__llabel") < F.col("label")).as("__scChanged"))
          else labels.withColumn("__scChanged", F.lit(false))
        val prop = edges.alias("e")
          .join(base.alias("l"), F.col("e.dst") === F.col("l.id"))
          .groupBy(F.col("e.src").as("pid"))
          .agg(F.min("l.label").as("nlabel"))
        val next = base.alias("l0")
          .join(prop, F.col("l0.id") === F.col("pid"), "left_outer")
          .select(F.col("l0.id").as("id"),
            F.least(F.col("l0.label"),
              F.coalesce(F.col("nlabel"), F.col("l0.label"))).as("label"),
            (F.col("__scChanged") || (F.col("nlabel").isNotNull &&
              F.col("nlabel") < F.col("l0.label"))).as("__changed"))
        val nextCk = ckpt(next)
        converged = nextCk.filter(F.col("__changed")).isEmpty
        labels = nextCk.drop("__changed")
      }
      val labs = labels.select("label").distinct()
        .collect().map(_.getLong(0))
      (round, labs.length.toLong, labs.min)
    }

    val n = 64
    val asc = (1 until n).map(i => (i.toLong, (i + 1).toLong))
    val desc = (1 until n).map(i => ((n - i + 1).toLong, (n - i).toLong))
    val rnd = new scala.util.Random(7)
    val perm = rnd.shuffle((1 to n).toVector)
    val shuf = (0 until n - 1).map(i => (perm(i).toLong, perm(i + 1).toLong))
    for ((tag, es) <- Seq("asc" -> asc, "desc" -> desc, "shuf" -> shuf);
         sc <- Seq(false, true)) {
      val (rounds, comps, minL) = run(es.toDF("id_a", "id_b"), sc)
      println(s"[ccchain] $tag shortcut=$sc rounds=$rounds " +
        s"components=$comps min=$minL")
    }
    spark.stop()
  }
}
