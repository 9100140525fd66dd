package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
/** Scratch probe: Dataset.groupingSets alias matching (test scope). */
object GsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(("A", 10), ("A", 30), ("B", 40)).toDF("k", "q")
    // V3: materialize the expression, then grouping-set over plain cols
    val pre = df.withColumn("__gk_1", F.col("q") > 25)
    val r3 = pre.groupingSets(
        Seq(Seq(F.col("k"), F.col("__gk_1")), Seq(F.col("k")), Seq()),
        F.col("k"), F.col("__gk_1"))
      .agg(F.count(F.lit(1)).as("n")).select(F.col("k"), F.col("__gk_1"), F.col("n"))
    println("V3:"); r3.collect().foreach(println)
    // V4: rollup with an aliased expression key, read via alias
    val r4 = df.rollup(F.col("k"), (F.col("q") > 25).as("__gk_1"))
      .agg(F.count(F.lit(1)).as("n")).select(F.col("k"), F.col("__gk_1"), F.col("n"))
    println("V4:"); r4.collect().foreach(println)
    spark.stop()
  }
}
