package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
object FnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(1.0, 1.0, 2.0, 3.0).toDF("x")
    df.agg(
      org.apache.spark.sql.GraftFn.distinctAgg("stddev_samp", F.col("x")).as("sd_d"),
      F.stddev_samp(F.col("x")).as("sd"),
      org.apache.spark.sql.GraftFn.distinctAgg("avg", F.col("x")).as("avg_d"),
      F.avg(F.col("x")).as("avg")).show()
    spark.sql("select stddev_samp(distinct x), stddev_samp(x) from values (1.0),(1.0),(2.0),(3.0) t(x)").show()
    spark.stop()
  }
}
