package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for round-5 edge cases. */
object R5Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = graft.Graft.forDir(spark, "/root/testdata/sf0.001")
    val df = g.query(
      """select c_custkey,
           nullif(c_custkey, 7) < any (select nullif(o_custkey, o_custkey % 977)
                                       from orders
                                       where orders.o_custkey = customer.c_custkey + 1) as f
         from customer""")
    df.filter("c_custkey >= 147").show()
    spark.stop()
  }
}
