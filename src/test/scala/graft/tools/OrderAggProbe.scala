package graft.tools
import org.apache.spark.sql.SparkSession
object OrderAggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = graft.Graft.forDir(spark, "/root/testdata/sf0.001")
    def t(sql: String): Unit =
      try { g.query(sql).collect(); println("OK   " + sql.take(80)) }
      catch { case e: Throwable => println("FAIL " + sql.take(80) + " => " + e.getMessage.linesIterator.next().take(100)) }
    t("select c_nationkey, count(*) as n from customer group by c_nationkey order by count(*) desc, c_nationkey")
    t("select c_nationkey from customer group by c_nationkey order by sum(c_acctbal) desc")
    t("select c_custkey from customer where exists (select 1 from orders where orders.o_custkey = customer.c_custkey limit 1)")
    t("select c_custkey from customer where exists (select 1 from orders where orders.o_custkey = customer.c_custkey limit 1) or c_acctbal > 100")
    spark.stop()
  }
}
