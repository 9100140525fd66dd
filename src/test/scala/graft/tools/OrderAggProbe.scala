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
      try { g.query(sql).collect(); println("OK   " + sql.replaceAll("\\s+", " ").take(90)) }
      catch { case e: Throwable => println("FAIL " + sql.replaceAll("\\s+", " ").take(90) + " => " + e.getMessage.linesIterator.next().take(90)) }
    t("select substring(n_name, n_regionkey + 1, 3) as s from nation")
    t("select round(c_acctbal, n_nationkey % 3) as r from customer join nation on c_nationkey = n_nationkey")
    t("select upper(n_name) as u, lpad(n_name, 12, '.') as p from nation")
    t("select case when rank() over (order by c_acctbal) > 5 then 'hi' else 'lo' end as b from customer")
    t("select n_regionkey, count(case when n_nationkey > 10 then 1 end) as c from nation group by n_regionkey")
    t("select sum(case when l_quantity > 25 then l_extendedprice else 0 end) as s from lineitem")
    t("select l_returnflag, sum(l_quantity) filter (where l_discount > 0.05) as s from lineitem group by l_returnflag")
    t("select greatest(n_nationkey, n_regionkey * 5) as g, least(n_nationkey, 7) as l from nation")
    spark.stop()
  }
}
