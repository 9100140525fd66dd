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
    t("select 1.5e3 as x from region")
    t("select n_name || '_x' as nx from nation")
    t("select * from (select n_name from nation order by n_name limit 5) t")
    t("select case when n_regionkey in (select r_regionkey from region where r_regionkey < 2) then 'lo' else 'hi' end as b from nation")
    t("select n_name from nation where case when n_regionkey > 2 then exists (select 1 from region where region.r_regionkey = nation.n_regionkey) else false end")
    t("select count(*) as n from lineitem where l_shipdate is not null")
    t("select -n_regionkey as neg, abs(-n_regionkey) as a from nation")
    t("select n_name from nation where n_name like 'A%' or n_name not like '%a%'")
    spark.stop()
  }
}
