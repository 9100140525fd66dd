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
    // order by a window function expression
    t("select c_custkey from customer order by row_number() over (order by c_acctbal), c_custkey limit 5")
    // order by the group-key EXPRESSION (not its alias)
    t("select c_custkey % 7 as b, count(*) as n from customer group by c_custkey % 7 order by c_custkey % 7")
    // order by an unselected plain column (non-aggregated query)
    t("select c_name from customer order by c_acctbal desc limit 5")
    // union in an IN subquery
    t("select n_name from nation where n_regionkey in (select r_regionkey from region where r_regionkey < 2 union select r_regionkey from region where r_regionkey > 3)")
    // expression IN list with null literal
    t("select n_name from nation where n_regionkey not in (1, null)")
    // nested scalar subquery arithmetic in WHERE
    t("select n_name from nation where n_regionkey = (select min(r_regionkey) from region) + 1")
    // case expression as group key and its alias in having
    t("select case when c_acctbal > 0 then 'p' else 'n' end as sign, count(*) as n from customer group by case when c_acctbal > 0 then 'p' else 'n' end having count(*) > 2")
    // correlated IN inside HAVING (should be loud, not wrong)
    t("select c_nationkey, count(*) as n from customer group by c_nationkey having c_nationkey in (select n_nationkey from nation where nation.n_nationkey = customer.c_nationkey)")
    spark.stop()
  }
}
