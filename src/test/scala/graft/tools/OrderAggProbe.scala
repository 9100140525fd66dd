package graft.tools
import org.apache.spark.sql.SparkSession
object OrderAggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = graft.Graft.forDir(spark, "/root/testdata/sf0.001")
    Seq("nation", "region", "customer", "orders", "lineitem").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .createOrReplaceTempView(t)
    }
    def d(label: String, sql: String): Unit =
      try {
        val a = g.query(sql).collect().map(_.toString).sorted
        val b = spark.sql(sql).collect().map(_.toString).sorted
        println((if (a.sameElements(b)) "SAME " else s"DIFF(${a.length}/${b.length}) ") + label)
      } catch { case e: Throwable =>
        println(s"FAIL $label => " + e.getMessage.linesIterator.next().take(120)) }
    // running-aggregate-style theta scalar: count of EARLIER lines in the order
    d("scalar-theta-count",
      """select l_orderkey, l_linenumber,
           (select count(*) from lineitem l2
            where l2.l_orderkey = lineitem.l_orderkey
              and l2.l_linenumber < lineitem.l_linenumber) as earlier
         from lineitem order by l_orderkey, l_linenumber""")
    // max over smaller-priced orders of the same customer
    d("scalar-theta-max",
      """select o_orderkey,
           round((select max(o2.o_totalprice) from orders o2
            where o2.o_custkey = orders.o_custkey
              and o2.o_totalprice < orders.o_totalprice), 2) as prev_max
         from orders order by o_orderkey""")
    // keyless theta: global aggregate over smaller values
    d("scalar-theta-keyless",
      """select n_nationkey,
           (select count(*) from region
            where region.r_regionkey < nation.n_regionkey) as smaller
         from nation order by n_nationkey""")
    // theta scalar in WHERE
    d("scalar-theta-where",
      """select o_orderkey from orders
         where (select count(*) from lineitem l
                where l.l_orderkey = orders.o_orderkey
                  and l.l_quantity > 30) > 2
         order by o_orderkey""")
    // expression over two aggregates with theta
    d("scalar-theta-expr",
      """select o_orderkey,
           round((select max(l.l_extendedprice) - min(l.l_extendedprice)
            from lineitem l
            where l.l_orderkey = orders.o_orderkey
              and l.l_linenumber <> 1), 2) as spread
         from orders order by o_orderkey""")
    // theta + GROUP BY inside stays loud
    d("scalar-theta-grouped-loud",
      """select o_orderkey,
           (select max(l.l_extendedprice) from lineitem l
            where l.l_orderkey = orders.o_orderkey
              and l.l_linenumber < orders.o_orderkey
            group by l.l_linestatus) as x
         from orders order by o_orderkey""")
    spark.stop()
  }
}
