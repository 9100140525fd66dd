package graft.tools
import org.apache.spark.sql.SparkSession
object OrderAggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = graft.Graft.forDir(spark, "/root/testdata/sf0.001")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .createOrReplaceTempView(t)
    }
    // diff graft vs spark.sql on the grouped-correlated shapes
    def d(sql: String): Unit =
      try {
        val a = g.query(sql).collect().map(_.toString).sorted
        val b = spark.sql(sql).collect().map(_.toString).sorted
        if (a.sameElements(b)) println("SAME " + sql.replaceAll("\\s+", " ").take(100))
        else println(s"DIFF(${a.length}/${b.length}) " + sql.replaceAll("\\s+", " ").take(100))
      } catch { case e: Throwable =>
        println("FAIL " + sql.replaceAll("\\s+", " ").take(100) + " => " +
          e.getMessage.linesIterator.next().take(120)) }
    // conjunct EXISTS with GROUP BY + HAVING: customers with a day of 2+ orders
    d("""select c_custkey from customer c where exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           group by o.o_orderdate having count(*) >= 2)
        order by c_custkey""")
    // conjunct NOT EXISTS grouped
    d("""select count(*) as n from customer c where not exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           group by o.o_orderdate having count(*) >= 2)""")
    // conjunct IN with GROUP BY + HAVING on an aggregate value
    d("""select c_custkey from customer c where c.c_custkey in
          (select o.o_custkey from orders o where o.o_custkey = c.c_custkey
           group by o.o_custkey having sum(o.o_totalprice) > 300000)
        order by c_custkey""")
    // grouped IN, value is an aggregate
    d("""select o_orderkey from orders o where o.o_totalprice in
          (select max(l.l_extendedprice) * 2 from lineitem l
           where l.l_orderkey = o.o_orderkey group by l.l_linestatus)
        order by o_orderkey""")
    // flag position: EXISTS grouped under OR
    d("""select c_custkey from customer c
        where c_acctbal < 0 or exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           group by o.o_orderdate having count(*) >= 2)
        order by c_custkey""")
    // projected flag: grouped EXISTS as a select item
    d("""select c_custkey, exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           group by o.o_orderdate having count(*) >= 2) as busy
        from customer c order by c_custkey""")
    // projected grouped NOT IN (3VL)
    d("""select c_custkey, c_custkey not in
          (select o.o_custkey from orders o where o.o_custkey = c.c_custkey
           group by o.o_custkey having count(*) > 30) as few
        from customer c order by c_custkey""")
    // grouped EXISTS with local + correlated conjuncts and expression key
    d("""select s_suppkey from supplier s where exists
          (select 1 from lineitem l where l.l_suppkey = s.s_suppkey
           and l.l_quantity > 45 group by l.l_returnflag having count(*) >= 3)
        order by s_suppkey""")
    // GROUP-BY-less HAVING stays a loud error (one-row aggregate shape)
    d("""select c_custkey from customer c where exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           having count(*) > 5) order by c_custkey""")
    spark.stop()
  }
}
