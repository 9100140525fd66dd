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
    def d(sql: String): Unit =
      try {
        val a = g.query(sql).collect().map(_.toString).sorted
        val b = spark.sql(sql).collect().map(_.toString).sorted
        if (a.sameElements(b)) println("SAME " + sql.replaceAll("\\s+", " ").take(100))
        else println(s"DIFF(${a.length}/${b.length}) " + sql.replaceAll("\\s+", " ").take(100))
      } catch { case e: Throwable =>
        println("FAIL " + sql.replaceAll("\\s+", " ").take(100) + " => " +
          e.getMessage.linesIterator.next().take(120)) }
    // the "more than N related rows" idiom — conjunct position
    d("""select c_custkey from customer c where exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           having count(*) > 5) order by c_custkey""")
    // NOT EXISTS form
    d("""select count(*) as n from customer c where not exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           having count(*) > 5)""")
    // HAVING true on empty input (count(*) = 0): exists even for
    // customers with NO orders — the empty-guard disjunct
    d("""select c_custkey from customer c where exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           having count(*) = 0) order by c_custkey""")
    d("""select c_custkey from customer c where exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           having count(*) < 3) order by c_custkey""")
    // local conjunct + aggregate threshold
    d("""select c_custkey from customer c where exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           and o.o_totalprice > 100000 having sum(o.o_totalprice) > 500000)
        order by c_custkey""")
    // under OR (flag position)
    d("""select c_custkey from customer c
        where c_acctbal < -900 or exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           having count(*) > 8) order by c_custkey""")
    // projected flag
    d("""select c_custkey, exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           having count(*) > 5) as busy from customer c order by c_custkey""")
    // HAVING referencing a select alias
    d("""select c_custkey from customer c where exists
          (select count(*) as cnt from orders o
           where o.o_custkey = c.c_custkey having cnt > 5)
        order by c_custkey""")
    // avg threshold (NULL on empty input -> guard false)
    d("""select c_custkey from customer c where exists
          (select 1 from orders o where o.o_custkey = c.c_custkey
           having avg(o.o_totalprice) > 150000) order by c_custkey""")
    spark.stop()
  }
}
