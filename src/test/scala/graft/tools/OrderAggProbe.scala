package graft.tools
import org.apache.spark.sql.SparkSession
object OrderAggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = graft.Graft.forDir(spark, "/root/testdata/sf0.001")
    Seq("nation", "customer", "orders", "lineitem").foreach { t =>
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
    // <> correlation in conjunct EXISTS ("another different row exists")
    d("conj-exists-ne",
      """select l_orderkey, l_linenumber from lineitem l1
         where exists (select 1 from lineitem l2
                       where l2.l_orderkey = l1.l_orderkey
                         and l2.l_suppkey <> l1.l_suppkey)
         order by l_orderkey, l_linenumber""")
    // <> correlation in conjunct NOT EXISTS
    d("conj-not-exists-ne",
      """select count(*) as n from lineitem l1
         where not exists (select 1 from lineitem l2
                           where l2.l_orderkey = l1.l_orderkey
                             and l2.l_suppkey <> l1.l_suppkey)""")
    // <> in conjunct IN
    d("conj-in-ne",
      """select o_orderkey from orders o
         where o.o_custkey in (select o2.o_custkey from orders o2
                               where o2.o_custkey = o.o_custkey
                                 and o2.o_orderkey <> o.o_orderkey)
         order by o_orderkey""")
    // <> EXISTS under OR (flag position) — expect loud error today
    d("flag-exists-ne",
      """select c_custkey from customer c
         where c_acctbal < -900 or exists
           (select 1 from orders o where o.o_custkey = c.c_custkey
            and o.o_orderkey <> c.c_custkey)
         order by c_custkey""")
    // projected <> EXISTS flag
    d("proj-exists-ne",
      """select l_orderkey, l_linenumber, exists
           (select 1 from lineitem l2 where l2.l_orderkey = lineitem.l_orderkey
            and l2.l_suppkey <> lineitem.l_suppkey) as multi
         from lineitem order by l_orderkey, l_linenumber""")
    // projected <> IN flag (3VL with nullable set)
    d("proj-in-ne",
      """select o_orderkey, o_custkey in
           (select o2.o_custkey from orders o2
            where o2.o_custkey = orders.o_custkey
              and o2.o_orderkey <> orders.o_orderkey) as f
         from orders order by o_orderkey""")
    spark.stop()
  }
}
