package graft.tools
import org.apache.spark.sql.SparkSession
object OrderAggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = graft.Graft.forDir(spark, "/root/testdata/sf0.001")
    Seq("nation", "customer").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .createOrReplaceTempView(t)
    }
    // graft chain syntax vs spark.sql EXPANDED equivalent
    def d(label: String, graftSql: String, sparkSql: String): Unit =
      try {
        val a = g.query(graftSql).collect().map(_.toString).sorted
        val b = spark.sql(sparkSql).collect().map(_.toString).sorted
        println((if (a.sameElements(b)) "SAME " else s"DIFF(${a.length}/${b.length}) ") + label)
      } catch { case e: Throwable =>
        println(s"FAIL $label => " + e.getMessage.linesIterator.next().take(120)) }
    d("def-chain-orderby",
      """select c_custkey, rank() over w2 as r from customer
         window w as (partition by c_nationkey), w2 as (w order by c_acctbal)
         order by c_custkey""",
      """select c_custkey, rank() over (partition by c_nationkey order by c_acctbal) as r
         from customer order by c_custkey""")
    d("def-chain-frame",
      """select c_custkey, round(sum(c_acctbal) over w2, 2) as s from customer
         window w as (partition by c_nationkey order by c_custkey),
                w2 as (w rows between 1 preceding and current row)
         order by c_custkey""",
      """select c_custkey, round(sum(c_acctbal) over (partition by c_nationkey
           order by c_custkey rows between 1 preceding and current row), 2) as s
         from customer order by c_custkey""")
    d("inline-inherit",
      """select c_custkey, rank() over (w order by c_acctbal desc) as r from customer
         window w as (partition by c_nationkey) order by c_custkey""",
      """select c_custkey, rank() over (partition by c_nationkey order by c_acctbal desc) as r
         from customer order by c_custkey""")
    d("bare-copy-with-frame",
      """select c_custkey, round(sum(c_acctbal) over w2, 2) as s from customer
         window w as (partition by c_nationkey order by c_custkey
                      rows between 2 preceding and current row),
                w2 as (w)
         order by c_custkey""",
      """select c_custkey, round(sum(c_acctbal) over (partition by c_nationkey
           order by c_custkey rows between 2 preceding and current row), 2) as s
         from customer order by c_custkey""")
    d("two-level-chain",
      """select c_custkey, rank() over w3 as r from customer
         window w as (partition by c_nationkey), w2 as (w), w3 as (w2 order by c_acctbal)
         order by c_custkey""",
      """select c_custkey, rank() over (partition by c_nationkey order by c_acctbal) as r
         from customer order by c_custkey""")
    // errors: cycle, child partition by, base frame + clauses
    def expectFail(label: String, sql: String): Unit =
      try { g.query(sql).collect(); println(s"NOFAIL $label") }
      catch { case e: Throwable => println(s"LOUD $label => " + e.getMessage.linesIterator.next().take(80)) }
    expectFail("cycle",
      """select rank() over w as r from customer
         window w as (w2 order by c_acctbal), w2 as (w)""")
    expectFail("child-partition",
      """select rank() over w2 as r from customer
         window w as (partition by c_nationkey),
                w2 as (w partition by c_mktsegment order by c_acctbal)""")
    expectFail("base-frame-extended",
      """select sum(c_acctbal) over w2 as s from customer
         window w as (partition by c_nationkey order by c_custkey
                      rows between 1 preceding and current row),
                w2 as (w order by c_acctbal)""")
    spark.stop()
  }
}
