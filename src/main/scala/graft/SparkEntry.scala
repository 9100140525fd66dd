package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory these queries cover.
  *
  * Every SQL-surface entry goes through the full graft pipeline
  * (Lexer → Parser → Translator → Spark logical plan), NOT through
  * spark.sql — the oracle comparison therefore exercises the engine,
  * not Spark's own SQL front-end.
  */
object SparkEntry {

  private val sessions = TrieMap.empty[(SparkSession, String), Graft]
  private def graftFor(s: SparkSession, dir: String): Graft =
    sessions.getOrElseUpdate((s, dir), Graft.forDir(s, dir))

  /** Queries whose graft-dialect SQL is ALSO valid DuckDB SQL: one
    * string serves as both the engine input and the oracle. */
  private val sharedSql: Seq[(String, String)] = Seq(
    // --- projection / aliasing / qualification (SURVEY §2.1 rows 1-4)
    "q_select_star" ->
      "select * from region",
    "q_select_cols" ->
      "select l_orderkey, l_linenumber, l_quantity, l_extendedprice from lineitem",
    "q_alias" ->
      "select l_orderkey, l_quantity qty, l_extendedprice as price from lineitem",
    "q_qualified" ->
      "select t1.n_name, t1.n_regionkey from nation t1 where t1.n_regionkey < 3",
    "q_distinct" ->
      "select distinct l_returnflag, l_linestatus from lineitem",
    // --- predicates (rows 5-10)
    "q_where_cmp" ->
      "select l_orderkey, l_linenumber from lineitem where l_quantity > 45 and l_discount <= 0.05",
    "q_bool_ops" ->
      """select l_orderkey, l_linenumber from lineitem
         where (l_quantity > 40 or l_discount < 0.02) and l_tax > 0.04""",
    "q_between" ->
      "select l_orderkey, l_linenumber, l_quantity from lineitem where l_quantity between 10 and 12",
    "q_in_list" ->
      "select n_name from nation where n_name in ('CHINA', 'INDIA', 'FRANCE')",
    "q_in_subquery" ->
      """select c_custkey, c_name from customer
         where c_nationkey in (select n_nationkey from nation where n_regionkey = 2)""",
    "q_is_null" ->
      "select c_custkey from customer where c_acctbal is not null and c_mktsegment is not null",
    // --- expressions (rows 11-15)
    // charge left unrounded: both engines evaluate the identical IEEE
    // expression tree, so full-precision doubles match bitwise, while
    // round() at .xx5 boundaries diverges between rounding modes.
    "q_math" ->
      """select l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) as charge,
           1 + 2 * 3 - 2 as my_number
         from lineitem""",
    "q_case_when" ->
      """select l_orderkey, l_linenumber,
           case when l_quantity > 40 then 'big'
                when l_quantity > 20 then 'mid'
                else 'small' end as bucket
         from lineitem""",
    // float→int cast of non-integral literals differs (Spark truncates,
    // DuckDB rounds) — integral values cast identically.
    "q_cast" ->
      """select cast(l_quantity as int) as qi,
           cast(l_orderkey as string) as ks,
           cast(7 as double) as litd,
           l_orderkey, l_linenumber
         from lineitem""",
    "q_coalesce" ->
      "select c_custkey, round(coalesce(c_acctbal, 0.0), 2) as bal from customer",
    // --- aggregation (rows 16-19)
    "q_aggregates" ->
      """select l_returnflag,
           round(sum(l_quantity), 2) as sum_qty,
           round(avg(l_quantity), 4) as avg_qty,
           min(l_quantity) as min_qty,
           max(l_quantity) as max_qty,
           count(l_quantity) as count_qty
         from lineitem group by l_returnflag""",
    "q_count_star" ->
      "select count(*) as n from lineitem",
    "q_count_distinct" ->
      "select count(distinct l_returnflag) as n, count(distinct l_suppkey) as s from lineitem",
    "q_group_by" ->
      """select l_returnflag, l_linestatus, round(sum(l_quantity), 2) as sum_qty,
           count(*) as n
         from lineitem group by l_returnflag, l_linestatus""",
    "q_having" ->
      """select l_suppkey, count(*) as n from lineitem
         group by l_suppkey having count(*) > 10""",
    // --- ordering / limits (rows 20-21)
    "q_order_by" ->
      "select c_custkey, c_acctbal from customer order by c_acctbal desc, c_custkey",
    "q_limit" ->
      "select c_custkey, c_name from customer order by c_custkey limit 10 offset 5",
    // --- joins (rows 22-27)
    "q_join_inner" ->
      """select n_name, r_name from nation
         join region on n_regionkey = r_regionkey""",
    "q_join_left" ->
      """select c_custkey, n_name from customer
         left join nation on c_nationkey = n_nationkey and n_regionkey < 2""",
    "q_join_right" ->
      """select s_suppkey, n_name from supplier
         right outer join nation on s_nationkey = n_nationkey""",
    "q_join_full" ->
      """select c_custkey, s_suppkey from customer
         full outer join supplier on c_nationkey = s_nationkey and c_custkey < 100""",
    "q_join_cross" ->
      "select count(*) as n from nation, region",
    "q_subquery" ->
      """select big.n_name from
           (select * from (select n_name, n_regionkey from nation) inner1
            where n_regionkey > 1) big""",
    "q_agg_subquery" ->
      """select n_name, cnt from nation
         join (select c_nationkey, count(*) as cnt from customer
               group by c_nationkey) t
           on n_nationkey = t.c_nationkey""",
    // --- set ops (rows 28-31)
    "q_union" ->
      """select n_name as name from nation where n_regionkey = 0
         union select n_name as name from nation where n_regionkey <= 1""",
    "q_union_all" ->
      """select n_name as name from nation where n_regionkey = 0
         union all select n_name as name from nation where n_regionkey <= 1""",
    "q_intersect" ->
      """select n_regionkey from nation
         intersect select r_regionkey from region where r_regionkey < 3""",
    "q_except" ->
      """select n_regionkey from nation
         except select r_regionkey from region where r_regionkey < 3""",
    // --- windows (rows 32-34)
    "q_rank" ->
      """select c_custkey,
           rank() over (partition by c_nationkey order by c_acctbal desc, c_custkey) as rk,
           dense_rank() over (partition by c_nationkey order by c_mktsegment) as drk
         from customer""",
    "q_window_agg" ->
      """select l_orderkey, l_linenumber,
           round(sum(l_quantity) over (partition by l_orderkey order by l_linenumber), 2) as running
         from lineitem""",
    // ROWS frames need a tie-free ordering (l_linenumber repeats per
    // order in the synthetic data) — l_extendedprice is a continuous
    // random double, unique within partition.
    "q_window_frame" ->
      """select l_orderkey, l_linenumber,
           round(sum(l_quantity) over (partition by l_orderkey order by l_extendedprice
             rows between 1 preceding and current row), 2) as w2,
           round(avg(l_quantity) over (partition by l_orderkey order by l_extendedprice
             rows between unbounded preceding and unbounded following), 4) as wall
         from lineitem""",
  )

  /** graft-dialect SQL differs from the DuckDB oracle text. */
  private val dialectSql: Seq[(String, String, String)] = Seq(
    ("q_literals",
      "select n_nationkey, 42 as i, 2.5 as d, 'x' as s, true as b, " +
        "timestamp('2020-01-02', '03:04:05') as ts from nation",
      "select n_nationkey, 42 as i, 2.5 as d, 'x' as s, true as b, " +
        "TIMESTAMP '2020-01-02 03:04:05' as ts from nation"),
  )

  /** Flagship: TPC-H Q1-flavored aggregation through the graft engine. */
  def entry(spark: SparkSession): DataFrame =
    graftFor(spark, "/root/testdata/sf0.001").query(
      """select l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) as sum_qty,
           round(sum(l_extendedprice), 2) as sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
           round(avg(l_quantity), 4) as avg_qty,
           count(*) as count_order
         from lineitem
         group by l_returnflag, l_linestatus
         order by l_returnflag, l_linestatus""")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val shared = sharedSql.map { case (name, sql) =>
      name -> ((s: SparkSession, dir: String) => graftFor(s, dir).query(sql))
    }
    val dialect = dialectSql.map { case (name, graftSqlText, _) =>
      name -> ((s: SparkSession, dir: String) => graftFor(s, dir).query(graftSqlText))
    }
    (shared ++ dialect).toMap
  }

  /** DuckDB-runnable oracle SQL, column names matching `queries`. */
  def oracleSql: Map[String, String] =
    (sharedSql ++ dialectSql.map { case (n, _, o) => (n, o) }).toMap
}
