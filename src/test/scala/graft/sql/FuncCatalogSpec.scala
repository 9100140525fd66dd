package graft.sql

import graft.SparkTestBase

/** Round-5 scalar-function catalog pins (SURVEY §2.1 row 36ag note):
  * the registry fallthrough exposes Spark's whole builtin surface;
  * these differential tests pin the names the oracle queries rely on
  * plus the graft-specific literal-separator string_split mapping. */
class FuncCatalogSpec extends SparkTestBase {

  test("string catalog matches spark.sql") {
    checkAgainstSparkSql(
      """select p_partkey, upper(p_name) as up, lower(p_brand) as lo,
           replace(p_name, 'a', '@') as rep,
           left(p_name, 5) as l5, right(p_name, 4) as r4,
           lpad(p_brand, 12, '*') as lp, rpad(p_brand, 12, '.') as rp,
           reverse(p_type) as rev, repeat(p_brand, 2) as rpt,
           concat_ws('-', p_brand, p_type) as cw,
           length(trim(p_name)) as len, md5(p_name) as h,
           instr(p_name, 'al') as pos
         from part""")
  }

  test("math catalog matches spark.sql") {
    checkAgainstSparkSql(
      """select l_orderkey, l_linenumber, abs(l_quantity - 25) as ab,
           ceil(l_quantity / 7) as ce, floor(l_quantity / 7) as fl,
           sqrt(l_quantity) as sq, sign(l_discount - 0.05) as sg,
           greatest(l_quantity, l_extendedprice / 100) as gr,
           least(l_tax, l_discount) as ls, mod(l_orderkey, 7) as md
         from lineitem where l_orderkey < 100""")
  }

  test("date catalog matches spark.sql") {
    checkAgainstSparkSql(
      """select o_orderkey,
           cast(date_trunc('month', o_orderdate) as date) as mon,
           last_day(cast(o_orderdate as date)) as ld,
           make_date(1995, cast(extract(month from o_orderdate) as int), 1) as md
         from orders where o_orderkey < 200""")
  }

  test("IGNORE NULLS window functions match spark.sql (both syntax positions)") {
    // spark.sql only accepts the after-parens standard form; graft
    // accepts both — run the inside-parens (DuckDB) form through
    // graft and compare against spark.sql's standard spelling
    checkTranslated(
      """select c_custkey,
           lag(nullif(c_acctbal, 0.0), 1 ignore nulls)
             over (partition by c_nationkey order by c_custkey) as prev_nn,
           first_value(nullif(c_mktsegment, 'BUILDING') ignore nulls)
             over (partition by c_nationkey order by c_custkey
                   rows between unbounded preceding and current row) as fs
         from customer""",
      """select c_custkey,
           lag(nullif(c_acctbal, 0.0), 1) ignore nulls
             over (partition by c_nationkey order by c_custkey) as prev_nn,
           first_value(nullif(c_mktsegment, 'BUILDING')) ignore nulls
             over (partition by c_nationkey order by c_custkey
                   rows between unbounded preceding and current row) as fs
         from customer""")
    // graft's after-parens form agrees too
    checkAgainstSparkSql(
      """select c_custkey,
           last_value(nullif(c_acctbal, 0.0)) ignore nulls
             over (partition by c_nationkey order by c_custkey
                   rows between unbounded preceding and current row) as ln
         from customer""")
  }

  test("IGNORE NULLS on non-offset functions fails loudly") {
    val e = intercept[RuntimeException](graftSession.query(
      "select row_number() ignore nulls over (order by c_custkey) from customer"))
    assert(e.getMessage.contains("IGNORE NULLS"))
    val e2 = intercept[RuntimeException](graftSession.query(
      "select length(c_name ignore nulls) from customer"))
    assert(e2.getMessage.contains("OVER"))
  }

  test("FETCH FIRST ... ONLY equals LIMIT/OFFSET") {
    checkTranslated(
      """select c_custkey from customer order by c_custkey
         offset 5 rows fetch first 10 rows only""",
      "select c_custkey from customer order by c_custkey limit 10 offset 5")
    checkTranslated(
      "select c_custkey from customer order by c_custkey fetch first row only",
      "select c_custkey from customer order by c_custkey limit 1")
  }

  test("FETCH FIRST n ROWS WITH TIES keeps every row tied with the n-th") {
    checkTranslated(
      """select c_custkey, c_nationkey from customer
         order by c_nationkey fetch first 20 rows with ties""",
      """select c_custkey, c_nationkey from
           (select c_custkey, c_nationkey,
                   rank() over (order by c_nationkey) as rk from customer) t
         where rk <= 20""")
    // desc direction + set-op tail position
    checkTranslated(
      """select c_nationkey from customer where c_nationkey < 5
         union all select c_nationkey from customer where c_nationkey >= 5
         order by c_nationkey desc fetch first 10 rows with ties""",
      """select c_nationkey from
           (select c_nationkey,
                   rank() over (order by c_nationkey desc) as rk
            from customer) t
         where rk <= 10""")
  }

  test("WITH TIES without ORDER BY fails loudly") {
    val e = intercept[RuntimeException](graftSession.query(
      "select c_custkey from customer fetch first 3 rows with ties"))
    assert(e.getMessage.contains("ORDER BY"))
  }
}
