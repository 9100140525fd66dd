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
}
