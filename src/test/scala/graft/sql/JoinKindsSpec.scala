package graft.sql

import graft.SparkTestBase

/** Round-5 join kinds (SURVEY §2.1 row 36ah): SEMI/ANTI joins (DuckDB
  * and Spark SQL spellings) and NATURAL joins. */
class JoinKindsSpec extends SparkTestBase {

  test("semi join equals EXISTS; anti join equals NOT EXISTS") {
    checkTranslated(
      "select c_custkey from customer semi join orders on o_custkey = c_custkey",
      """select c_custkey from customer
         where exists (select 1 from orders where o_custkey = c_custkey)""")
    checkTranslated(
      "select c_custkey from customer anti join orders on o_custkey = c_custkey",
      """select c_custkey from customer
         where not exists (select 1 from orders where o_custkey = c_custkey)""")
  }

  test("spark SQL spelling LEFT SEMI / LEFT ANTI parses to the same join") {
    checkAgainstSparkSql(
      "select c_custkey from customer left semi join orders on o_custkey = c_custkey")
    checkAgainstSparkSql(
      "select c_custkey from customer left anti join orders on o_custkey = c_custkey")
  }

  test("semi/anti join right-side columns are not visible") {
    val e = intercept[Exception](graftSession.query(
      "select c_custkey, o_totalprice from customer semi join orders on o_custkey = c_custkey")
      .schema)
    assert(e.getMessage.toLowerCase.contains("o_totalprice"))
  }

  test("natural join matches spark.sql on renamed CTEs") {
    checkAgainstSparkSql(
      """with a as (select n_regionkey as rk, n_name from nation),
              b as (select r_regionkey as rk, r_name from region)
         select rk, n_name, r_name from a natural join b""")
    checkAgainstSparkSql(
      """with a as (select n_regionkey as rk, n_name from nation),
              b as (select r_regionkey as rk, r_name from region
                    where r_regionkey < 2)
         select rk, n_name, r_name from a natural left join b""")
  }

  test("natural join with no common columns fails loudly") {
    val e = intercept[RuntimeException](graftSession.query(
      "select * from nation natural join region"))
    assert(e.getMessage.contains("common column"))
  }

  test("semi join with USING works") {
    checkTranslated(
      """with a as (select n_regionkey as rk, n_name from nation),
              b as (select r_regionkey as rk from region where r_regionkey < 2)
         select rk, n_name from a semi join b using (rk)""",
      """with a as (select n_regionkey as rk, n_name from nation)
         select rk, n_name from a where rk < 2""")
  }
}
