package graft.sql

import graft.SparkTestBase

/** Round-5 LATERAL correlated aggregate derived tables (SURVEY §2.1
  * row 36al). spark.sql supports LATERAL natively, so most cases
  * differential-check directly. */
class LateralSpec extends SparkTestBase {

  test("cross join lateral aggregate equals the scalar-subquery form") {
    checkTranslated(
      """select c.c_custkey, o.n_orders, o.total from customer c
         cross join lateral (
           select count(*) as n_orders,
                  round(sum(o_totalprice), 2) as total
           from orders where orders.o_custkey = c.c_custkey) o""",
      """select c.c_custkey,
           (select count(*) from orders
            where orders.o_custkey = c.c_custkey) as n_orders,
           (select round(sum(o_totalprice), 2) from orders
            where orders.o_custkey = c.c_custkey) as total
         from customer c""")
  }

  test("join lateral ... on true and comma-lateral parse to the same thing") {
    val expected =
      """select c.c_custkey,
           (select max(o_totalprice) from orders
            where orders.o_custkey = c.c_custkey) as m
         from customer c"""
    checkTranslated(
      """select c.c_custkey, o.m from customer c
         join lateral (select max(o_totalprice) as m from orders
                       where orders.o_custkey = c.c_custkey) o on true""",
      expected)
    checkTranslated(
      """select c.c_custkey, o.m from customer c,
         lateral (select max(o_totalprice) as m from orders
                  where orders.o_custkey = c.c_custkey) o""",
      expected)
  }

  test("uncorrelated lateral is a broadcast one-row aggregate") {
    checkTranslated(
      """select n_name, t.mx from nation,
         lateral (select max(r_regionkey) as mx from region) t""",
      "select n_name, (select max(r_regionkey) from region) as mx from nation")
  }

  test("lateral with local predicates and expression items") {
    checkAgainstSparkSql(
      """select c.c_custkey, o.span from customer c
         cross join lateral (
           select max(o_totalprice) - min(o_totalprice) as span
           from orders where orders.o_custkey = c.c_custkey
             and o_totalprice > 1000) o""")
  }

  test("lateral restrictions are loud") {
    val e1 = intercept[RuntimeException](graftSession.query(
      """select c.c_custkey, o.k from customer c
         cross join lateral (select o_orderkey as k from orders
                             where orders.o_custkey = c.c_custkey) o"""))
    assert(e1.getMessage.contains("aggregate"))
    val e2 = intercept[RuntimeException](graftSession.query(
      """select c.c_custkey, o.n from customer c
         cross join lateral (select count(*) as n from orders
                             where orders.o_custkey > c.c_custkey) o"""))
    assert(e2.getMessage.contains("equality"))
    val e3 = intercept[RuntimeException](graftSession.query(
      """select c.c_custkey from customer c
         join lateral (select count(*) as n from orders
                       where orders.o_custkey = c.c_custkey) o
           on o.n > 2"""))
    assert(e3.getMessage.contains("TRUE"))
    val e4 = intercept[RuntimeException](graftSession.query(
      """select c.c_custkey from customer c
         cross join lateral (select count(*) as n from orders
                             where orders.o_custkey = c.c_custkey)"""))
    assert(e4.getMessage.contains("alias"))
  }
}
