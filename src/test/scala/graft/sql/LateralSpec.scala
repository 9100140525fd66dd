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

  test("theta-correlated lateral aggregates (r5b)") {
    // keyless theta: count of orders under a per-customer threshold
    checkTranslated(
      """select c.c_custkey, o.n from customer c
         cross join lateral (
           select count(*) as n from orders
           where orders.o_totalprice < c.c_acctbal * 50) o""",
      """select c_custkey,
           (select count(*) from orders
            where orders.o_totalprice < customer.c_acctbal * 50) as n
         from customer""")
    // equality key + theta operand, several aggregates
    checkTranslated(
      """select c.c_custkey, o.n, o.mx from customer c
         cross join lateral (
           select count(*) as n, max(o_totalprice) as mx from orders
           where orders.o_custkey = c.c_custkey
             and orders.o_totalprice < c.c_acctbal * 40) o""",
      """select c_custkey,
           (select count(*) from orders
            where orders.o_custkey = customer.c_custkey
              and orders.o_totalprice < customer.c_acctbal * 40) as n,
           (select max(o_totalprice) from orders
            where orders.o_custkey = customer.c_custkey
              and orders.o_totalprice < customer.c_acctbal * 40) as mx
         from customer""")
  }

  // ---- top-n form (r5b): ORDER BY ... LIMIT inside LATERAL --------

  test("cross join lateral top-n picks each customer's biggest orders") {
    checkAgainstSparkSql(
      """select c.c_custkey, t.o_orderkey, t.o_totalprice
         from customer c
         cross join lateral (
           select o_orderkey, o_totalprice from orders
           where orders.o_custkey = c.c_custkey
           order by o_totalprice desc, o_orderkey limit 2) t""")
  }

  test("left join lateral keeps customers with no orders") {
    checkAgainstSparkSql(
      """select c.c_custkey, t.o_orderkey
         from customer c
         left join lateral (
           select o_orderkey from orders
           where orders.o_custkey = c.c_custkey
           order by o_totalprice desc, o_orderkey limit 1) t on true""")
  }

  test("lateral top-n with offset skips each group's leader") {
    checkAgainstSparkSql(
      """select c.c_custkey, t.o_orderkey
         from customer c
         cross join lateral (
           select o_orderkey from orders
           where orders.o_custkey = c.c_custkey
           order by o_totalprice desc, o_orderkey limit 2 offset 1) t""")
  }

  test("lateral top-n sorts by unprojected keys and select aliases") {
    checkAgainstSparkSql(
      """select c.c_custkey, t.k from customer c
         cross join lateral (
           select o_orderkey as k from orders
           where orders.o_custkey = c.c_custkey
           order by o_totalprice desc, o_orderkey limit 1) t""")
    // alias as the sort key
    checkTranslated(
      """select c.c_custkey, t.p from customer c
         cross join lateral (
           select o_totalprice as p from orders
           where orders.o_custkey = c.c_custkey
           order by p desc, o_orderkey limit 1) t""",
      """select c.c_custkey, t.p from customer c
         cross join lateral (
           select o_totalprice as p from orders
           where orders.o_custkey = c.c_custkey
           order by o_totalprice desc, o_orderkey limit 1) t""")
  }

  test("lateral top-n bare star expands the inner columns") {
    checkAgainstSparkSql(
      """select n.n_name, t.s_name, t.s_acctbal
         from nation n
         cross join lateral (
           select * from supplier
           where supplier.s_nationkey = n.n_nationkey
           order by s_acctbal desc, s_suppkey limit 1) t""")
  }

  test("lateral fetch first with ties keeps tied rows per group") {
    // graft dialect: FETCH ... WITH TIES inside LATERAL = rank() <= n
    assertSameRows(
      graftSession.query(
        """select c.c_nationkey, t.seg from customer c
           cross join lateral (
             select c_mktsegment as seg from customer c2
             where c2.c_nationkey = c.c_nationkey
             order by c_mktsegment
             fetch first 1 rows with ties) t"""),
      spark.sql(
        """select c.c_nationkey, t.seg from customer c
           cross join lateral (
             select c_mktsegment as seg from
               (select c_mktsegment,
                       rank() over (partition by c_nationkey
                                    order by c_mktsegment) rnk
                from customer c2 where c2.c_nationkey = c.c_nationkey)
             where rnk <= 1) t"""))
  }

  test("uncorrelated lateral top-n broadcasts the global top rows") {
    checkAgainstSparkSql(
      """select r.r_name, t.n_name from region r
         cross join lateral (
           select n_name from nation order by n_name limit 2) t""")
  }

  test("lateral top-n restrictions are loud") {
    val e1 = intercept[RuntimeException](graftSession.query(
      """select c.c_custkey, t.o_orderkey from customer c
         cross join lateral (
           select o_orderkey from orders
           where orders.o_custkey = c.c_custkey limit 2) t"""))
    assert(e1.getMessage.contains("ORDER BY"))
    val e2 = intercept[RuntimeException](graftSession.query(
      """select c.c_custkey, t.o_orderkey from customer c
         cross join lateral (
           select o_orderkey from orders
           where orders.o_custkey = c.c_custkey
           order by o_totalprice desc
           offset 1 rows fetch first 2 rows with ties) t"""))
    assert(e2.getMessage.contains("TIES"))
  }

  test("grouped LATERAL aggregates with OR correlation and HAVING (r7)") {
    // each outer row fans out to its correlated set's groups; Spark's
    // native lateral is the independent oracle (different plan)
    def check(sql: String): Unit =
      assertSameRows(graftSession.query(sql), spark.sql(sql))
    check(
      """select c.c_custkey, a.k, a.n from customer c
         cross join lateral (
           select o.o_orderstatus as k, count(*) as n from orders o
           where o.o_custkey = c.c_custkey
              or o.o_totalprice > c.c_acctbal * 100
           group by o.o_orderstatus) a""")
    // LEFT keeps outer rows whose correlated set has no surviving
    // group (NULL lateral columns); CROSS drops them — the one place
    // the join spelling matters for the aggregate form. graft's LEFT
    // spelling takes ON TRUE; Spark's native lateral takes none.
    assertSameRows(
      graftSession.query(
        """select c.c_custkey, a.k, a.n from customer c
           left join lateral (
             select o.o_orderstatus as k, count(*) as n from orders o
             where o.o_custkey = c.c_custkey
             group by o.o_orderstatus
             having count(*) > 5) a on true"""),
      spark.sql(
        """select c.c_custkey, a.k, a.n from customer c
           left join lateral (
             select o.o_orderstatus as k, count(*) as n from orders o
             where o.o_custkey = c.c_custkey
             group by o.o_orderstatus
             having count(*) > 5) a"""))
    // GROUP-BY-less HAVING: zero-or-one lateral row per outer row
    check(
      """select c.c_custkey, a.n from customer c
         cross join lateral (
           select count(*) as n from orders o
           where o.o_custkey = c.c_custkey
           having count(*) > 5) a""")
    // group keys may appear inside item expressions and agg args
    check(
      """select c.c_custkey, a.lab, a.n from customer c
         cross join lateral (
           select concat(o.o_orderstatus, '!') as lab,
                  count(o.o_orderstatus) as n
           from orders o
           where o.o_custkey = c.c_custkey
             and (o.o_orderstatus = 'F' or o.o_totalprice < c.c_acctbal)
           group by o.o_orderstatus) a""")
    // a select item that is neither an aggregate nor a group key is
    // loud
    val e = intercept[RuntimeException](graftSession.query(
      """select c.c_custkey, a.x from customer c
         cross join lateral (
           select o.o_orderkey as x, count(*) as n from orders o
           where o.o_custkey = c.c_custkey
           group by o.o_orderstatus) a"""))
    assert(e.getMessage.contains("GROUP BY keys"), e.getMessage)
  }

  test("lateral restrictions are loud") {
    val e1 = intercept[RuntimeException](graftSession.query(
      """select c.c_custkey, o.k from customer c
         cross join lateral (select o_orderkey as k from orders
                             where orders.o_custkey = c.c_custkey) o"""))
    assert(e1.getMessage.contains("aggregate"))
    // r5c: OR-correlation is no longer a restriction — it lowers
    // through the general distinct-outer-tuple join (GeneralCorrSpec
    // covers the semantics; this pins that the old wall stays down)
    val orLateral = graftSession.query(
      """select c.c_custkey, o.n from customer c
         cross join lateral (select count(*) as n from orders
                             where orders.o_custkey = c.c_custkey
                                or orders.o_totalprice > 0) o""")
    assertSameRows(orLateral, spark.sql(
      """select c.c_custkey,
                (select count(*) from orders
                 where orders.o_custkey = c.c_custkey
                    or orders.o_totalprice > 0) as n
         from customer c"""))
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
