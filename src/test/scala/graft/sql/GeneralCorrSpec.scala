package graft.sql

import graft.SparkTestBase

/** General correlated predicates (r5c): correlation under OR / NOT,
  * mixed-side comparisons, IS NULL / BETWEEN / LIKE over outer refs —
  * in every subquery position (EXISTS/IN flags, scalar aggregates,
  * quantified comparisons, LATERAL). These shapes have no key/theta
  * decorrelation; they lower through the distinct-outer-tuple join on
  * the FULL condition. Oracles are spark.sql where it plans the same
  * text, else a hand-decorrelated equivalent. */
class GeneralCorrSpec extends SparkTestBase {

  // ---- EXISTS -------------------------------------------------------

  test("OR-correlated EXISTS in conjunct position (join-condition path)") {
    checkAgainstSparkSql(
      """select s_suppkey, s_name from supplier s
         where exists (select 1 from nation n
                       where n.n_nationkey = s.s_nationkey
                          or n.n_name = s.s_name)""")
  }

  test("OR-correlated EXISTS as a projected flag") {
    checkTranslated(
      """select s_suppkey,
                exists (select 1 from nation n
                        where n.n_nationkey = s.s_nationkey
                           or length(n.n_name) > s.s_suppkey) as flag
         from supplier s""",
      """select s_suppkey,
                exists (select 1 from nation n
                        where n.n_nationkey = s.s_nationkey)
                or exists (select 1 from nation n
                           where length(n.n_name) > s.s_suppkey) as flag
         from supplier s""")
  }

  test("OR-correlated NOT EXISTS under OR (flag position)") {
    checkTranslated(
      """select c_custkey from customer c
         where c.c_acctbal < 0
            or not exists (select 1 from nation n
                           where n.n_nationkey = c.c_nationkey
                              or n.n_regionkey > c.c_custkey)""",
      """select c_custkey from customer c
         where c.c_acctbal < 0
            or not (exists (select 1 from nation n
                            where n.n_nationkey = c.c_nationkey)
                    or exists (select 1 from nation n
                               where n.n_regionkey > c.c_custkey))""")
  }

  test("mixed-side comparison correlation in EXISTS flag") {
    // n.n_nationkey + s.s_suppkey is neither inner-only nor outer-only
    checkTranslated(
      """select s_suppkey,
                exists (select 1 from nation n
                        where n.n_nationkey + s.s_suppkey = 10) as flag
         from supplier s""",
      """select s_suppkey,
                exists (select 1 from nation n
                        where n.n_nationkey = 10 - s.s_suppkey) as flag
         from supplier s""")
  }

  test("outer-only IS NULL disjunct inside correlated EXISTS") {
    checkTranslated(
      """select c_custkey from customer c
         where exists (select 1 from nation n
                       where n.n_nationkey = c.c_nationkey
                         and (c.c_mktsegment is null or n.n_regionkey < 3))
           and c_custkey <= 60""",
      """select c_custkey from customer c
         where exists (select 1 from nation n
                       where n.n_nationkey = c.c_nationkey
                         and n.n_regionkey < 3)
           and c_custkey <= 60""")
  }

  // ---- IN -----------------------------------------------------------

  test("OR-correlated IN as a projected flag (3VL)") {
    checkTranslated(
      """select s_suppkey,
                s_nationkey in (select n.n_regionkey from nation n
                                where n.n_nationkey = s.s_nationkey
                                   or n.n_name < s.s_name) as flag
         from supplier s""",
      // 3VL spelled out over the per-row set
      """select s_suppkey,
                case when exists (select 1 from nation n
                                  where (n.n_nationkey = s.s_nationkey
                                         or n.n_name < s.s_name)
                                    and n.n_regionkey = s.s_nationkey)
                       then true
                     when not exists (select 1 from nation n
                                      where n.n_nationkey = s.s_nationkey
                                         or n.n_name < s.s_name)
                       then false
                     when s.s_nationkey is null then null
                     when exists (select 1 from nation n
                                  where (n.n_nationkey = s.s_nationkey
                                         or n.n_name < s.s_name)
                                    and n.n_regionkey is null)
                       then null
                     else false end as flag
         from supplier s""")
  }

  test("OR-correlated NOT IN with null-bearing set keeps 3VL") {
    // nullif plants NULLs in the inner value column
    checkTranslated(
      """select c_custkey from customer c
         where c.c_nationkey not in
               (select nullif(n.n_regionkey, 1) from nation n
                where n.n_nationkey = c.c_nationkey
                   or n.n_name like 'A%')
           and c_custkey <= 100""",
      """select c_custkey from customer c
         where not (
           case when exists (select 1 from nation n
                             where (n.n_nationkey = c.c_nationkey
                                    or n.n_name like 'A%')
                               and nullif(n.n_regionkey, 1) = c.c_nationkey)
                  then true
                when not exists (select 1 from nation n
                                 where n.n_nationkey = c.c_nationkey
                                    or n.n_name like 'A%')
                  then false
                when c.c_nationkey is null then null
                when exists (select 1 from nation n
                             where (n.n_nationkey = c.c_nationkey
                                    or n.n_name like 'A%')
                               and nullif(n.n_regionkey, 1) is null)
                  then null
                else false end)
           and c_custkey <= 100""")
  }

  // ---- scalar aggregates ---------------------------------------------

  test("OR-correlated scalar COUNT") {
    checkTranslated(
      """select s_suppkey,
                (select count(*) from nation n
                 where n.n_nationkey = s.s_nationkey
                    or n.n_regionkey = s.s_suppkey % 5) as cnt
         from supplier s""",
      // inclusion-exclusion over the two equality arms
      """select s_suppkey,
                (select count(*) from nation n
                 where n.n_nationkey = s.s_nationkey)
              + (select count(*) from nation n
                 where n.n_regionkey = s.s_suppkey % 5)
              - (select count(*) from nation n
                 where n.n_nationkey = s.s_nationkey
                   and n.n_regionkey = s.s_suppkey % 5) as cnt
         from supplier s""")
  }

  test("mixed-side scalar MAX keyed by equality plus general residual") {
    checkTranslated(
      """select c_custkey,
                (select max(o.o_totalprice) from orders o
                 where o.o_custkey = c.c_custkey
                   and o.o_totalprice + c.c_acctbal > 100000) as m
         from customer c where c_custkey <= 80""",
      """select c_custkey,
                (select max(o.o_totalprice) from orders o
                 where o.o_custkey = c.c_custkey
                   and o.o_totalprice > 100000 - c.c_acctbal) as m
         from customer c where c_custkey <= 80""")
  }

  test("keyless general scalar correlation") {
    checkTranslated(
      """select r_regionkey,
                (select count(*) from nation n
                 where n.n_regionkey = r.r_regionkey
                    or n.n_nationkey > 20 + r.r_regionkey) as cnt
         from region r""",
      """select r_regionkey,
                (select count(*) from nation n
                 where n.n_regionkey = r.r_regionkey)
              + (select count(*) from nation n
                 where n.n_nationkey > 20 + r.r_regionkey)
              - (select count(*) from nation n
                 where n.n_regionkey = r.r_regionkey
                   and n.n_nationkey > 20 + r.r_regionkey) as cnt
         from region r""")
  }

  // ---- quantified comparisons ----------------------------------------

  test("OR-correlated < ALL") {
    checkTranslated(
      """select s_suppkey,
                s_suppkey < all (select n.n_nationkey + 3 from nation n
                                 where n.n_regionkey = s.s_nationkey % 5
                                    or n.n_name > s.s_name) as flag
         from supplier s""",
      """select s_suppkey,
                case when not exists (select 1 from nation n
                                      where n.n_regionkey = s.s_nationkey % 5
                                         or n.n_name > s.s_name)
                       then true
                     when s_suppkey < (select min(n.n_nationkey + 3)
                                       from nation n
                                       where n.n_regionkey = s.s_nationkey % 5
                                          or n.n_name > s.s_name)
                       then true
                     else false end as flag
         from supplier s""")
  }

  // ---- LATERAL --------------------------------------------------------

  test("OR-correlated LATERAL aggregate") {
    checkTranslated(
      """select s_suppkey, a.cnt, a.mx
         from supplier s cross join lateral
              (select count(*) as cnt, max(n.n_nationkey) as mx
               from nation n
               where n.n_nationkey = s.s_nationkey
                  or n.n_regionkey = s.s_suppkey % 5) a""",
      // arms are equality-correlated (spark.sql plans them); the OR
      // set's max is the greatest of the per-arm maxes (greatest
      // skips NULLs), its count is inclusion-exclusion
      """select s_suppkey,
                (select count(*) from nation n
                 where n.n_nationkey = s.s_nationkey)
              + (select count(*) from nation n
                 where n.n_regionkey = s.s_suppkey % 5)
              - (select count(*) from nation n
                 where n.n_nationkey = s.s_nationkey
                   and n.n_regionkey = s.s_suppkey % 5) as cnt,
                greatest(
                  (select max(n.n_nationkey) from nation n
                   where n.n_nationkey = s.s_nationkey),
                  (select max(n.n_nationkey) from nation n
                   where n.n_regionkey = s.s_suppkey % 5)) as mx
         from supplier s""")
  }

  // ---- grouped inners (r5c closes the last correlation wall) ----------

  test("OR-correlated grouped + HAVING EXISTS in conjunct position") {
    checkTranslated(
      """select c_custkey from customer c
         where exists (select 1 from orders o
                       where o.o_custkey = c.c_custkey
                          or o.o_totalprice > c.c_acctbal * 200
                       group by o.o_orderdate
                       having count(*) >= 2)""",
      // per-outer evaluation over the OR-selected rows, spelled as a
      // scalar max over per-date counts
      """select c_custkey from customer c
         where (select max(cnt) from (
                  select count(*) as cnt from orders o
                  where o.o_custkey = c.c_custkey
                     or o.o_totalprice > c.c_acctbal * 200
                  group by o.o_orderdate)) >= 2""")
  }

  test("OR-correlated grouped IN in conjunct position") {
    checkTranslated(
      """select c_custkey from customer c
         where 2 in (select count(*) from orders o
                     where o.o_custkey = c.c_custkey
                        or o.o_totalprice > c.c_acctbal * 200
                     group by o.o_orderdate)""",
      """select c_custkey from customer c
         where exists (select 1 from orders o
                       where o.o_custkey = c.c_custkey
                          or o.o_totalprice > c.c_acctbal * 200
                       group by o.o_orderdate
                       having count(*) = 2)""")
  }

  // ---- grouped inners in FLAG positions (r6 closes the matrix) --------

  test("OR-correlated grouped + HAVING EXISTS as a projected flag (r6)") {
    checkTranslated(
      """select c_custkey,
           exists (select 1 from orders o
                   where o.o_custkey = c.c_custkey
                      or o.o_totalprice > c.c_acctbal * 200
                   group by o.o_orderdate
                   having count(*) >= 2) as f
         from customer c order by c_custkey""",
      // "some group passes" = max over per-group counts clears the
      // threshold; empty selection -> NULL max -> coalesce false
      """select c_custkey,
           coalesce((select max(cnt) from (
                       select count(*) as cnt from orders o
                       where o.o_custkey = c.c_custkey
                          or o.o_totalprice > c.c_acctbal * 200
                       group by o.o_orderdate)) >= 2, false) as f
         from customer c order by c_custkey""")
  }

  test("OR-correlated grouped EXISTS under OR / NOT in WHERE (r6)") {
    checkTranslated(
      """select c_custkey from customer c
         where c_acctbal < 100
            or exists (select 1 from orders o
                       where o.o_custkey = c.c_custkey
                          or o.o_totalprice > c.c_acctbal * 200
                       group by o.o_orderdate
                       having count(*) >= 3)""",
      """select c_custkey from customer c
         where c_acctbal < 100
            or coalesce((select max(cnt) from (
                 select count(*) as cnt from orders o
                 where o.o_custkey = c.c_custkey
                    or o.o_totalprice > c.c_acctbal * 200
                 group by o.o_orderdate)) >= 3, false)""")
    checkTranslated(
      """select c_custkey from customer c
         where not exists (select 1 from orders o
                           where o.o_custkey = c.c_custkey
                              or o.o_totalprice > c.c_acctbal * 200
                           group by o.o_orderdate
                           having count(*) >= 2)
           and c_custkey <= 200""",
      """select c_custkey from customer c
         where not coalesce((select max(cnt) from (
                 select count(*) as cnt from orders o
                 where o.o_custkey = c.c_custkey
                    or o.o_totalprice > c.c_acctbal * 200
                 group by o.o_orderdate)) >= 2, false)
           and c_custkey <= 200""")
  }

  test("OR-correlated grouped IN as a projected flag (r6, 3VL)") {
    // per-group counts are never NULL: membership is two-valued here
    checkTranslated(
      """select c_custkey,
           2 in (select count(*) from orders o
                 where o.o_custkey = c.c_custkey
                    or o.o_totalprice > c.c_acctbal * 200
                 group by o.o_orderdate) as f
         from customer c order by c_custkey""",
      """select c_custkey,
           coalesce((select max(case when cnt = 2 then 1 else 0 end)
                     from (select count(*) as cnt from orders o
                           where o.o_custkey = c.c_custkey
                              or o.o_totalprice > c.c_acctbal * 200
                           group by o.o_orderdate)) = 1, false) as f
         from customer c order by c_custkey""")
  }

  test("OR-correlated grouped NOT IN flag vs null-bearing values (r6)") {
    // nullif plants NULL values: a tuple with surviving groups, no
    // exact match, and a NULL value must read UNKNOWN -> the NOT IN
    // flag is NULL -> row filtered in WHERE position; spelled-out 3VL
    checkTranslated(
      """select c_custkey from customer c
         where 2 not in (select nullif(count(*), 3) from orders o
                         where o.o_custkey = c.c_custkey
                            or o.o_totalprice > c.c_acctbal * 200
                         group by o.o_orderdate)
           and c_custkey <= 300""",
      """select c_custkey from customer c
         where not coalesce((
             select case when max(case when cnt = 2 then 1 else 0 end) = 1
                           then true
                         when max(case when cnt is null then 1 else 0 end) = 1
                           then cast(null as boolean)
                         else false end
             from (select nullif(count(*), 3) as cnt from orders o
                   where o.o_custkey = c.c_custkey
                      or o.o_totalprice > c.c_acctbal * 200
                   group by o.o_orderdate)), false)
           and c_custkey <= 300""")
  }

  test("grouped general IN without HAVING keeps aggregate membership (r6)") {
    // no HAVING at all: membership over the per-group aggregate set
    checkTranslated(
      """select c_custkey,
           c_nationkey in (select min(o.o_custkey) % 30 from orders o
                           where o.o_custkey = c.c_custkey
                              or o.o_totalprice > c.c_acctbal * 200
                           group by o.o_orderdate) as f
         from customer c order by c_custkey""",
      """select c_custkey,
           exists (select 1
                   from (select min(o.o_custkey) % 30 as v from orders o
                         where o.o_custkey = c.c_custkey
                            or o.o_totalprice > c.c_acctbal * 200
                         group by o.o_orderdate)
                   where v = c.c_nationkey) as f
         from customer c order by c_custkey""")
  }

  // ---- nested UNCORRELATED scalars hoist (r8, 36ax closing) ----------

  test("uncorrelated scalar nested in a general EXISTS conjunct hoists") {
    checkAgainstSparkSql(
      """select c_custkey from customer o
         where exists (select 1 from orders i
                       where i.o_custkey = o.c_custkey
                         and (o.c_acctbal >
                                (select avg(c_acctbal) from customer)
                              or i.o_totalprice < 2000))
         order by c_custkey""")
  }

  test("uncorrelated scalar in a general IN-flag disjunct hoists") {
    checkAgainstSparkSql(
      """select s_suppkey,
           s_nationkey in (select n.n_nationkey from nation n
                           where n.n_name like 'A%'
                              or s.s_acctbal + n.n_regionkey >
                                  (select avg(s_acctbal) from supplier))
             as flag
         from supplier s order by s_suppkey""")
  }

  test("nested scalar in a general scalar-aggregate correlation hoists") {
    checkAgainstSparkSql(
      """select c_custkey,
           (select count(*) from orders i
            where i.o_custkey = c.c_custkey
               or i.o_totalprice >
                   (select max(c_acctbal) from customer) * 20) as n
         from customer c order by c_custkey""")
  }

  test("nested scalar hoist keeps the standard guards (0 rows, >1 rows)") {
    // 0-row subquery → NULL scalar → comparison NULL → disjunct falls
    // to the equality arm
    checkAgainstSparkSql(
      """select s_suppkey from supplier s
         where exists (select 1 from nation n
                       where n.n_nationkey = s.s_nationkey
                          or s.s_acctbal > (select avg(n_regionkey)
                                            from nation where false))
         order by s_suppkey""")
    // >1-row scalar subquery errors at action time, loudly
    val e = intercept[Exception](graftSession.query(
      """select s_suppkey from supplier s
         where exists (select 1 from nation n
                       where n.n_nationkey = s.s_nationkey
                          or s.s_acctbal > (select n_regionkey
                                            from nation))""").collect())
    assert(e.getMessage.contains("more than one row"), e.getMessage)
  }

  // ---- loud walls stay loud -------------------------------------------

  test("CORRELATED scalar nested in a general correlation stays loud") {
    val e = intercept[Exception](graftSession.query(
      """select s_suppkey from supplier s
         where exists (select 1 from nation n
                       where n.n_nationkey = s.s_nationkey
                          or s.s_acctbal > (select avg(c_acctbal)
                                            from customer
                                            where c_nationkey = n.n_nationkey))
      """).collect())
    assert(e.getMessage.contains("CORRELATED"), e.getMessage)
  }

  test("nested subquery inside a general correlation is a loud error") {
    val e = intercept[Exception](graftSession.query(
      """select s_suppkey from supplier s
         where s_suppkey in (select n.n_nationkey from nation n
                             where n.n_name = s.s_name
                                or n.n_regionkey in (select r_regionkey
                                                     from region)) or false
      """).collect())
    assert(e.getMessage.contains("subquer"))
  }
}
