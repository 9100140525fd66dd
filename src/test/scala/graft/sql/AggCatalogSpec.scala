package graft.sql

import graft.SparkTestBase

/** Round-5 aggregate catalog (SURVEY §2.1 row 36ag): boolean
  * aggregates, conditional count, exact median, two-column statistics,
  * positional max_by/min_by, GROUPING(), and the ordered-set
  * aggregates string_agg / array_agg (ORDER BY inside the call).
  * Differential-checked against spark.sql where Spark has the same
  * surface; against an equivalent collect_list formulation where it
  * does not (spark.sql has no ORDER BY inside an aggregate call). */
class AggCatalogSpec extends SparkTestBase {

  test("bool_and / bool_or / count_if / median match spark.sql") {
    checkAgainstSparkSql(
      """select l_returnflag,
           bool_and(l_quantity > 1) as all_gt1,
           bool_or(l_tax > 0.07) as any_tax,
           count_if(l_discount > 0.05) as n_disc,
           median(l_quantity) as med
         from lineitem group by l_returnflag""")
  }

  test("corr / covar_samp / covar_pop match spark.sql") {
    checkAgainstSparkSql(
      """select l_returnflag,
           corr(l_quantity, l_extendedprice) as cr,
           covar_samp(l_quantity, l_extendedprice) as cvs,
           covar_pop(l_quantity, l_extendedprice) as cvp
         from lineitem group by l_returnflag""")
  }

  test("max_by / min_by match spark.sql; arg_max/arg_min alias to them") {
    checkAgainstSparkSql(
      """select c_nationkey,
           max_by(c_name, c_custkey) as last_name,
           min_by(c_name, c_custkey) as first_name
         from customer group by c_nationkey""")
    checkTranslated(
      "select c_nationkey, arg_max(c_name, c_custkey) as a, " +
        "arg_min(c_name, c_custkey) as b from customer group by c_nationkey",
      "select c_nationkey, max_by(c_name, c_custkey) as a, " +
        "min_by(c_name, c_custkey) as b from customer group by c_nationkey")
  }

  test("new aggregates work as window functions too") {
    checkAgainstSparkSql(
      """select c_custkey,
           median(c_acctbal) over (partition by c_nationkey) as med,
           max_by(c_name, c_custkey) over (partition by c_nationkey) as top
         from customer""")
  }

  test("GROUPING() distinguishes rolled-up nulls from data nulls") {
    checkAgainstSparkSql(
      """select l_returnflag, l_linestatus,
           grouping(l_returnflag) as g1, grouping(l_linestatus) as g2,
           count(*) as n
         from lineitem group by rollup(l_returnflag, l_linestatus)""")
  }

  test("string_agg with ORDER BY concatenates in key order") {
    checkTranslated(
      """select c_nationkey,
           string_agg(c_name, ',' order by c_custkey desc) as names
         from customer group by c_nationkey""",
      """select c_nationkey,
           array_join(reverse(transform(
             array_sort(collect_list(struct(c_custkey, c_name))),
             s -> s.c_name)), ',') as names
         from customer group by c_nationkey""")
  }

  test("string_agg over an empty FILTER selection is NULL, not ''") {
    checkTranslated(
      """select c_nationkey,
           string_agg(c_name, ',' order by c_custkey)
             filter (where c_acctbal > 1e18) as names
         from customer group by c_nationkey""",
      "select c_nationkey, cast(null as string) as names " +
        "from customer group by c_nationkey")
  }

  test("array_agg with ORDER BY returns elements in key order") {
    checkTranslated(
      """select c_nationkey,
           array_agg(c_custkey order by c_acctbal desc, c_custkey) as ids
         from customer group by c_nationkey""",
      """select c_nationkey,
           transform(array_sort(collect_list(struct(-c_acctbal, c_custkey)),
             (l, r) -> case when l.col1 < r.col1 then -1
                            when l.col1 > r.col1 then 1
                            when l.c_custkey < r.c_custkey then -1
                            when l.c_custkey > r.c_custkey then 1
                            else 0 end),
             s -> s.c_custkey) as ids
         from customer group by c_nationkey""")
  }

  test("ordered-set aggregates without ORDER BY fail loudly") {
    val e = intercept[RuntimeException](graftSession.query(
      "select string_agg(c_name, ',') from customer"))
    assert(e.getMessage.contains("ORDER BY"))
    val e2 = intercept[RuntimeException](graftSession.query(
      "select array_agg(c_custkey) from customer"))
    assert(e2.getMessage.contains("ORDER BY"))
  }

  test("ordered-set aggregates work over PARTITION BY windows") {
    // every row reads its partition's full ordered aggregation, so
    // DISTINCT over the windowed projection equals the GROUP BY form
    checkTranslated(
      """select distinct c_nationkey,
           string_agg(c_mktsegment, ',' order by c_mktsegment, c_custkey)
             over (partition by c_nationkey) as segs
         from customer where c_custkey <= 40""",
      """select c_nationkey,
           array_join(transform(array_sort(collect_list(
             struct(c_mktsegment as k1, c_custkey as k2,
                    c_mktsegment as v))), s -> s.v), ',') as segs
         from customer where c_custkey <= 40 group by c_nationkey""")
    checkTranslated(
      """select distinct c_nationkey,
           array_agg(c_custkey order by c_custkey)
             over (partition by c_nationkey) as ids
         from customer where c_custkey <= 60""",
      """select c_nationkey, sort_array(collect_list(c_custkey)) as ids
         from customer where c_custkey <= 60 group by c_nationkey""")
  }

  test("DISTINCT ordered-set aggregates dedup in key order") {
    checkTranslated(
      """select c_nationkey,
           string_agg(distinct c_mktsegment, ',' order by c_mktsegment) as segs
         from customer group by c_nationkey""",
      """select c_nationkey,
           array_join(sort_array(collect_set(c_mktsegment)), ',') as segs
         from customer group by c_nationkey""")
    checkTranslated(
      """select array_agg(distinct c_nationkey order by c_nationkey desc) as ks
         from customer""",
      "select sort_array(collect_set(c_nationkey), false) as ks from customer")
  }

  test("DISTINCT ordered-set with a foreign sort key is loud") {
    val e = intercept[RuntimeException](graftSession.query(
      """select string_agg(distinct c_mktsegment, ',' order by c_custkey)
         from customer"""))
    assert(e.getMessage.contains("DISTINCT"))
  }

  test("windowed ordered-set aggregates take OVER-level ORDER BY and frames (r7)") {
    // running prefix: window order/frame select the rows, internal
    // ORDER BY orders the elements — with internal order matching the
    // window order this equals Spark's frame-ordered collect_list
    checkTranslated(
      """select o_custkey, o_orderkey,
           string_agg(cast(o_orderkey as string), ',' order by o_orderkey)
             over (partition by o_custkey order by o_orderkey
                   rows between unbounded preceding and current row) as so_far
         from orders where o_custkey <= 50""",
      """select o_custkey, o_orderkey,
           array_join(collect_list(cast(o_orderkey as string))
             over (partition by o_custkey order by o_orderkey
                   rows between unbounded preceding and current row), ',') as so_far
         from orders where o_custkey <= 50""")
    // sliding frame with a DESC internal order over an ASC window:
    // the elements re-sort within each frame
    checkTranslated(
      """select o_custkey, o_orderkey,
           array_agg(o_orderkey order by o_orderkey desc)
             over (partition by o_custkey order by o_orderkey
                   rows between 1 preceding and 1 following) as nearby
         from orders where o_custkey <= 50""",
      """select o_custkey, o_orderkey,
           reverse(collect_list(o_orderkey)
             over (partition by o_custkey order by o_orderkey
                   rows between 1 preceding and 1 following)) as nearby
         from orders where o_custkey <= 50""")
    // EXCLUDE on a collect window (r9, the old loud wall): running
    // frame minus the current row == the strictly-preceding frame
    // (c_custkey is a tie-free order), so the spelled Spark form is
    // an independent oracle; empty survivor sets read NULL
    checkTranslated(
      """select c_custkey,
           string_agg(c_name, ',' order by c_name)
             over (partition by c_nationkey order by c_custkey
                   rows between unbounded preceding and current row
                   exclude current row) as sa
         from customer""",
      """select c_custkey,
           case when size(__l) = 0 then null
                else array_join(array_sort(__l), ',') end as sa
         from (select c_custkey,
                 collect_list(c_name)
                   over (partition by c_nationkey order by c_custkey
                         rows between unbounded preceding and 1 preceding) as __l
               from customer)""")
  }

  test("unsupported combinations fail loudly") {
    // DISTINCT on the new aggregates
    val e = intercept[RuntimeException](graftSession.query(
      "select median(distinct c_acctbal) from customer"))
    assert(e.getMessage.contains("DISTINCT"))
    // FILTER on multi-argument aggregates (CASE-wrap is not equivalent)
    val e2 = intercept[RuntimeException](graftSession.query(
      "select max_by(c_name, c_custkey) filter (where c_acctbal > 0) " +
        "from customer"))
    assert(e2.getMessage.contains("FILTER"))
    // FILTER on array_agg (NULL elements are kept, not dropped)
    val e3 = intercept[RuntimeException](graftSession.query(
      "select array_agg(c_custkey order by c_custkey) " +
        "filter (where c_acctbal > 0) from customer"))
    assert(e3.getMessage.contains("FILTER"))
    // string_agg separator must be a literal
    val e4 = intercept[RuntimeException](graftSession.query(
      "select string_agg(c_name, c_name order by c_custkey) from customer"))
    assert(e4.getMessage.contains("literal"))
  }

  test("WITHIN GROUP percentiles match spark.sql's forms") {
    checkTranslated(
      """select l_returnflag,
           percentile_cont(0.5) within group (order by l_quantity) as p50,
           percentile_disc(0.25) within group (order by l_quantity) as p25
         from lineitem group by l_returnflag""",
      """select l_returnflag,
           percentile(l_quantity, 0.5) as p50,
           percentile_disc(0.25) within group (order by l_quantity) as p25
         from lineitem group by l_returnflag""")
  }

  test("WITHIN GROUP restrictions are loud") {
    val e = intercept[RuntimeException](graftSession.query(
      "select percentile_cont(0.5) from lineitem"))
    assert(e.getMessage.contains("WITHIN GROUP"))
    val e2 = intercept[RuntimeException](graftSession.query(
      "select percentile_cont(0.5) within group (order by l_quantity desc) from lineitem"))
    assert(e2.getMessage.contains("ascending"))
    val e3 = intercept[RuntimeException](graftSession.query(
      "select sum(l_quantity) within group (order by l_quantity) from lineitem"))
    assert(e3.getMessage.contains("WITHIN GROUP"))
  }
}
