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

  // ---- ASOF JOIN (r7b) ------------------------------------------------

  test("ASOF JOIN: all four directions, inner and left (r7b)") {
    // hand-verified against DuckDB 1.0's NATIVE asof join on the same
    // nine-cell fixture (see q_asof_sql's oracle for the live check)
    def rows(op: String, lj: Boolean): Seq[(Long, Long, Any, Any)] =
      graftSession.query(
        s"""select k, t, t2, v from
            (values (1,10),(1,20),(2,5)) a(k, t)
            asof ${if (lj) "left " else ""}join
            (values (1,10,'x'),(1,15,'y'),(2,99,'z')) b(k2, t2, v)
            on k = k2 and t $op t2""").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3)))
        .sortBy(x => (x._1, x._2)).toSeq
    assert(rows(">=", lj = true) == Seq((1L, 10L, 10L, "x"),
      (1L, 20L, 15L, "y"), (2L, 5L, null, null)))
    assert(rows(">", lj = true) == Seq((1L, 10L, null, null),
      (1L, 20L, 15L, "y"), (2L, 5L, null, null)))
    assert(rows("<=", lj = true) == Seq((1L, 10L, 10L, "x"),
      (1L, 20L, null, null), (2L, 5L, 99L, "z")))
    assert(rows("<", lj = true) == Seq((1L, 10L, 15L, "y"),
      (1L, 20L, null, null), (2L, 5L, 99L, "z")))
    // inner drops the unmatched left rows
    assert(rows(">=", lj = false) == Seq((1L, 10L, 10L, "x"),
      (1L, 20L, 15L, "y")))
    assert(rows(">", lj = false) == Seq((1L, 20L, 15L, "y")))
  }

  test("ASOF JOIN: qualified refs, null keys/times never match, plan has no join") {
    // alias-qualified refs resolve on the flat output frame
    val df = graftSession.query(
      """select l.k, l.t, r.v from
          (values (1,10),(2,cast(null as bigint))) l(k, t)
          asof left join
          (values (1,5,'x'),(cast(null as bigint),1,'n')) r(k2, t2, v)
          on l.k = r.k2 and l.t >= r.t2""")
    val got = df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(2)) null else r.getString(2))).sortBy(_._1).toSeq
    // row (2, null-time) matches nothing; the null-keyed right row
    // serves nobody
    assert(got == Seq((1L, "x"), (2L, null)), got.mkString(","))
    // lowered WITHOUT a join: union + one window over the key
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
  }

  test("ASOF JOIN tolerance band (r8): compound bound filters the match") {
    // backward with band t - t2 <= 4: (1,20)'s nearest is 15 (within
    // 5 > 4 → no match); (1,12) matches 10 within 2 ✓; order of the
    // band and direction conjuncts must not matter
    for (on <- Seq("k = k2 and t >= t2 and t - t2 <= 4",
                   "t - t2 <= 4 and k = k2 and t >= t2")) {
      val got = graftSession.query(
        s"""select k, t, t2, v from
            (values (1,12),(1,20),(2,5)) a(k, t)
            asof left join
            (values (1,10,'x'),(1,15,'y'),(2,99,'z')) b(k2, t2, v)
            on $on""").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(got == Seq((1L, 12L, 10L, "x"), (1L, 20L, null, null),
        (2L, 5L, null, null)), got.mkString(","))
    }
    // inner + band: unmatched and out-of-band rows both drop
    val inner = graftSession.query(
      """select k, t, t2 from
          (values (1,12),(1,20)) a(k, t)
          asof join
          (values (1,10,'x'),(1,15,'y')) b(k2, t2, v)
          on k = k2 and t >= t2 and t - t2 <= 4""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(inner == Seq((1L, 12L, 10L)), inner.mkString(","))
    // r9 (r8 ADVICE): a band referencing a NON-TIME right column is
    // loud — post-match filtering cannot bound a farther row's other
    // columns, so the r8 behavior (silently no-match when a farther
    // row qualifies) was unsound
    val eV = intercept[RuntimeException](graftSession.query(
      """select k, t, v from
          (values (1,12),(1,20)) a(k, t)
          asof left join
          (values (1,10,'x'),(1,15,'y')) b(k2, t2, v)
          on k = k2 and t >= t2 and t - length(v) >= 12"""))
    assert(eV.getMessage.contains("time column"), eV.getMessage)
    // an equivalent REWRITTEN spelling of a safe bound still works
    // (t2 >= t - 4 ⇔ t - t2 <= 4)
    val rew = graftSession.query(
      """select k, t, t2 from
          (values (1,12),(1,20)) a(k, t)
          asof left join
          (values (1,10,'x'),(1,15,'y')) b(k2, t2, v)
          on k = k2 and t >= t2 and t2 >= t - 4""").collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).sortBy(_._1).toSeq
    assert(rew == Seq((12L, 10L: java.lang.Long), (20L, null)),
      rew.mkString(","))
    // a MIN-distance bound (satisfiable by a FARTHER row when the
    // nearest fails) cannot lower as a post-match filter — loud
    val eMin = intercept[RuntimeException](graftSession.query(
      """select 1 as one from
          (values (1,12)) a(k, t) asof join (values (1,10)) b(k2, t2)
          on k = k2 and t >= t2 and t - t2 >= 4"""))
    assert(eMin.getMessage.contains("monotone"), eMin.getMessage)
    // right-only bounds belong in a right-side subquery — loud
    val eR = intercept[RuntimeException](graftSession.query(
      """select 1 as one from
          (values (1,12)) a(k, t) asof join (values (1,10)) b(k2, t2)
          on k = k2 and t >= t2 and t2 >= 100"""))
    assert(eR.getMessage.contains("both sides"), eR.getMessage)
    // left-only bounds belong in WHERE — loud
    val e = intercept[RuntimeException](graftSession.query(
      """select 1 as one from
          (values (1,12)) a(k, t) asof join (values (1,10)) b(k2, t2)
          on k = k2 and t >= t2 and t + 1 <= 20"""))
    assert(e.getMessage.contains("reference the right"), e.getMessage)
  }

  test("ASOF JOIN walls are loud") {
    val e1 = intercept[RuntimeException](graftSession.query(
      """select 1 as one from nation n asof join region r
         on n.n_regionkey = r.r_regionkey"""))
    assert(e1.getMessage.contains("inequality"), e1.getMessage)
    val e2 = intercept[RuntimeException](graftSession.query(
      """select 1 as one from
          (select n_nationkey a, n_regionkey b from nation) n
          asof join
          (select r_regionkey c, r_name d from region) r
         on n.a >= r.c and n.b >= r.c"""))
    assert(e2.getMessage.contains("ONE inequality"), e2.getMessage)
    // shared column names: the flat output frame cannot hold both
    val e3 = intercept[RuntimeException](graftSession.query(
      """select 1 as one from nation a asof join nation b
         on a.n_regionkey = b.n_regionkey and a.n_nationkey >= b.n_nationkey"""))
    assert(e3.getMessage.contains("share column names"), e3.getMessage)
  }
}
