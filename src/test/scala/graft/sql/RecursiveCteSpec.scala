package graft.sql

import graft.SparkTestBase

/** Round-5 WITH RECURSIVE (SURVEY §2.1 row 36ak): fixpoint iteration
  * with UNION ALL (append) and UNION (converge-by-distinct)
  * semantics; spark.sql has no recursion, so expectations are
  * closed-form or planted. */
class RecursiveCteSpec extends SparkTestBase {

  test("UNION ALL closure follows chains until keys leave the domain") {
    val df = graftSession.query(
      """with recursive reach(k, root) as (
           select n_nationkey as k, n_nationkey as root from nation
           where n_regionkey = 0
           union all
           select n.n_nationkey, r.root from nation n
           join reach r on n.n_nationkey = r.k + 5
         )
         select root, count(*) as n, max(k) as far from reach
         group by root order by root""")
    val rows = df.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq
    // roots are the regionkey-0 nations; each chain steps +5 to 24
    val roots = spark.sql(
      "select n_nationkey from nation where n_regionkey = 0")
      .collect().map(_.getInt(0)).sorted.toSeq
    val expected = roots.map { r0 =>
      val chain = Iterator.iterate(r0)(_ + 5).takeWhile(_ <= 24).toSeq
      (r0, chain.length.toLong, chain.max)
    }
    assert(rows == expected)
  }

  test("UNION distinct converges on a cyclic step relation") {
    val df = graftSession.query(
      """with recursive walk(k) as (
           select cast(n_nationkey as int) as k from nation where n_nationkey = 0
           union
           select cast((k * 2 + 3) % 11 as int) from walk
         )
         select k from walk order by k""")
    val got = df.collect().map(_.getInt(0)).toSeq
    // closed-form: iterate k -> (2k+3) mod 25 from 0 to closure
    var seen = Set(0)
    var frontier = Set(0)
    while (frontier.nonEmpty) {
      frontier = frontier.map(k => (2 * k + 3) % 11) -- seen
      seen ++= frontier
    }
    assert(got == seen.toSeq.sorted)
  }

  test("recursive CTEs compose with other CTEs and the body pipeline") {
    val df = graftSession.query(
      """with recursive
           seeds as (select n_nationkey from nation where n_nationkey < 2),
           reach(k) as (
             select n_nationkey as k from seeds
             union all
             select k + 10 from reach where k + 10 <= 24
           )
         select count(*) as n from reach""")
    // 0 -> 10 -> 20; 1 -> 11 -> 21: 6 rows
    assert(df.collect().head.getLong(0) == 6L)
  }

  test("non-recursive WITH still shadows outward (name refers to base table)") {
    checkAgainstSparkSql(
      """with nation as (select * from nation where n_regionkey = 0)
         select n_nationkey from nation order by n_nationkey""")
  }

  test("round dedup shuffles only the frontier against seen blocks (r6)") {
    // the invariant the distinct-mode rewrite rests on: a block
    // repartitioned on its row-hash key and checkpointed ADVERTISES
    // that partitioning (LogicalRDD), so the per-block row-hash SEMI
    // join co-partitions with NO seen-side exchange, and the exact
    // except that follows touches only the (frontier-bounded) hash
    // matches. Model the round exactly (broadcast off — at closure
    // scale the seen side is never broadcastable) and pin: no
    // Exchange anywhere above a block's checkpoint scan; every
    // exchange in the plan is on the frontier side.
    import org.apache.spark.sql.functions.{col, xxhash64}
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      def keyed(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("__rck", xxhash64(col("k")))
      // block materialization runs NON-adaptive, exactly as the
      // translator does: an AQE plan reports UnknownPartitioning at
      // checkpoint time, which would lose the advertised partitioning
      def ckpt(df: org.apache.spark.sql.DataFrame) = {
        val p = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try df.localCheckpoint(true)
        finally spark.conf.set("spark.sql.adaptive.enabled", p)
      }
      val b1 = ckpt(keyed(spark.range(0, 1000).toDF("k").distinct())
        .repartition(n, col("__rck")))
      val b2 = ckpt(keyed(spark.range(1400, 1450).toDF("k").distinct())
        .repartition(n, col("__rck")))
      val fresh = keyed(spark.range(500, 1500).toDF("k").distinct())
        .repartition(n, col("__rck"))
      val freshKeys = fresh.select("__rck")
      val seenSub = Seq(b1, b2).map(b =>
          b.alias("__rb").join(freshKeys.alias("__ra"),
            col("__rb.__rck") === col("__ra.__rck"), "left_semi"))
        .reduce(_ union _)
      val round = fresh.except(seenSub)
      assert(round.collect().map(_.getLong(0)).sorted.toSeq ==
        (1000L until 1400L) ++ (1450L until 1500L))
      // frontier-side exchanges only: the fresh pipeline owns at most
      // 4 (distinct, repartition-by-key, and the except re-clustering
      // both of its frontier-bounded sides); a re-shuffled seen block
      // would add one Exchange per block on top. Count them in the
      // final adaptive plan.
      val plan = round.queryExecution.executedPlan.toString
      val finalSection = plan.indexOf("== Initial Plan ==") match {
        case -1 => plan
        case i  => plan.substring(0, i)
      }
      val exchanges = finalSection.linesIterator
        .count(l => l.contains("Exchange hashpartitioning") &&
          !l.contains("ReusedExchange"))
      assert(exchanges <= 4,
        s"expected <= 4 frontier-side exchanges, got $exchanges " +
          "(a seen block was re-shuffled):\n" + finalSection.take(3000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    }
  }

  test("keyed large-closure dedup tier matches the small tier end-to-end (r7)") {
    // force the transition at 3 accumulated rows so a real query
    // exercises the keyed path (re-key of existing blocks, per-round
    // semi + except, the %8 keyed consolidation, and the final RK
    // drop) — the default 4M threshold means the sf-test suite
    // otherwise only ever runs the small tier
    val sql =
      """with recursive walk(k) as (
           select cast(n_nationkey as int) as k from nation
           where n_nationkey = 0
           union
           select cast((k * 2 + 3) % 23 as int) from walk
         )
         select k from walk order by k"""
    val small = graftSession.query(sql).collect().map(_.getInt(0)).toSeq
    assert(small.size > 8) // enough rounds to cross a consolidation
    spark.conf.set("spark.graft.recursive.keyedDedupRows", "3")
    try {
      val keyed = graftSession.query(sql).collect().map(_.getInt(0)).toSeq
      assert(keyed == small)
      // and against the closed-form closure
      var seen = Set(0); var frontier = Set(0)
      while (frontier.nonEmpty) {
        frontier = frontier.map(k => (2 * k + 3) % 23) -- seen
        seen ++= frontier
      }
      assert(keyed == seen.toSeq.sorted)
    } finally spark.conf.unset("spark.graft.recursive.keyedDedupRows")
  }

  test("a non-converging recursion hits the iteration cap loudly") {
    val e = intercept[RuntimeException](graftSession.query(
      """with recursive boom(k) as (
           select n_nationkey as k from nation where n_nationkey = 0
           union all
           select k + 1 from boom
         )
         select count(*) as n from boom"""))
    assert(e.getMessage.contains("iterations"))
  }
}
