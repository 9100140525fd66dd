package graft.sql

import graft.{Graft, SparkTestBase}
import graft.sources.Sources

/** Replays SQL queries drawn verbatim from the reference's own test
  * suite (file:line cited per query) against the reference's own CSV
  * data, cross-checked with spark.sql — the "a user of the reference
  * could switch" guarantee. Quoted identifiers with spaces use the
  * graft/reference double-quote form, translated for the Spark SQL
  * oracle (backticks). */
class ReferenceQueriesSpec extends SparkTestBase {

  private val dataDir = "/root/reference/sql_to_ibis/data"

  private lazy val refSession: Graft = {
    val g = Graft(spark)
    val tables = Map(
      "forest_fires" -> s"$dataDir/forestfires.csv",
      "digimon_mon_list" -> s"$dataDir/DigiDB_digimonlist.csv",
      "digimon_move_list" -> s"$dataDir/DigiDB_movelist.csv",
      "avocado" -> s"$dataDir/avocado.csv",
      "time_data" -> s"$dataDir/time_data.csv")
    tables.foreach { case (name, path) =>
      val df = Sources.csvInferred(spark, path)
      g.registerTable(name, df)
      df.createOrReplaceTempView(s"ref_$name")
    }
    g
  }

  /** graft runs the reference's SQL; the oracle runs the same text
    * against spark.sql temp views (renamed, quotes → backticks). */
  private def check(refSql: String): Unit = {
    val oracle = Seq("forest_fires", "digimon_mon_list",
        "digimon_move_list", "avocado", "time_data")
      .foldLeft(refSql)((s, t) => s.replaceAll(s"(?i)\\b$t\\b", s"ref_$t"))
      .replaceAll("\"([^\"]+)\"", "`$1`")
    val actual = refSession.query(refSql)
    val expected = spark.sql(oracle)
    assertSameRows(actual, expected)
  }

  // tests/expression_generation/test_select.py:20
  test("ref: select star")(check("select * from forest_fires"))
  // test_select.py:31
  test("ref: case insensitivity")(check("select * from FOREST_fires"))
  // test_select.py:42
  test("ref: specific fields with alias")(
    check("select temp, RH, wind, rain as water, area from forest_fires"))
  // test_select.py:141,148
  test("ref: table-qualified column")(
    check("select forest_fires.wind from forest_fires"))
  // test_select.py:171 — quoted identifiers with spaces
  test("ref: quoted identifiers")(
    check("""select "Equip Slots", "Lv50 Atk" from digimon_mon_list"""))
  // test_set_ops.py:21
  test("ref: select distinct")(
    check("select distinct area, rain from forest_fires"))
  // test_set_ops.py:39
  test("ref: subquery")(
    check("select * from (select area, rain from forest_fires) rain_area"))
  // test_aggregation.py:29,42,55,68,81
  test("ref: aggregates")(
    check("select avg(temp) as a, sum(temp) as s, max(temp) as mx, " +
      "min(temp) as mn, count(temp) as c from forest_fires"))
  // test_aggregation.py:18
  test("ref: group by two columns")(
    check("select month, day from forest_fires group by month, day"))
  // test_aggregation.py:179
  test("ref: agg with group by and alias")(
    check("select max(power) as power from digimon_move_list group by type"))
  // test_aggregation.py:190 — capitalized function names
  test("ref: capitalized aggregates")(
    check("select MAX(type) as mt, AVG(power) as ap, MiN(power) as mp from DIGImON_move_LiST"))
  // test_aggregation.py:203
  test("ref: aggregate in subquery")(
    check("select * from (select max(power) as mp from digimon_move_list) test"))
  // test_aggregation.py:212
  test("ref: count star")(check("select count(*) as n from forest_fires"))
  // test_aggregation.py:250
  test("ref: count distinct")(
    check("select count(distinct type) as n from digimon_move_list"))
  // test_aggregation.py:237
  test("ref: group by having")(
    check("""select type from digimon_move_list group by type
             having avg(power) > 50"""))
  // test_conditionals.py:18
  test("ref: where clause")(
    check("select * from forest_fires where month = 'mar'"))
  // test_conditionals.py:29 — all boolean ops
  test("ref: boolean ops")(
    check("""select * from forest_fires
             where month = 'mar' and temp > 8.0 and rain >= 0
               and area != 0 or wind > 1 or wind = 8"""))
  // test_conditionals.py:90
  test("ref: having without group by")(
    check("select min(temp) as m from forest_fires having min(temp) > 2"))
  // test_conditionals.py:122
  test("ref: between")(
    check("select temp from forest_fires where wind between 5 and 6"))
  // test_conditionals.py:156
  test("ref: in list")(
    check("select * from forest_fires where day in ('fri', 'sun')"))
  // test_conditionals.py:204
  test("ref: case when with name")(
    check("""select case when wind > 5 then 'strong'
             when wind = 5 then 'mid' else 'weak' end as wind_strength
             from forest_fires"""))
  // test_math.py:18
  test("ref: math precedence")(
    check("select temp, 1 + 2 * 3 - 2 as my_number from forest_fires"))
  // test_math.py:34
  test("ref: column arithmetic")(
    check("select temp * wind + rain / dmc + 37 as x from forest_fires"))
  // test_math.py:52
  test("ref: avocado math")(
    check("select 20 * avocado_id + 3 / 20 as my_math from avocado"))
  // test_typing.py:19 — the reference's pandas-style typenames
  // (int64/float64, sql.lark:87-106) aren't Spark SQL typenames, so
  // the oracle is written with Spark equivalents
  test("ref: casts") {
    assertSameRows(
      refSession.query(
        "select cast(temp as int64) as t, cast(RH as float64) as my_rh from forest_fires"),
      spark.sql(
        "select cast(temp as bigint) as t, cast(RH as double) as my_rh from ref_forest_fires"))
  }
  // test_functions.py:10
  test("ref: coalesce")(
    check("select coalesce(wind, rain, 2) as my_number from forest_fires"))
  // test_ranking_and_ordering.py:18
  test("ref: rank over order by")(
    check("""select wind, rank() over (order by wind) as wind_rank
             from forest_fires"""))
  // test_ranking_and_ordering.py:110
  test("ref: rank over partition by")(
    check("""select month, day, rank() over (partition by day order by wind) as rk
             from forest_fires"""))
  // test_ranking_and_ordering.py:364
  test("ref: order by desc limit")(
    check("select temp from forest_fires order by temp desc, wind, rain, area limit 10"))
  // test_set_ops.py:53/78 — union flavors
  test("ref: union")(
    check("""select temp from forest_fires where wind > 8
             union select temp from forest_fires where wind < 1"""))
  // test_expression_execution.py:11 — join
  test("ref: join digimon tables")(
    check("""select digimon_mon_list.attribute, count(*) as n
             from digimon_mon_list
             join digimon_move_list
               on digimon_mon_list.attribute = digimon_move_list.attribute
             group by digimon_mon_list.attribute"""))
  // test_set_ops.py:494
  test("ref: limit")(
    check("select * from forest_fires order by temp, wind, RH, DMC, DC limit 10"))

  // test_set_ops.py:388 — aliased parenthesized join of two subqueries
  test("ref: joining two subqueries with overlapping columns") {
    check("""select * from
             ((select type, attribute, power from digimon_move_list) table1
              join
              (select type, attribute, digimon from digimon_mon_list) table2
              on table1.type = table2.type) sub""")
  }

  // test_expression_execution.py:32 — unaliased aggs + selected keys
  test("ref: group by with selected keys and unaliased aggs") {
    check("""select day, month, min(temp) as mn, max(temp) as mx
             from forest_fires group by day, month""")
  }

  // test_expression_execution.py:49 — group keys NOT in the projection
  test("ref: group by keys not selected") {
    check("select min(temp) as mn, max(temp) as mx from forest_fires group by day, month")
  }

  // test_expression_execution.py:73 — implicit self cross join
  test("ref: implicit multi-table FROM is a cross join") {
    check("""select table1.temp, table2.wind from forest_fires table1, forest_fires table2
             where table1.temp > 30 and table2.wind > 8""")
  }

  // parsing/aggregation_aliases.py — mean/minimum/maximum spellings
  test("ref: aggregate spelling aliases") {
    assertSameRows(
      refSession.query(
        "select mean(temp) as a, minimum(temp) as mn, maximum(temp) as mx from forest_fires"),
      spark.sql(
        "select avg(temp) as a, min(temp) as mn, max(temp) as mx from ref_forest_fires"))
  }
}
