package graft.sql

import graft.{Graft, SparkTestBase}

/** Error behavior parity with the reference
  * (/root/reference/sql_to_ibis/tests/test_errors.py): invalid query
  * text, unknown tables, unknown columns all raise immediately at
  * translation time — not lazily at execution. */
class ErrorsSpec extends SparkTestBase {

  test("unknown table raises TableNotFoundException") {
    val g = Graft(spark)
    val e = intercept[RuntimeException](g.query("select * from missing_table"))
    assert(e.getMessage.contains("missing_table"))
  }

  test("syntactically invalid queries raise a parse error") {
    Seq(
      "select from nation",          // missing select list
      "select n_name nation",        // missing FROM
      "select n_name from",          // missing table
      "select n_name from nation where", // dangling WHERE
      "totally not sql",
      "select n_name from nation group by", // dangling GROUP BY
    ).foreach { sql =>
      assertThrows[RuntimeException](graftSession.query(sql))
    }
  }

  test("unknown column raises at translation, not at action") {
    assertThrows[Throwable](
      graftSession.query("select does_not_exist from nation"))
  }

  test("ambiguous bare column across joined tables raises") {
    // both sides expose n_name
    assertThrows[Throwable](
      graftSession.query(
        "select n_name from nation t1 cross join nation t2"))
  }
}
