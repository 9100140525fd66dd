package graft.sql

import graft.SparkTestBase

/** Round-5 UNNEST (SURVEY §2.1 row 36ai): DuckDB-style select-position
  * unnest lowered to explode, plus the string_split literal-separator
  * mapping. */
class UnnestSpec extends SparkTestBase {

  test("unnest explodes one row per array element") {
    checkTranslated(
      """select doc_id, unnest(string_split(lower(text), ' ')) as tok
         from documents where doc_id < 10""",
      """select doc_id, explode(split(lower(text), ' ')) as tok
         from documents where doc_id < 10""")
  }

  test("unnest output feeds ORDER BY / LIMIT and DISTINCT") {
    checkTranslated(
      """select distinct unnest(string_split(lower(text), ' ')) as tok
         from documents where doc_id < 5""",
      """select distinct explode(split(lower(text), ' ')) as tok
         from documents where doc_id < 5""")
  }

  test("empty and NULL arrays produce zero rows") {
    checkTranslated(
      """select doc_id,
           unnest(case when doc_id % 2 = 0
                       then string_split(text, ' ') end) as tok
         from documents where doc_id < 10""",
      """select doc_id,
           explode(case when doc_id % 2 = 0
                        then split(text, ' ') end) as tok
         from documents where doc_id < 10""")
  }

  test("unsupported unnest positions fail loudly") {
    // in WHERE
    val e1 = intercept[RuntimeException](graftSession.query(
      "select doc_id from documents where unnest(string_split(text, ' ')) = 'x'"))
    assert(e1.getMessage.contains("unnest"))
    // nested inside an expression
    val e2 = intercept[RuntimeException](graftSession.query(
      "select length(unnest(string_split(text, ' '))) from documents"))
    assert(e2.getMessage.contains("top-level"))
    // two unnests
    val e3 = intercept[RuntimeException](graftSession.query(
      """select unnest(string_split(text, ' ')) as a,
           unnest(string_split(text, '.')) as b from documents"""))
    assert(e3.getMessage.contains("at most one"))
    // in an aggregating query
    val e4 = intercept[RuntimeException](graftSession.query(
      "select count(unnest(string_split(text, ' '))) from documents"))
    assert(e4.getMessage.contains("unnest"))
  }

  test("string_split requires a literal separator") {
    val e = intercept[RuntimeException](graftSession.query(
      "select string_split(text, text) from documents"))
    assert(e.getMessage.contains("literal"))
  }
}
