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

  // ---- FROM-position unnest (r5b, PostgreSQL/DuckDB form) ---------

  test("from-position unnest explodes with comma and CROSS JOIN spellings") {
    val oracle =
      """select doc_id, tok from documents
         lateral view explode(split(lower(text), ' ')) t as tok
         where doc_id < 10"""
    checkTranslated(
      """select doc_id, t.tok
         from documents, unnest(string_split(lower(text), ' ')) as t(tok)
         where doc_id < 10""", oracle)
    checkTranslated(
      """select doc_id, tok
         from documents cross join unnest(string_split(lower(text), ' ')) as t(tok)
         where doc_id < 10""", oracle)
  }

  test("with ordinality numbers elements from 1") {
    checkTranslated(
      """select doc_id, t.tok, t.ord
         from documents, unnest(string_split(lower(text), ' '))
              with ordinality as t(tok, ord)
         where doc_id < 10""",
      """select doc_id, tok, p + 1 as ord from documents
         lateral view posexplode(split(lower(text), ' ')) t as p, tok
         where doc_id < 10""")
  }

  test("left join unnest keeps rows whose array is NULL") {
    checkTranslated(
      """select doc_id, t.tok
         from documents
         left join unnest(case when doc_id % 2 = 0
                               then string_split(lower(text), ' ') end)
           as t(tok) on true
         where doc_id < 10""",
      """select doc_id, tok from documents
         lateral view outer explode(case when doc_id % 2 = 0
                                         then split(lower(text), ' ') end) t as tok
         where doc_id < 10""")
  }

  test("sole-relation unnest and default column names") {
    checkTranslated(
      "select x from unnest(string_split('a b c', ' ')) as t(x)",
      "select explode(split('a b c', ' ')) as x")
    // no column list: the column takes the alias name; no alias: "unnest"
    checkTranslated(
      "select t from unnest(string_split('a b', ' ')) as t",
      "select explode(split('a b', ' ')) as t")
  }

  test("from-position unnest composes with aggregation") {
    checkTranslated(
      """select t.tok, count(*) as n
         from documents, unnest(string_split(lower(text), ' ')) as t(tok)
         where doc_id < 20 group by t.tok""",
      """select tok, count(*) as n from documents
         lateral view explode(split(lower(text), ' ')) t as tok
         where doc_id < 20 group by tok""")
  }

  // ---- parallel select-position unnests zip (r5b, DuckDB) ---------

  test("parallel unnests zip to the longest array with NULL padding") {
    // words vs sentence-ish splits have different lengths per doc
    checkTranslated(
      """select doc_id,
           unnest(string_split(lower(text), ' ')) as tok,
           unnest(string_split(lower(text), 'a')) as frag
         from documents where doc_id < 10""",
      """select doc_id,
           try_element_at(w, i) as tok, try_element_at(f, i) as frag
         from (select doc_id, split(lower(text), ' ') as w,
                      split(lower(text), 'a') as f
               from documents where doc_id < 10)
         lateral view explode(sequence(1,
           greatest(coalesce(size(w), 0), coalesce(size(f), 0)))) t as i""")
  }

  test("a NULL array zips as all-NULL against a populated one") {
    checkTranslated(
      """select doc_id,
           unnest(case when doc_id % 2 = 0
                       then string_split(lower(text), ' ') end) as a,
           unnest(string_split(lower(text), ' ')) as b
         from documents where doc_id < 6""",
      """select doc_id,
           case when doc_id % 2 = 0 then tok end as a, tok as b
         from documents
         lateral view explode(split(lower(text), ' ')) t as tok
         where doc_id < 6""")
  }

  test("from-position unnest column-list arity errors are loud") {
    val e = intercept[RuntimeException](graftSession.query(
      """select 1 from documents,
         unnest(string_split(text, ' ')) as t(a, b)"""))
    assert(e.getMessage.contains("column list"))
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
