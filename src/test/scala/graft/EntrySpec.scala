package graft

/** Mirrors the driver's t1 smoke: the flagship entry query must
  * produce rows. */
class EntrySpec extends SparkTestBase {
  test("flagship entry query returns rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    // TPC-H Q1 shape: grouped by (returnflag, linestatus), ordered
    assert(rows.head.schema.fieldNames.contains("sum_qty"))
  }

  test("every oracle key has a queries entry") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("explain returns the formatted physical plan without executing") {
    val plan = graftSession.explain(
      "select l_orderkey from lineitem where l_quantity > 45")
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("Scan parquet"), plan.take(500))
  }
}
