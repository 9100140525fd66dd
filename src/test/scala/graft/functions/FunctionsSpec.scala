package graft.functions

import graft.{SparkTestBase, TestSpark}

/** Specs for graft's native Catalyst expressions. */
class FunctionsSpec extends SparkTestBase {

  private def emb = {
    GraftFunctions.register(spark)
    spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
  }

  test("graft_dot is bit-identical to the HOF formulation") {
    val both = emb.selectExpr(
      "graft_dot(embedding, embedding) as a",
      """aggregate(zip_with(embedding, embedding,
           (x, y) -> cast(x as double) * cast(y as double)),
         cast(0 as double), (acc, v) -> acc + v) as b""")
    assert(both.filter("a <> b").count() == 0)
  }

  test("graft_dot works with a literal double array (hyperplane form)") {
    val r = emb.limit(1).selectExpr(
      "graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) as d").collect()
    assert(r.head.getDouble(0) == 11.0)
  }

  test("graft_dot mixed float/double and truncation to shorter array") {
    val r = spark.sql(
      "select graft_dot(array(cast(2.0 as float), cast(3.0 as float)), array(10.0D)) as d")
    assert(r.collect().head.getDouble(0) == 20.0)
  }

  test("graft_dot rejects non-numeric arrays at analysis") {
    assertThrows[Throwable](
      spark.sql("select graft_dot(array('a'), array('b'))").collect())
  }

  test("GraftExtensions registers functions at session build time") {
    import org.apache.spark.sql.SparkSession
    // reuse the shared SparkContext but build a brand-new session so
    // withExtensions actually applies
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("select graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) as d")
        .collect()
      assert(r.head.getDouble(0) == 11.0)
      assert(s2 ne prev, "a new session should have been created")
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
