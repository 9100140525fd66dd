package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries ns timestamps (TESTDATA.md); Spark has
      // no ns type — read as long nanos and convert explicitly.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Shared fixture: a Graft session over the sf0.001 testdata, plus the
  * same tables registered as Spark temp views so specs can use
  * `spark.sql` as a semantics oracle (the driver separately
  * cross-checks against DuckDB). */
abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  lazy val graftSession: Graft = {
    val g = Graft.forDir(spark, TestSpark.sfDir)
    g.tableNames.foreach { t =>
      spark.read.parquet(s"${TestSpark.sfDir}/$t.parquet")
        .createOrReplaceTempView(t)
    }
    g
  }

  /** Row-set equality ignoring order; values rendered to strings with
    * numeric rounding to absorb float noise. */
  def assertSameRows(actual: DataFrame, expected: DataFrame): Unit = {
    def canon(df: DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map {
        case d: Double => f"$d%.6f"
        case f: Float  => f"$f%.4f"
        case b: java.math.BigDecimal => f"${b.doubleValue()}%.6f"
        case null => "NULL"
        case x => x.toString
      }.mkString("|")).toSeq.sorted
    val a = canon(actual)
    val e = canon(expected)
    assert(a == e,
      s"\nactual (${a.size} rows):\n${a.take(10).mkString("\n")}\n" +
      s"expected (${e.size} rows):\n${e.take(10).mkString("\n")}")
  }

  /** Graft result must match spark.sql on the same SQL text. */
  def checkAgainstSparkSql(sql: String): Unit =
    assertSameRows(graftSession.query(sql), spark.sql(sql))

  /** Graft result for `graftSql` must match spark.sql of `oracle`. */
  def checkTranslated(graftSql: String, oracle: String): Unit =
    assertSameRows(graftSession.query(graftSql), spark.sql(oracle))
}
