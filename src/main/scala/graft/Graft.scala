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
  // MERGE INTO (r7b): the statement spelling of the keyed-upsert /
  // keyed-delete maintenance shapes (SURVEY row 94). Whole-row forms
  // only (UPDATE SET * / INSERT *) — the Delta/DuckDB-style upsert
  // contract; column-level SET lists are not a lazy-view operation.
  private val MergeRe =
    ("""(?is)^\s*merge\s+into\s+(?:"([^"]+)"|([a-zA-Z_][a-zA-Z0-9_]*))""" +
     """\s+using\s+(?:"([^"]+)"|([a-zA-Z_][a-zA-Z0-9_]*))\s+on\s+(.*?)""" +
     """((?:\s+when\s+(?:not\s+)?matched\s+then\s+[^;]+)+)\s*;?\s*$""").r
  private val WhenClauseRe =
    """(?is)when\s+(not\s+)?matched\s+then\s+(update\s+set\s+\*|insert\s+\*|delete)""".r

  private def fail(msg: String): Nothing = throw new RuntimeException(msg)

  // DML statements (r7b): the registry is a map of LAZY plans, so
  // INSERT/UPDATE/DELETE re-register a composed plan — the same
  // semantics as MERGE (nothing materializes; reads after the
  // statement see the new plan). Expressions parse through the graft
  // dialect by rewriting into a SELECT over the target.
  private val InsertRe =
    ("""(?is)^\s*insert\s+into\s+(?:"([^"]+)"|([a-zA-Z_][a-zA-Z0-9_]*))""" +
     """\s+(select\s+.*|values\s*\(.*|with\s+.*)\s*;?\s*$""").r
  private val DeleteRe =
    ("""(?is)^\s*delete\s+from\s+(?:"([^"]+)"|([a-zA-Z_][a-zA-Z0-9_]*))""" +
     """\s+where\s+(.*?)\s*;?\s*$""").r
  private val UpdateRe =
    ("""(?is)^\s*update\s+(?:"([^"]+)"|([a-zA-Z_][a-zA-Z0-9_]*))""" +
     """\s+set\s+(.*?)(?:\s+where\s+(.*?))?\s*;?\s*$""").r

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
    case InsertRe(q, b, body) =>
      val name = Option(q).getOrElse(b)
      lookup(name) // loud on unknown target
      // INSERT is positional (standard): UNION ALL carries the new
      // rows — arity/type mismatches fail at analysis, loudly
      val src =
        if (body.trim.toLowerCase.startsWith("values"))
          s"select * from ($body) __ins"
        else body
      registerTable(name,
        translateOnly(s"select * from $name union all $src"))
      status("inserted", name.toLowerCase)
    case DeleteRe(q, b, pred) =>
      val name = Option(q).getOrElse(b)
      lookup(name)
      // rows where the predicate is TRUE are deleted; NULL keeps
      // (the standard's 3VL) — and the WHERE path brings the whole
      // dialect (subqueries included) for free
      registerTable(name, translateOnly(
        s"select * from $name where not coalesce(($pred), false)"))
      status("deleted", name.toLowerCase)
    case UpdateRe(q, b, setList, predOrNull) =>
      val name = Option(q).getOrElse(b)
      val target = lookup(name)
      val assigns: Map[String, String] =
        splitTop(setList, ',').map { a =>
          val i = a.indexOf('=')
          if (i < 0) fail(s"UPDATE SET expects col = expr, got: $a")
          val col = a.substring(0, i).trim.stripPrefix("\"").stripSuffix("\"")
          val matched = target.columns.find(_.equalsIgnoreCase(col))
            .getOrElse(fail(s"UPDATE: column '$col' not in $name"))
          matched.toLowerCase -> a.substring(i + 1).trim
        }.toMap
      val pred = Option(predOrNull)
      val items = target.columns.map { c =>
        assigns.get(c.toLowerCase) match {
          case Some(e) => pred match {
            case Some(p) => s"""case when ($p) then ($e) else "$c" end as "$c""""
            case None    => s"""($e) as "$c""""
          }
          case None => s""""$c""""
        }
      }
      registerTable(name,
        translateOnly(s"select ${items.mkString(", ")} from $name"))
      status("updated", name.toLowerCase)
    case MergeRe(tq, tb, sq, sb, onCond, whenBlock) =>
      import org.apache.spark.sql.{functions => F}
      val tName = Option(tq).getOrElse(tb)
      val sName = Option(sq).getOrElse(sb)
      val target = lookup(tName); val source = lookup(sName)
      // ON must be equality conjuncts on SAME-NAMED key columns
      // (t.k = s.k) — the keyed-maintenance contract; anything else
      // is loud
      val keys = onCond.split("(?i)\\s+and\\s+").toSeq.map { c =>
        val m = """(?is)^\s*(?:(\w+)\.)?(\w+)\s*=\s*(?:(\w+)\.)?(\w+)\s*$"""
          .r.findFirstMatchIn(c).getOrElse(fail(
            s"MERGE ON supports same-named key equalities only, got: $c"))
        if (!m.group(2).equalsIgnoreCase(m.group(4)))
          fail("MERGE ON supports same-named key equalities only " +
            s"(got ${m.group(2)} = ${m.group(4)})")
        m.group(2).toLowerCase
      }
      val clauses = WhenClauseRe.findAllMatchIn(whenBlock).map { m =>
        val not = m.group(1) != null
        val act = m.group(2).toLowerCase.replaceAll("\\s+", " ")
        (not, act)
      }.toSeq
      if (clauses.isEmpty)
        fail("MERGE supports whole-row WHEN forms only: WHEN MATCHED " +
          "THEN UPDATE SET * / DELETE, WHEN NOT MATCHED THEN INSERT *")
      clauses.foreach {
        case (false, a) if a.startsWith("update") || a == "delete" => ()
        case (true, a) if a.startsWith("insert") => ()
        case (not, a) => fail(s"MERGE: WHEN ${if (not) "NOT " else ""}" +
          s"MATCHED cannot $a")
      }
      val doUpdate = clauses.exists(c => !c._1 && c._2.startsWith("update"))
      val doDelete = clauses.exists(c => !c._1 && c._2 == "delete")
      val doInsert = clauses.exists(c => c._1 && c._2.startsWith("insert"))
      if (doUpdate && doDelete)
        fail("MERGE: UPDATE SET * and DELETE cannot both apply to " +
          "matched rows (whole-row forms)")
      if (doUpdate || doInsert) {
        val sameCols = target.columns.map(_.toLowerCase).sorted
          .sameElements(source.columns.map(_.toLowerCase).sorted)
        if (!sameCols) fail("MERGE UPDATE SET * / INSERT * require " +
          "matching target/source schemas")
      }
      val srcKeys = source.select(keys.map(F.col): _*).distinct()
      // untouched target rows survive every form; the clause mix
      // decides what replaces / joins them — each path is one
      // key-shuffled semi/anti join plus a name-matched union, the
      // SURVEY row-94 plan shape (nothing rewrites the remainder)
      val kept =
        if (doUpdate || doDelete)
          target.join(srcKeys, keys, "left_anti")
        else target
      val replaced =
        if (doUpdate) {
          if (doInsert) source // matched AND new source rows land
          else source.join(
            target.select(keys.map(F.col): _*).distinct(), keys, "left_semi")
        } else if (doInsert)
          source.join(
            target.select(keys.map(F.col): _*).distinct(), keys, "left_anti")
        else null
      val merged =
        if (replaced == null) kept else kept.unionByName(replaced)
      registerTable(tName, merged)
      status("merged", tName.toLowerCase)
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

  /** Splits on `sep` at paren-depth 0 outside string literals —
    * assignment lists may carry commas inside function calls. */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]; val sb = new StringBuilder
    var depth = 0; var inStr = false
    s.foreach { ch =>
      if (inStr) { sb += ch; if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => inStr = true; sb += ch
        case '(' => depth += 1; sb += ch
        case ')' => depth -= 1; sb += ch
        case c if c == sep && depth == 0 =>
          out += sb.toString; sb.clear()
        case c => sb += c
      }
    }
    out += sb.toString
    out.result()
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
