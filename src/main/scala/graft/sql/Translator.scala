package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.expressions.{Window, WindowSpec => SparkWindow}
import org.apache.spark.sql.types._
import Ast._

/** Lowers the graft AST to Spark DataFrame operations.
  *
  * The analogue of the reference's SQLTransformer
  * (/root/reference/sql_to_ibis/parsing/sql_parser.py): where that code
  * emits an unexecuted Ibis expression, this emits an unexecuted Spark
  * logical plan — Catalyst then performs predicate pushdown, column
  * pruning, join selection, partial aggregation and AQE on it. No
  * execution happens at translation time; no RDDs, no UDFs.
  */
final class Translator(catalog: String => DataFrame,
                       session: SparkSession) {

  final case class TranslateException(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw TranslateException(msg)

  /** Aliases of FROM-position unnests (r5b): their single column is a
    * plain (unqualified) attribute of the exploded frame, so refs
    * qualified by the unnest alias (`u.x`) resolve by DROPPING the
    * qualifier. Registered when the UnnestRel translates — relations
    * lower before the expressions that reference them. */
  private var flatAliases: Set[String] = Set.empty

  /** In-scope lambda parameter bindings (r7b) — consulted by
    * unqualified ColRef lowering before real columns (params shadow
    * columns, the DuckDB/Spark lambda scoping rule). Saved/restored
    * around each body lowering, so nesting shadows correctly. */
  private var lambdaEnv: Map[String, Column] = Map.empty

  def translate(e: SetExpr): DataFrame = e match {
    case Leaf(q) => translateQuery(q)
    case OrderedSet(body, orderBy, limit, offset, ties) =>
      applyOrderLimit(translate(body), orderBy, limit, offset, ties)
    case WithQuery(ctes, body, recursive, cteCols) =>
      // resolve each CTE against the catalog extended with the CTEs
      // defined before it; the body sees all of them. Case-insensitive
      // like table registration.
      val scope = scala.collection.mutable.Map.empty[String, DataFrame]
      val scopedCatalog: String => DataFrame =
        name => scope.getOrElse(name.toLowerCase, catalog(name))
      val inner = new Translator(scopedCatalog, session)
      ctes.zipWithIndex.foreach { case ((name, sub), i) =>
        val cols = cteCols.lift(i).flatten
        val df = sub match {
          case SetOp(op @ ("union" | "union_all"), base, step)
              if recursive && referencesTable(step, name) =>
            translateRecursiveCte(name, op == "union_all", base, step,
              cols, inner, scope)
          case _ =>
            // without RECURSIVE, the CTE's own name inside its body
            // resolves to the OUTER catalog (standard shadowing:
            // `with t as (select * from t where ...)` filters the
            // base table) — scope only gains the name afterwards
            val d = inner.translate(sub)
            cols.map(cs => d.toDF(cs: _*)).getOrElse(d)
        }
        scope(name.toLowerCase) = df
      }
      inner.translate(body)
    case SetOp(op, l, r) =>
      val lf = translate(l); val rf = translate(r)
      op match {
        case "union"      => lf.union(rf).distinct()
        case "union_all"  => lf.union(rf)
        // BY NAME (r5b): name-matched union, missing columns NULL
        // (DuckDB semantics = Spark's allowMissingColumns)
        case "union_byname" =>
          lf.unionByName(rf, allowMissingColumns = true).distinct()
        case "union_all_byname" =>
          lf.unionByName(rf, allowMissingColumns = true)
        case "intersect"  => lf.intersect(rf)
        case "intersect_all" => lf.intersectAll(rf)
        case "except"     => lf.except(rf)
        case "except_all" => lf.exceptAll(rf)
        case other        => fail(s"unknown set op $other")
      }
  }

  /** WITH RECURSIVE (r5): standard SQL fixpoint iteration, the same
    * driver-side loop shape as `Dedup.connectedComponents` (the Pregel
    * pattern — Spark has no native recursion). Each round re-binds the
    * CTE name to the PREVIOUS round's new rows (the standard "working
    * table"), translates the step against it, and eagerly
    * `localCheckpoint`s the round so lineage stays flat; UNION
    * deduplicates against everything seen, UNION ALL appends. The
    * iteration cap raises loudly (non-converging recursions must not
    * spin), and per-round work shuffles only the step's own keys —
    * the 100 TB posture is identical to connectedComponents
    * (executor-local checkpoint blocks; long jobs would add a
    * reliable checkpointDir, Dedup.scala documents the trade). */
  private def translateRecursiveCte(name: String, all: Boolean,
      base: SetExpr, step: SetExpr, cols: Option[Seq[String]],
      inner: Translator,
      scope: scala.collection.mutable.Map[String, DataFrame]): DataFrame = {
    val maxIters = 200
    var base0 = inner.translate(base)
    cols.foreach(cs => base0 = base0.toDF(cs: _*))
    if (!all) base0 = base0.distinct()
    // UNION (distinct) dedup cost (r6) — two tiers, switched on the
    // accumulated row count:
    //
    // SMALL closures (the common graph-toy tier, below
    // spark.graft.recursive.keyedDedupRows, default 4M): plain
    // `fresh.except(accumulated)` — at this size the whole closure
    // re-shuffles in one cheap stage and anything cleverer just adds
    // per-round stages (the keyed tier measured 5× slower on an
    // 11-round toy).
    //
    // LARGE closures: the accumulated rows live as individually
    // checkpointed BLOCKS, each carrying a 64-bit full-row hash key
    // and hash-partitioned ON it (the checkpoint preserves the
    // partitioning in the LogicalRDD). A round then runs the
    // hash-prefilter shape (same pattern as
    // Dedup.bloomIncrementalDedup): per block, a LEFT SEMI join on
    // the row-hash key alone selects the seen rows colliding with
    // the frontier — single-key equi-join, co-partitioned against
    // the block's advertised partitioning, so the seen side is
    // SCANNED but never re-shuffled and the output is
    // frontier-bounded — then ONE exact full-row `except` against
    // that small union verifies precisely (collisions cost extra
    // comparisons, never correctness: an equal row shares its hash
    // by construction). Per-round SHUFFLE work is bounded by the
    // frontier however large the closure. (A single anti-join with
    // the row comparison as a residual would be simpler, but
    // Catalyst extracts every a.c <=> b.c conjunct into the join
    // keys — SimplifyConditionalsInPredicate undoes any disguise —
    // widening the required clustering past the blocks'
    // partitioning.) Crossing the threshold re-keys the existing
    // blocks once; every 8 rounds blocks consolidate into one so the
    // chain, and the scan fan-out, stay short.
    val RK = "__graft_rck"
    val NK = "__graft_rcnew"
    for (r <- Seq(RK, NK))
      if (base0.columns.exists(_.equalsIgnoreCase(r)))
        fail(s"recursive CTE columns may not use the reserved name $r")
    val outCols = base0.columns.toSeq
    val sess = base0.sparkSession
    val keyedThreshold = sess.conf
      .get("spark.graft.recursive.keyedDedupRows", "4000000").toLong
    val tinyRows = sess.conf
      .get("spark.graft.recursive.tinyCoalesceRows", "100000").toLong
    val unrollK = sess.conf
      .get("spark.graft.recursive.unrollRounds", "6").toInt.max(1)
    def withKey(df: DataFrame): DataFrame =
      df.withColumn(RK, F.xxhash64(outCols.map(F.col): _*))
    // EXPLICIT partition count: an expression-only repartition lets
    // AQE coalesce each block to a different count, breaking the
    // cross-round co-partitioning the keyed tier exists for.
    // Non-numeric settings (some platforms use "auto") fall back to
    // the context's parallelism instead of throwing mid-query.
    val nPart =
      try sess.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case _: NumberFormatException =>
        sess.sparkContext.defaultParallelism }
    def partByKey(df: DataFrame): DataFrame =
      df.repartition(nPart, F.col(RK))
    // keyed blocks must ADVERTISE their partitioning after the
    // checkpoint, or every later semi re-shuffles them. Under AQE
    // the adaptive plan reports UnknownPartitioning at checkpoint
    // time (observed: ENSURE_REQUIREMENTS exchanges over every block
    // scan), so keyed-block materialization briefly disables AQE —
    // the non-adaptive plan's top exchange partitioning flows into
    // the LogicalRDD and RDDScanExec re-advertises it.
    // The AQE toggle is session-global mutable state: serialize plan
    // compilation against concurrent queries on the same session
    // (otherwise another query can compile while adaptive=false, or
    // two recursions interleave and restore a stale prior value).
    // `eager = false` marks the RDD and captures the non-adaptive
    // partitioning in the LogicalRDD at compile time; the caller's
    // next action (the per-round count below) materializes it — one
    // job instead of two.
    def ckptPartitioned(df: DataFrame, eager: Boolean = true): DataFrame =
      sess.synchronized {
        val prior = sess.conf.get("spark.sql.adaptive.enabled", "true")
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        try df.localCheckpoint(eager)
        finally sess.conf.set("spark.sql.adaptive.enabled", prior)
      }
    var keyed = false
    // lazy checkpoint: the count() doubles as the materializing
    // action, folding r6's "eager checkpoint job + count job (+
    // initial isEmpty job)" into one job per round — the whole r6
    // q_recursive_union regression was this per-round job floor
    var blocks = List(base0.localCheckpoint(false))
    val baseRows = blocks.head.count()
    var seenRows = if (all) 0L else baseRows
    def workingOf(b: DataFrame): DataFrame = if (keyed) b.drop(RK) else b
    var working = blocks.head
    var iter = 0
    var done = baseRows == 0
    // one-time transition to the keyed tier: re-key and re-partition
    // the seen blocks (one O(seen) pass, amortized over every later
    // frontier-bounded round)
    def maybeKey(): Unit =
      if (!all && !keyed && seenRows > keyedThreshold) {
        blocks = blocks.map(b => ckptPartitioned(partByKey(withKey(b))))
        keyed = true
      }
    while (!done) {
      if (iter >= maxIters)
        fail(s"WITH RECURSIVE '$name' exceeded $maxIters iterations " +
          "without converging")
      if (!keyed && seenRows < tinyRows) {
        // TINY closures (graph-toy tier, r7): the per-round cost at
        // this size is DRIVER work, not data — each round pays
        // analysis + optimization + physical planning + an action
        // (~100 ms measured vs ~25 ms of in-job time). UNROLL k
        // rounds into ONE lazily-composed plan: sub-round frontiers
        // feed the next sub-round with NO intra-block dedup (dedup
        // only changes WORK, never the result set — duplicate and
        // already-seen rows re-walk within the block and collapse at
        // the block-end dedup; each r_i is referenced once by
        // r_{i+1} and once by the block tail, so redundancy is
        // O(k²) per block, fine at ≤tinyRows). One compile + one
        // single-task shuffle-free job per block instead of k.
        // Block-end dedup tags seen 0 / fresh 1 and keeps min-tag=1
        // groups (grouping and EXCEPT both treat NULLs as equal);
        // counting the raw checkpointed RDD (toRdd.count) skips a
        // per-block Aggregate compile, and "total unchanged" is the
        // convergence test. Measured: q_recursive_union 1.35 s →
        // 0.7 s (11 rounds, sf0.1 bench settings).
        val k = math.min(unrollK.toLong, maxIters.toLong - iter).toInt.max(1)
        var frontier = working
        var rs = Vector.empty[DataFrame]
        for (_ <- 1 to k) {
          scope(name.toLowerCase) = frontier
          val r = inner.translate(step).toDF(outCols: _*)
          rs :+= r
          frontier = r
        }
        iter += k
        val outFCols = outCols.map(F.col)
        if (!all) {
          val tagged = blocks.reduce(_ union _)
            .select(outFCols :+ F.lit(0).as(NK): _*)
            .union(rs.map(_.select(outFCols :+ F.lit(1).as(NK): _*))
              .reduce(_ union _))
            .coalesce(1)
          val newSeen = tagged.groupBy(outFCols: _*)
            .agg(F.min(NK).as(NK)).localCheckpoint(false)
          val total = newSeen.queryExecution.toRdd.count()
          if (total == seenRows) done = true
          else {
            seenRows = total
            blocks = List(newSeen.drop(NK))
            // every new row steps in the NEXT block (rows found in
            // early sub-rounds re-step redundantly; their successors
            // are already seen and collapse)
            working = newSeen.where(F.col(NK) === 1).drop(NK)
            maybeKey()
          }
        } else {
          // UNION ALL keeps every row; the round index tag recovers
          // the block's LAST frontier for the next block
          val block = rs.zipWithIndex.map { case (r, j) =>
              r.select(outFCols :+ F.lit(j).as(NK): _*) }
            .reduce(_ union _).coalesce(1).localCheckpoint(false)
          val n = block.queryExecution.toRdd.count()
          if (n == 0) done = true
          else {
            seenRows += n
            blocks = blocks :+ block.drop(NK)
            working = block.where(F.col(NK) === (k - 1)).drop(NK)
            if (blocks.size >= 8)
              blocks = List(blocks.reduce(_ union _).localCheckpoint(false))
          }
        }
      } else {
        iter += 1
        scope(name.toLowerCase) = working
        var next = inner.translate(step).toDF(outCols: _*)
        if (!all) {
          if (!keyed) {
            // EXCEPT already deduplicates (ReplaceExceptWithAntiJoin
            // plans Distinct over the anti-join) — an explicit
            // .distinct() here would add a redundant exchange per round
            next = next.except(blocks.reduce(_ union _))
              .localCheckpoint(false)
          } else {
            // one plan per round: Spark reuses the fresh exchange
            // across the per-block semis and the except
            val fresh = partByKey(withKey(next.distinct()))
            val freshKeys = fresh.select(RK)
            val seenSub = blocks.map(b =>
                b.alias("__rb").join(freshKeys.alias("__ra"),
                  F.col(s"__rb.$RK") === F.col(s"__ra.$RK"), "left_semi"))
              .reduce(_ union _)
            next = ckptPartitioned(partByKey(fresh.except(seenSub)),
              eager = false)
          }
        } else next = next.localCheckpoint(false)
        // ONE action per round: count() materializes the lazy
        // checkpoint and reports the frontier size (the round must be
        // fully materialized either way — it feeds the next step's
        // translation and the final union)
        val newRows = next.count()
        if (newRows == 0) done = true
        else {
          blocks = blocks :+ next
          seenRows += newRows
          maybeKey()
          // consolidation keeps the block chain (and the result plan)
          // short; the keyed tier re-establishes its partitioning. The
          // small tier consolidates lazily — the next round's except
          // scan materializes it, no dedicated job
          if (iter % 8 == 0)
            blocks = List(
              if (keyed) ckptPartitioned(partByKey(blocks.reduce(_ union _)))
              else blocks.reduce(_ union _).localCheckpoint(false))
          working = workingOf(next)
        }
      }
    }
    val out = blocks.reduce(_ union _)
    if (keyed) out.drop(RK) else out
  }

  /** True when any FROM tree inside `se` references table `name`
    * (case-insensitive). Subqueries in EXPRESSION position are not
    * scanned — referencing the recursive CTE from one is unsupported
    * (as in most engines) and fails at resolution instead. */
  private def referencesTable(se: SetExpr, name: String): Boolean = {
    def inRel(r: Relation): Boolean = r match {
      case TableRef(n, _) => n.equalsIgnoreCase(name)
      case TableFnRel(_, _, _, _) => false
      // table macros expand before translation; only the builtin
      // series generators survive here, and they scan no tables
      case MacroCallRel(_, _, _) => false
      case SubqueryRel(q, _) => inSet(q)
      case ValuesRel(_, _, _) => false
      case JoinRel(l, r2, _, _) => inRel(l) || inRel(r2)
      case PositionalJoinRel(l, r2) => inRel(l) || inRel(r2)
      case AsofJoinRel(l, r2, _, _) => inRel(l) || inRel(r2)
      case UsingJoinRel(l, r2, _, _) => inRel(l) || inRel(r2)
      case NaturalJoinRel(l, r2, _) => inRel(l) || inRel(r2)
      case PivotRel(rel, _, _, _) => inRel(rel)
      case UnpivotRel(rel, _, _, _) => inRel(rel)
      case LateralRel(l2, s2, _, _) => inRel(l2) || inSet(s2)
      case UnnestRel(l2, _, _, _, _, _) => l2.exists(inRel)
      case SampleRel(r2, _, _) => inRel(r2)
      case AliasedRel(rel, _) => inRel(rel)
    }
    def inSet(s: SetExpr): Boolean = s match {
      case Leaf(q) => inRel(q.sel.from)
      case OrderedSet(b, _, _, _, _) => inSet(b)
      case WithQuery(cs, b, _, _) => cs.exists(c => inSet(c._2)) || inSet(b)
      case SetOp(_, l, r) => inSet(l) || inSet(r)
    }
    inSet(se)
  }

  private def translateQuery(q0: Query): DataFrame = {
    val q = qualifySubqueryOuterRefs(q0)
    if (q.sel.distinctOn.nonEmpty) translateDistinctOn(q)
    else translateQueryPlain(q)
  }

  // ---- bare outer-reference qualification (r6) -----------------------

  /** Output column names a relation contributes to its scope, keyed by
    * alias; `None` marks a relation whose columns cannot be enumerated
    * statically (dynamic pivots, column-less unnests) — its presence
    * poisons resolution decisions that would need the full scope. */
  private def scopeEntries(r: Relation): Seq[(String, Option[Set[String]])] =
    r match {
      case TableRef(n, a) =>
        Seq((a.getOrElse(n).toLowerCase,
          scala.util.Try(catalog(n).columns.map(_.toLowerCase).toSet).toOption))
      case SubqueryRel(q, a) =>
        a.map(al => (al.toLowerCase, setExprColumns(q))).toSeq
      // file schemas are not enumerated statically (reading one here
      // would scan at parse time) - conservative: no qualification
      case TableFnRel(fn, _, _, a) =>
        Seq((a.getOrElse(fn).toLowerCase, None))
      // builtin series generators: the single output column carries
      // the function's own name (DuckDB convention)
      case MacroCallRel(fn, _, a) =>
        Seq((a.getOrElse(fn).toLowerCase, Some(Set(fn.toLowerCase))))
      case ValuesRel(rows, cols, a) =>
        a.map { al =>
          val cs = cols.map(_.map(_.toLowerCase).toSet).orElse(
            rows.headOption.map(r2 => r2.indices.map(i => s"col$i").toSet))
          (al.toLowerCase, cs)
        }.toSeq
      case AliasedRel(rel, a) =>
        val under = scopeEntries(rel)
        Seq((a.toLowerCase,
          if (under.forall(_._2.isDefined))
            Some(under.flatMap(_._2.get).toSet)
          else None))
      case JoinRel(l, rr, _, _) => scopeEntries(l) ++ scopeEntries(rr)
      // positional join re-creates its frames, dropping sub-aliases:
      // columns resolve UNQUALIFIED only (scope entries are absent on
      // purpose — a qualified ref fails loudly at analysis)
      case PositionalJoinRel(_, _) => Seq.empty
      case AsofJoinRel(l, rr, _, _) => scopeEntries(l) ++ scopeEntries(rr)
      case UsingJoinRel(l, rr, _, _) => scopeEntries(l) ++ scopeEntries(rr)
      case NaturalJoinRel(l, rr, _) => scopeEntries(l) ++ scopeEntries(rr)
      case LateralRel(l, sub, a, _) =>
        scopeEntries(l) :+ ((a.toLowerCase, setExprColumns(sub)))
      case UnnestRel(l, _, a, cols, ord, _) =>
        l.map(scopeEntries).getOrElse(Nil) ++ a.map { al =>
          (al.toLowerCase,
            if (cols.nonEmpty)
              Some(cols.map(_.toLowerCase).toSet ++
                (if (ord) Set("ordinality") else Set.empty[String]))
            else None)
        }
      case SampleRel(r2, _, _) => scopeEntries(r2)
      // pivot output columns are value-dependent; unpivot renames —
      // both poison enumeration (conservative: no qualification)
      case PivotRel(_, _, _, _) => Seq(("__pivot__", None))
      case UnpivotRel(_, _, _, _) => Seq(("__unpivot__", None))
    }

  /** Statically derivable output column names of a set expression —
    * None when any select item's name is not derivable. A bare star
    * enumerates through the FROM scope when that scope is itself
    * fully enumerable. */
  private def setExprColumns(se: SetExpr): Option[Set[String]] = se match {
    case Leaf(q) =>
      val fromCols = {
        lazy val entries = scopeEntries(q.sel.from)
        () => if (entries.forall(_._2.isDefined))
          Some(entries.flatMap(_._2.get).toSet) else None
      }
      val perItem: Seq[Option[Set[String]]] = q.sel.items.map {
        case SelectItem(_, Some(a)) => Some(Set(a.toLowerCase))
        case SelectItem(ColRef(_, n), None) => Some(Set(n.toLowerCase))
        case SelectItem(Star(_), None) => fromCols()
        case _ => None
      }
      if (perItem.forall(_.isDefined)) Some(perItem.flatMap(_.get).toSet)
      else None
    case SetOp(_, l, _) => setExprColumns(l)
    case WithQuery(_, body, _, _) => setExprColumns(body)
    case OrderedSet(body, _, _, _, _) => setExprColumns(body)
  }

  /** Standard SQL scoping for subqueries: a bare column reference
    * inside a subquery that does not resolve against the subquery's
    * own FROM resolves against the ENCLOSING query's relations —
    * classic TPC-H text (`where l2.l_partkey = p_partkey`) depends on
    * it. The correlation machinery keys on alias QUALIFIERS, so this
    * pass rewrites such refs to qualified form before translation.
    * One enclosing level per pass — deeper subqueries are qualified
    * when their own enclosing query translates (every subquery body
    * flows back through translateQuery), so resolution composes level
    * by level exactly like the standard's innermost-scope-outward
    * rule. Conservative: if the inner scope is not fully enumerable
    * the ref is left untouched (it was an analyzer error before this
    * pass and still is); a name matching several outer relations is
    * the standard ambiguity error. Inner relations shadow same-named
    * outer aliases. */
  private def qualifySubqueryOuterRefs(q: Query): Query = {
    val outerScope = scopeEntries(q.sel.from)
    val outerEnumerable = outerScope.forall(_._2.isDefined)
    if (!outerEnumerable) return q

    def qualifySet(se: SetExpr): SetExpr = se match {
      case Leaf(iq) => Leaf(qualifyIn(iq))
      case SetOp(op, l, r) => SetOp(op, qualifySet(l), qualifySet(r))
      // CTE definitions cannot be correlated (standard); only the body
      case w @ WithQuery(_, body, _, _) => w.copy(body = qualifySet(body))
      case os @ OrderedSet(body, _, _, _, _) =>
        os.copy(body = qualifySet(body))
    }

    def qualifyIn(iq: Query): Query = {
      val innerEntries = scopeEntries(iq.sel.from)
      if (innerEntries.exists(_._2.isEmpty)) return iq
      val innerCols = innerEntries.flatMap(_._2.get).toSet
      val innerAliases = innerEntries.map(_._1).toSet
      val itemAliases =
        iq.sel.items.flatMap(_.alias.map(_.toLowerCase)).toSet
      def fix(e: Expr): Expr = Ast.transformUp(e) {
        case cr @ ColRef(None, n) =>
          val nl = n.toLowerCase
          if (innerCols.contains(nl) || itemAliases.contains(nl)) cr
          else outerScope.collect {
            case (a, Some(cols))
                if cols.contains(nl) && !innerAliases.contains(a) => a
          }.distinct match {
            case Seq(a) => ColRef(Some(a), n)
            case Nil => cr
            case several => fail(s"column '$n' in a subquery is " +
              s"ambiguous across outer relations ${several.mkString(", ")}")
          }
      }
      iq.copy(sel = iq.sel.copy(
        where = iq.sel.where.map(fix),
        having = iq.sel.having.map(fix)))
    }

    def walk(e: Expr): Expr = Ast.transformUp(e) {
      case ScalarSubquery(s) => ScalarSubquery(qualifySet(s))
      case ExistsSubquery(s) => ExistsSubquery(qualifySet(s))
      case InSubquery(x, s) => InSubquery(x, qualifySet(s))
      case QuantCmp(op, all, x, s) => QuantCmp(op, all, x, qualifySet(s))
    }

    // LATERAL derived tables correlate against the relations to their
    // left — qualify their bodies against that prefix scope
    def walkRel(r: Relation): Relation = r match {
      case LateralRel(l, sub, a, k) =>
        val left = walkRel(l)
        val leftScope = scopeEntries(left)
        val sub2 = if (leftScope.forall(_._2.isDefined)) {
          def qs(se: SetExpr): SetExpr = se match {
            case Leaf(iq) =>
              val innerEntries = scopeEntries(iq.sel.from)
              if (innerEntries.exists(_._2.isEmpty)) Leaf(iq)
              else {
                val innerCols = innerEntries.flatMap(_._2.get).toSet
                val innerAliases = innerEntries.map(_._1).toSet
                val itemAliases =
                  iq.sel.items.flatMap(_.alias.map(_.toLowerCase)).toSet
                def fix(e: Expr): Expr = Ast.transformUp(e) {
                  case cr @ ColRef(None, n) =>
                    val nl = n.toLowerCase
                    if (innerCols.contains(nl) || itemAliases.contains(nl)) cr
                    else leftScope.collect {
                      case (al, Some(cols))
                          if cols.contains(nl) && !innerAliases.contains(al) => al
                    }.distinct match {
                      case Seq(al) => ColRef(Some(al), n)
                      case _ => cr
                    }
                }
                Leaf(iq.copy(sel = iq.sel.copy(
                  where = iq.sel.where.map(fix),
                  having = iq.sel.having.map(fix))))
              }
            case other => other
          }
          qs(sub)
        } else sub
        LateralRel(left, sub2, a, k)
      case JoinRel(l, rr, jt, on) => JoinRel(walkRel(l), walkRel(rr), jt, on)
      case PositionalJoinRel(l, rr) =>
        PositionalJoinRel(walkRel(l), walkRel(rr))
      case AsofJoinRel(l, rr, lo, on) =>
        AsofJoinRel(walkRel(l), walkRel(rr), lo, on)
      case UsingJoinRel(l, rr, jt, cs) =>
        UsingJoinRel(walkRel(l), walkRel(rr), jt, cs)
      case NaturalJoinRel(l, rr, jt) => NaturalJoinRel(walkRel(l), walkRel(rr), jt)
      case other => other
    }

    q.copy(
      sel = q.sel.copy(
        from = walkRel(q.sel.from),
        items = q.sel.items.map(si => si.copy(e = walk(si.e))),
        where = q.sel.where.map(walk),
        having = q.sel.having.map(walk),
        qualify = q.sel.qualify.map(walk)),
      orderBy = q.orderBy.map(oi => oi.copy(e = walk(oi.e))))
  }

  /** `SELECT DISTINCT ON (keys) … ORDER BY …` — keep the FIRST row of
    * each key group in ORDER BY order (PostgreSQL/DuckDB semantics),
    * lowered to a `row_number() OVER (PARTITION BY keys ORDER BY …)
    * = 1` filter — a single window over one key shuffle, no
    * self-join. ON/ORDER expressions that are not output columns,
    * aliases, or positionals ride as hidden select items so input
    * columns the projection drops still partition/order; the ORDER BY
    * is REQUIRED (without it the kept row would be
    * partition-arrival-dependent, against the repo's reproducibility
    * contract — PostgreSQL itself warns the row is unpredictable). */
  private def translateDistinctOn(q: Query): DataFrame = {
    val sel = q.sel
    if (q.orderBy.isEmpty)
      fail("DISTINCT ON requires an ORDER BY to make the kept row " +
        "deterministic")
    // names the final projection exposes: explicit aliases + bare refs
    val outNames: Set[String] = sel.items.flatMap {
      case SelectItem(_, Some(a)) => Seq(a.toLowerCase)
      case SelectItem(ColRef(_, n), None) => Seq(n.toLowerCase)
      case _ => Nil
    }.toSet
    def resolvesOnOutput(e: Expr): Boolean = e match {
      case ColRef(None, n) => outNames.contains(n.toLowerCase)
      case NumLit(t) => t.matches("[0-9]+")
      case _ => false
    }
    val donHid = sel.distinctOn.zipWithIndex.collect {
      case (e, i) if !resolvesOnOutput(e) => i -> s"__don_$i" }.toMap
    val obHid = q.orderBy.zipWithIndex.collect {
      case (oi, i) if !resolvesOnOutput(oi.e) => i -> s"__don_ob_$i" }.toMap
    val hidden =
      sel.distinctOn.zipWithIndex.collect { case (e, i) if donHid.contains(i) =>
        SelectItem(e, Some(donHid(i))) } ++
      q.orderBy.zipWithIndex.collect { case (oi, i) if obHid.contains(i) =>
        SelectItem(oi.e, Some(obHid(i))) }
    val df = translateSelect(sel.copy(items = sel.items ++ hidden,
      distinctOn = Nil))
    def resolve(e: Expr, hid: Option[String]): Column = hid match {
      case Some(n) => F.col(n)
      case None => e match {
        case ColRef(None, n) =>
          df.columns.find(_.equalsIgnoreCase(n)).map(F.col).getOrElse(
            fail(s"DISTINCT ON: column '$n' not found"))
        case NumLit(t) =>
          val i = t.toInt
          if (i < 1 || i > sel.items.length)
            fail(s"DISTINCT ON position $i out of range (1..${sel.items.length})")
          F.col(df.columns(i - 1))
        case other => exprToCol(other, None)
      }
    }
    val part = sel.distinctOn.zipWithIndex.map { case (e, i) =>
      resolve(e, donHid.get(i)) }
    val ord = q.orderBy.zipWithIndex.map { case (oi, i) =>
      orderedCol(resolve(oi.e, obHid.get(i)), oi) }
    val rn = "__don_rn"
    val kept = df
      .withColumn(rn,
        F.row_number().over(Window.partitionBy(part: _*).orderBy(ord: _*)))
      .filter(F.col(rn) === 1)
    val orderBy2 = q.orderBy.zipWithIndex.map { case (oi, i) =>
      obHid.get(i).map(n => oi.copy(e = ColRef(None, n))).getOrElse(oi) }
    applyOrderLimit(kept, orderBy2, q.limit, q.offset, q.fetchTies)
      .drop(rn +: (donHid.values.toSeq ++ obHid.values.toSeq): _*)
  }

  private def translateQueryPlain(q: Query): DataFrame = {
    // ORDER BY expressions that cannot evaluate on the OUTPUT frame
    // lower as hidden select items (computed through the projection /
    // aggregation pipeline), then the sort reads the hidden column
    // and drops it:
    //  - aggregates (`order by count(*) desc` after GROUP BY),
    //  - window functions (`order by row_number() over (...)`),
    //  - expressions structurally matching a GROUP BY key (`group by
    //    c % 7 order by c % 7` — the source column no longer exists).
    // Plain ORDER BY (aliases, positionals, row expressions) resolves
    // against the SELECT output as before.
    val isAggQuery = q.sel.groupBy.nonEmpty ||
      q.sel.items.exists(i => containsAgg(i.e)) ||
      q.sel.having.exists(containsAgg)
    val hiddenIdx = q.orderBy.zipWithIndex.collect {
      case (oi, i) if containsAgg(oi.e) || containsWindow(oi.e) ||
          (isAggQuery && !oi.e.isInstanceOf[ColRef] &&
            q.sel.groupBy.exists(g => sameExpr(g, oi.e))) => i
    }.toSet
    if (hiddenIdx.isEmpty)
      applyOrderLimit(translateSelect(q.sel), q.orderBy, q.limit, q.offset,
        q.fetchTies)
    else {
      // DISTINCT: a hidden sort key would join the distinct tuple and
      // change which rows survive — standard SQL rejects the shape
      if (q.sel.distinct)
        fail("ORDER BY expressions of a SELECT DISTINCT query must " +
          "appear in the select list")
      val hidden = q.orderBy.zipWithIndex.collect {
        case (oi, i) if hiddenIdx(i) => SelectItem(oi.e, Some(s"__ob_$i"))
      }
      val df = translateSelect(q.sel.copy(items = q.sel.items ++ hidden))
      val orderBy2 = q.orderBy.zipWithIndex.map { case (oi, i) =>
        if (hiddenIdx(i)) oi.copy(e = ColRef(None, s"__ob_$i")) else oi
      }
      applyOrderLimit(df, orderBy2, q.limit, q.offset, q.fetchTies)
        .drop(hidden.flatMap(_.alias): _*)
    }
  }

  /** True when the expression contains a window function / windowed
    * aggregate anywhere. */
  private def containsWindow(e: Expr): Boolean = e match {
    case a: AggExpr if a.window.isDefined => true
    case RankExpr(_, _) | WinFunc(_, _, _, _) => true
    case other => Ast.children(other).exists(containsWindow)
  }

  /** Sort direction + explicit NULLS FIRST/LAST (None = Spark's
    * default: nulls first when ascending, last when descending). */
  private def orderedCol(c: Column, oi: OrderItem): Column =
    (oi.asc, oi.nullsFirst) match {
      case (true, None)         => c.asc
      case (true, Some(true))   => c.asc_nulls_first
      case (true, Some(false))  => c.asc_nulls_last
      case (false, None)        => c.desc
      case (false, Some(true))  => c.desc_nulls_first
      case (false, Some(false)) => c.desc_nulls_last
    }

  /** ORDER BY (alias/positional-aware) + LIMIT/OFFSET over a result.
    * `ties` = FETCH FIRST n ROWS WITH TIES (r5): keep every row whose
    * sort-key tuple appears among the first n rows' tuples — lowered
    * as TakeOrdered(n) → distinct key tuples → BROADCAST semi-join
    * (null-safe on the keys), never a global rank window (which would
    * sort everything into one partition). */
  private def applyOrderLimit(in: DataFrame, orderBy: Seq[OrderItem],
                              limit: Option[Long],
                              offset: Option[Long],
                              ties: Boolean = false): DataFrame = {
    var df = in
    if (ties && orderBy.isEmpty)
      fail("FETCH ... WITH TIES requires ORDER BY")
    if (orderBy.nonEmpty) {
      // ORDER BY ALL (parsed as a Star order key): every output
      // column, left to right, one direction for the lot — expanded
      // HERE so it sees the final projection (works after SELECT *)
      val expanded = orderBy.flatMap { oi =>
        oi.e match {
          case Star(None) => df.columns.toSeq.map(n => oi.copy(e = ColRef(None, n)))
          case _          => Seq(oi)
        }
      }
      // ORDER BY resolves against the SELECT output (aliases visible),
      // falling back to the literal expression. A bare integer literal
      // is POSITIONAL (1-based output column), matching Spark SQL and
      // DuckDB — ordering by a constant would be meaningless.
      val raw = expanded.map { oi =>
        oi.e match {
          case ColRef(None, n) =>
            df.columns.find(_.equalsIgnoreCase(n))
              .map(F.col).getOrElse(exprToCol(oi.e, None))
          case NumLit(t) if t.matches("[0-9]+") =>
            val i = t.toInt
            if (i < 1 || i > df.columns.length)
              fail(s"ORDER BY position $i out of range (1..${df.columns.length})")
            F.col(df.columns(i - 1))
          case other => exprToCol(other, None)
        }
      }
      val cols = expanded.zip(raw).map { case (oi, c) => orderedCol(c, oi) }
      if (ties) {
        if (offset.nonEmpty)
          fail("FETCH ... WITH TIES does not compose with OFFSET")
        val n = limit.getOrElse(
          fail("FETCH ... WITH TIES requires a row count")).toInt
        val keyNames = raw.indices.map(i => s"__ft_$i")
        var keyed = df
        raw.zip(keyNames).foreach { case (c, nm) =>
          keyed = keyed.withColumn(nm, c)
        }
        val top = keyed.orderBy(cols: _*).limit(n)
          .select(keyNames.map(F.col): _*).distinct()
        val cond = keyNames.map(nm => keyed(nm) <=> top(nm)).reduce(_ && _)
        return keyed.join(F.broadcast(top), cond, "left_semi")
          .drop(keyNames: _*)
          .orderBy(cols: _*)
      }
      df = df.orderBy(cols: _*)
    }
    (offset, limit) match {
      case (Some(o), Some(l)) => df.offset(o.toInt).limit(l.toInt)
      case (None, Some(l))    => df.limit(l.toInt)
      case (Some(o), None)    => df.offset(o.toInt)
      case _                  => df
    }
  }

  // ---- relations ----------------------------------------------------

  /** Builds the FROM DataFrame. Aliases every named relation so
    * qualified refs (`t.col`) resolve; Spark's default
    * case-insensitive analysis handles bare columns, matching the
    * reference's case-insensitive lookup (sql_parser.py). */
  private def translateRelation(r: Relation): DataFrame = r match {
    case TableRef(name, alias) =>
      val df = catalog(name)
      df.alias(alias.getOrElse(name).toLowerCase)
    case TableFnRel(fn, path, header, alias) =>
      // lazy reads: nothing scans until an action (CSV/JSON schema
      // inference reads a sample at plan time, the DuckDB _auto
      // contract). Globs pass through to the reader; header
      // defaults true for csv (override: read_csv('p', header =
      // false) - Spark cannot auto-detect like DuckDB does).
      val df = fn match {
        case "read_parquet" => session.read.parquet(path)
        case "read_csv" | "read_csv_auto" =>
          session.read.option("header", header.getOrElse(true).toString)
            .option("inferSchema", "true").csv(path)
        case "read_json" | "read_json_auto" => session.read.json(path)
        case "read_text" => session.read.text(path)
        case other => fail(s"unknown table function $other")
      }
      df.alias(alias.getOrElse(fn).toLowerCase)
    case MacroCallRel(fn, args, alias) =>
      // table macros were expanded before translation (MacroExpander);
      // what reaches here is either a builtin series generator or an
      // unknown name. generate_series/range lower to session.range —
      // Spark's native parallel long-range scan (splittable across
      // executors, no driver materialization): generate_series is
      // end-INCLUSIVE, range end-EXCLUSIVE (DuckDB semantics; the
      // 1-arg forms start at 0). Bounds must be integer literals —
      // a data-dependent series needs unnest(sequence(...)).
      if (!Macros.builtinTableFns.contains(fn.toLowerCase))
        fail(s"unknown table function or macro '$fn' (is the macro " +
          "registered in this session? CREATE MACRO … AS TABLE …)")
      def lit(e: Expr): Long = e match {
        case NumLit(t) if !t.contains('.') && !t.toLowerCase.contains('e') =>
          t.toLong
        case Neg(NumLit(t)) if !t.contains('.') &&
          !t.toLowerCase.contains('e') => -t.toLong
        case other =>
          fail(s"$fn bounds must be integer literals, got $other")
      }
      val name = fn.toLowerCase
      val (start, endEx, step) = args.map(lit) match {
        case Seq(n) =>
          if (name == "range") (0L, n, 1L) else (0L, n + 1, 1L)
        case Seq(a, b) =>
          if (name == "range") (a, b, 1L) else (a, b + 1, 1L)
        case Seq(a, b, s) =>
          if (s == 0L) fail(s"$name step must be nonzero")
          val adj = if (name == "range") 0L else if (s > 0) 1L else -1L
          (a, b + adj, s)
        case _ => fail(s"$name takes 1-3 integer arguments")
      }
      // empty-direction calls (start past end) produce zero rows,
      // matching DuckDB; session.range handles it natively
      session.range(start, endEx, step).toDF(name)
        .alias(alias.getOrElse(name).toLowerCase)
    case SubqueryRel(q, alias) =>
      val df = translate(q)
      alias.map(a => df.alias(a.toLowerCase)).getOrElse(df)
    case ValuesRel(rows, colsOpt, alias) =>
      // inline table: each row projects its literal expressions over a
      // one-row frame; the union folds to a LocalRelation plan-side
      // (no scan, broadcastable). Rows must union-compatibly type —
      // mismatches fail loudly at analysis.
      if (rows.isEmpty) fail("VALUES requires at least one row")
      val w = rows.head.length
      if (rows.exists(_.length != w))
        fail("VALUES rows must all have the same number of columns")
      val names = colsOpt.getOrElse((0 until w).map(i => s"col$i"))
      if (names.length != w)
        fail(s"VALUES column list has ${names.length} names for $w columns")
      val one = session.range(1)
      val df = rows.map(r => one.select(r.zip(names).map { case (e, n) =>
        exprToCol(e, None).as(n) }: _*)).reduce(_.union(_))
      alias.map(a => df.alias(a.toLowerCase)).getOrElse(df)
    case AliasedRel(rel, alias) =>
      translateRelation(rel).alias(alias.toLowerCase)
    case PositionalJoinRel(l, r) =>
      // POSITIONAL JOIN (r11c, DuckDB): zip the two sides row-by-row;
      // the shorter side null-pads (full outer on position). Indexing
      // rides RDD zipWithIndex — one extra partition-count pass per
      // side (contiguous cross-partition indexes have no pure-plan
      // form), partition-parallel thereafter; a sorted subquery keeps
      // its order through .rdd, which is what makes the zip defined.
      // The re-created frames drop sub-aliases, so columns are
      // referenced UNQUALIFIED; same-named columns on both sides are
      // ambiguous there, as in a USING-less join.
      val lf = translateRelation(l)
      val rf = translateRelation(r)
      def indexed(df: DataFrame, posCol: String): DataFrame = {
        val schema = org.apache.spark.sql.types.StructType(
          df.schema.fields :+ org.apache.spark.sql.types.StructField(
            posCol, org.apache.spark.sql.types.LongType, nullable = false))
        session.createDataFrame(
          df.rdd.zipWithIndex.map { case (row, i) =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i) }, schema)
      }
      val lid = indexed(lf, "__lpos")
      val rid = indexed(rf, "__rpos")
      lid.join(rid, lid("__lpos") === rid("__rpos"), "full_outer")
        .drop("__lpos", "__rpos")
    case UsingJoinRel(l, r, jt, cols) =>
      translateRelation(l).join(translateRelation(r), cols, sparkJoinType(jt))
    case NaturalJoinRel(l, r, jt) =>
      // the using-set is every same-named column pair (case-insensitive,
      // matching the translator's column resolution); standard output
      // layout — one copy of each common column first — comes from
      // Spark's using-join
      val lf = translateRelation(l)
      val rf = translateRelation(r)
      val rset = rf.columns.map(_.toLowerCase).toSet
      val common = lf.columns.filter(c => rset.contains(c.toLowerCase))
      if (common.isEmpty)
        fail("NATURAL JOIN requires at least one common column name")
      lf.join(rf, common.toSeq, sparkJoinType(jt))
    case LateralRel(l, sub, alias, kind) =>
      translateLateral(l, sub, alias, kind)
    case SampleRel(rel, pct, key) =>
      // deterministic keyed sampling (r5b): the md5-threshold filter
      // (Sampling.consistentSample) as a relation clause — a pure
      // pushdown-friendly filter, stable under repartitioning and
      // replayable by any engine with md5
      val df = translateRelation(rel)
      df.filter(
        F.substring(F.md5(F.col(key).cast("string")), 1, 8) <
          F.lit(graft.ops.Sampling.thresholdHex(pct / 100.0)))
    case UnnestRel(leftOpt, arr, alias, cols, ord, kind) =>
      // FROM-position unnest (r5b): ONE Generate over the left frame —
      // the array expression is inlined inside explode (never a
      // pre-materialized column: the 13× Generate-copy trap). LEFT
      // spelling keeps empty/NULL-array rows via explode_outer.
      alias.foreach(a => flatAliases += a.toLowerCase)
      val valName = cols.headOption.orElse(alias).getOrElse("unnest")
      val arrCol = exprToCol(arr, None)
      if (ord) {
        val ordName = cols.lift(1).getOrElse("ordinality")
        val g = (if (kind == "left") F.posexplode_outer(arrCol)
                 else F.posexplode(arrCol)).as(Seq("__un_pos", valName))
        val base = leftOpt match {
          case Some(l) =>
            val lf = translateRelation(l)
            lf.select(lf.col("*"), g)
          case None => session.range(1).select(g)
        }
        // WITH ORDINALITY is 1-based (PostgreSQL); posexplode is 0-based
        base.withColumn(ordName, F.col("__un_pos") + F.lit(1L))
          .drop("__un_pos")
      } else {
        val g = (if (kind == "left") F.explode_outer(arrCol)
                 else F.explode(arrCol)).as(valName)
        leftOpt match {
          case Some(l) =>
            val lf = translateRelation(l)
            lf.select(lf.col("*"), g)
          case None => session.range(1).select(g)
        }
      }
    case PivotRel(rel, aggsList, forCol, values0) =>
      // Spark SQL / Snowflake semantics: implicit group-by = every
      // column the aggregate and the FOR column don't reference; one
      // output column per IN value (missing combinations read NULL).
      // Explicit IN values ⟹ no discovery pass over the data — the
      // pivot is a single two-phase aggregation at any scale.
      val df = translateRelation(rel)
      val forActual = df.columns.find(_.equalsIgnoreCase(forCol)).getOrElse(
        fail(s"PIVOT column '$forCol' not found"))
      var used = Set.empty[String]
      def collectRefs(e: Expr): Unit = e match {
        case ColRef(_, n) => used += n.toLowerCase
        case other => Ast.children(other).foreach(collectRefs)
      }
      aggsList.foreach { case (agg, _) => collectRefs(agg) }
      val groupCols = df.columns.filterNot(c =>
        used.contains(c.toLowerCase) || c.equalsIgnoreCase(forActual))
      if (!values0.forall(v => isLiteral(v._1)))
        fail("PIVOT IN values must be literals")
      // dynamic pivot (r11b, DuckDB/Snowflake): no IN list ⟹ discover
      // the distinct FOR values with one bounded driver-side pass —
      // exactly how Spark's own RelationalGroupedDataset.pivot(col)
      // works. Deterministic column order (sorted), NULL FOR values
      // produce no column (a NULL never equals anything — DuckDB
      // drops them too), and a cap keeps a high-cardinality column
      // from planning a million output columns.
      val values = if (values0.nonEmpty) values0 else {
        val cap = 1000
        val dvs = df.select(F.col(forActual)).distinct()
          .orderBy(F.col(forActual)).limit(cap + 1).collect()
          .map(_.get(0)).filter(_ != null)
        if (dvs.length > cap)
          fail(s"dynamic PIVOT found more than $cap distinct values " +
            s"in '$forActual' — spell the IN (...) list explicitly")
        if (dvs.isEmpty)
          fail(s"dynamic PIVOT found no non-NULL values in '$forActual'")
        dvs.toSeq.map {
          case s: String            => (StrLit(s): Expr, None)
          case b: java.lang.Boolean => (BoolLit(b): Expr, None)
          case n: java.lang.Number  => (NumLit(n.toString): Expr, None)
          case other => fail("dynamic PIVOT supports string/numeric/" +
            s"boolean FOR columns, got ${other.getClass.getSimpleName}")
        }
      }
      // conditional-aggregation lowering, NOT RelationalGroupedDataset
      // .pivot: Spark's pivot plans TWO aggregations (one on
      // group+pivot keys, then PivotFirst on the group keys) — two
      // shuffles; CASE-wrapping the argument per IN value (the FILTER
      // lowering's trick: NULLs are invisible to every aggregate)
      // computes all pivot cells — values × aggregates (r5b) — in ONE
      // two-phase aggregation (PlanAuditSpec pins the single exchange)
      val aggCols = values.flatMap { case (v, nameOpt) =>
        val cellBase = nameOpt.getOrElse(String.valueOf(litValue(v)))
        aggsList.map { case (agg, aggAlias) =>
          val wrapped = Ast.transformUp(agg) {
            case a: AggExpr if a.window.isEmpty =>
              if (a.extraArgs.nonEmpty || a.aggOrder.nonEmpty)
                fail("PIVOT supports single-argument aggregates only")
              val base = a.arg match {
                case Star(_) => NumLit("1")
                case e => e
              }
              a.copy(arg = CaseWhen(
                Seq((Cmp("=", ColRef(None, forActual), v), base)), NullLit()))
          }
          val cellName = aggAlias match {
            case Some(al) => s"${cellBase}_$al" // aliased agg names the cell
            case None     => cellBase           // lone unaliased aggregate
          }
          lowerPivotAgg(wrapped).as(cellName)
        }
      }
      df.groupBy(groupCols.map(F.col).toSeq: _*)
        .agg(aggCols.head, aggCols.tail: _*)
    case UnpivotRel(rel, valueName, varName, cols) =>
      // one stack() Generate — a pure projection (no shuffle); NULL
      // values are kept (add WHERE val IS NOT NULL for DuckDB's drop)
      val df = translateRelation(rel)
      val resolved = cols.map { case (c, lab) =>
        val actual = df.columns.find(_.equalsIgnoreCase(c)).getOrElse(
          fail(s"UNPIVOT column '$c' not found"))
        (actual, lab.getOrElse(actual))
      }
      val unpivotSet = resolved.map(_._1.toLowerCase).toSet
      val ids = df.columns.filterNot(c => unpivotSet.contains(c.toLowerCase))
      val stackArgs = resolved.map { case (c, l) =>
        s"'${l.replace("'", "''")}', `$c`" }.mkString(", ")
      df.selectExpr(ids.map(c => s"`$c`") :+
        (s"stack(${resolved.length}, $stackArgs) " +
          s"as (`$varName`, `$valueName`)"): _*)
    case JoinRel(l, rr, jt, on) =>
      val lf = translateRelation(l)
      val rf = translateRelation(rr)
      jt match {
        case "cross" => lf.crossJoin(rf)
        case t =>
          on match {
            case Some(cond) =>
              lf.join(rf, exprToCol(cond, None), sparkJoinType(t))
            case None => fail(s"$t JOIN requires ON condition")
          }
      }
    case aj: AsofJoinRel => translateAsofJoin(aj)
  }

  /** ASOF [LEFT] JOIN (r7b, DuckDB dialect): for each left row the
    * single nearest right row within equal keys. Lowered WITHOUT a
    * join — tag both sides, UNION, one last/first_value(ignoreNulls)
    * window over the key partition: one shuffle on the keys, linear
    * in total rows (the AsOf operator's plan shape, SURVEY §2.2 row
    * 52, generalized to whole right rows and composite keys; a
    * sort-merge formulation would shuffle both sides too and then pay
    * a per-key merge with no codegen; an equi-join + row_number would
    * multiply hot keys by their whole right history first). The
    * matched right row travels in ONE struct so every output column
    * comes from the SAME right row. Ties at equal times resolve by a
    * side tag in the sort (inclusive ops admit the equal-time right
    * row, strict ops exclude it); left rows with NULL keys or a NULL
    * time match nothing (null keys are filtered off the right side
    * and the time sort banishes null left times to the no-match end).
    * The output frame is FLAT (both alias scopes register as
    * qualifier-dropping), so the two sides' column names must be
    * disjoint — loud otherwise. */
  private def translateAsofJoin(aj: AsofJoinRel): DataFrame = {
    val lf = translateRelation(aj.left)
    val rf = translateRelation(aj.right)
    val lAl = relationAliases(aj.left); val rAl = relationAliases(aj.right)
    val lColsLc = lf.columns.map(_.toLowerCase).toSet
    val rColsLc = rf.columns.map(_.toLowerCase).toSet
    val overlap = lf.columns.filter(c => rColsLc.contains(c.toLowerCase))
    if (overlap.nonEmpty)
      fail(s"ASOF JOIN sides share column names [${overlap.mkString(", ")}]" +
        " — the joined frame is flat; alias them apart in subqueries")
    // the __asof_* helper namespace must be free on BOTH sides (the
    // AsOf operator's requireFree contract): a same-named input
    // column would be silently shadowed in the union frame
    val clash = (lf.columns ++ rf.columns)
      .filter(_.toLowerCase.startsWith("__asof_"))
    if (clash.nonEmpty)
      fail(s"ASOF JOIN input columns [${clash.mkString(", ")}] collide " +
        "with the reserved __asof_* helper namespace")
    // which side does an ON operand read? (qualified refs by alias,
    // bare refs by schema membership; mixed/ambiguous → None)
    def side(e: Expr): Option[Boolean] = {
      var l = false; var r = false; var bad = false
      def walk(x: Expr): Unit = x match {
        case ColRef(Some(q), _) =>
          if (lAl.contains(q.toLowerCase)) l = true
          else if (rAl.contains(q.toLowerCase)) r = true
          else bad = true
        case ColRef(None, n) =>
          val inL = lColsLc.contains(n.toLowerCase)
          val inR = rColsLc.contains(n.toLowerCase)
          if (inL == inR) bad = true else if (inL) l = true else r = true
        case other => Ast.children(other).foreach(walk)
      }
      walk(e)
      if (bad || l == r) None else Some(l)
    }
    var eqs = Vector.empty[(Expr, Expr)] // (leftKey, rightKey)
    var ineq: Option[(Expr, String, Expr)] = None // (leftT, op, rightT)
    // r8: a SECOND inequality forms a TOLERANCE BAND (the pandas
    // merge_asof bound — `ON l.t >= r.t AND l.t - r.t <= 1800`). The
    // primary direction inequality compares two BARE columns; the
    // band is any further inequality (compound operands allowed) and
    // lowers as a post-match filter against the matched row — the
    // q_asof_tolerance CASE-bounded semantics: the nearest match
    // either satisfies the band or the row has NO match.
    var band: Option[Expr] = None
    val flip = Map(">=" -> "<=", ">" -> "<", "<=" -> ">=", "<" -> ">")
    def isBareRef(e: Expr): Boolean = e.isInstanceOf[ColRef]
    splitConjuncts(aj.on).foreach {
      case Cmp("=", a, b) => (side(a), side(b)) match {
        case (Some(true), Some(false)) => eqs :+= ((a, b))
        case (Some(false), Some(true)) => eqs :+= ((b, a))
        case _ => fail("ASOF JOIN equality conjuncts must compare one " +
          "left-side expression with one right-side expression")
      }
      case c @ Cmp(op @ (">=" | ">" | "<=" | "<"), a, b) =>
        val primaryForm = isBareRef(a) && isBareRef(b) &&
          ((side(a), side(b)) match {
            case (Some(_), Some(_)) => true
            case _                  => false
          })
        if (primaryForm) {
          // bare-bare inequalities are the DIRECTION; a second one is
          // loud (which would be primary is order-dependent) — a
          // tolerance bound must be compound (e.g. l.t - r.t <= x)
          if (ineq.isDefined)
            fail("ASOF JOIN takes exactly ONE inequality conjunct " +
              "(a tolerance bound must be a compound expression, " +
              "e.g. l.t - r.t <= x)")
          (side(a), side(b)) match {
            case (Some(true), Some(false)) => ineq = Some((a, op, b))
            case (Some(false), Some(true)) => ineq = Some((b, flip(op), a))
            case _ => fail("ASOF JOIN's inequality must compare a " +
              "left-side expression with a right-side expression")
          }
        } else {
          if (band.isDefined)
            fail("ASOF JOIN takes ONE direction inequality plus at most " +
              "ONE tolerance bound")
          def refsRight(e: Expr): Boolean = e match {
            case ColRef(Some(q2), _) => rAl.contains(q2.toLowerCase)
            case ColRef(None, n) => rColsLc.contains(n.toLowerCase)
            case other2 => Ast.children(other2).exists(refsRight)
          }
          if (!refsRight(c))
            fail("ASOF JOIN tolerance bound must reference the right " +
              "side (a left-only predicate belongs in WHERE)")
          band = Some(c)
        }
      case other => fail("ASOF JOIN ON supports equality conjuncts plus " +
        s"exactly one inequality, got: $other")
    }
    val (lt, op, rt) = ineq.getOrElse(fail("ASOF JOIN requires a bare " +
      "two-column inequality conjunct (it names the time columns and " +
      "direction)"))
    val backward = op == ">=" || op == ">"
    val inclusive = op == ">=" || op == "<="
    // r9 (r8 ADVICE): the band lowers as a POST-MATCH filter, which
    // is only sound when the bound is monotone toward the match
    // direction — if the NEAREST row fails it, every FARTHER row
    // must fail it too. Enforce, instead of trusting the comment:
    //  (a) right-side refs in the band must be the right TIME column
    //      (any other right column cannot be post-filtered — its
    //      value on farther rows is unconstrained);
    //  (b) the band must reference the left side too (a right-only
    //      predicate is a plain pre-filter — subquery the right side);
    //  (c) the right-time occurrences must sit in a +/- linear
    //      context with one consistent sign, and the comparison
    //      direction must make the predicate monotone-safe for the
    //      join direction (backward: non-decreasing in right-time;
    //      forward: non-increasing).
    band.foreach { b0 =>
      val rtName = rt.asInstanceOf[ColRef].name.toLowerCase
      def isRightRef(c: ColRef): Boolean = c match {
        case ColRef(Some(q2), _) => rAl.contains(q2.toLowerCase)
        case ColRef(None, n) =>
          rColsLc.contains(n.toLowerCase) && !lColsLc.contains(n.toLowerCase)
      }
      def rightRefs(e: Expr): Seq[ColRef] = e match {
        case c: ColRef if isRightRef(c) => Seq(c)
        case other => Ast.children(other).flatMap(rightRefs)
      }
      def refsLeft(e: Expr): Boolean = e match {
        case ColRef(Some(q2), _) => lAl.contains(q2.toLowerCase)
        case ColRef(None, n)     => lColsLc.contains(n.toLowerCase)
        case other => Ast.children(other).exists(refsLeft)
      }
      rightRefs(b0).find(_.name.toLowerCase != rtName).foreach { c =>
        fail("ASOF JOIN tolerance bound may reference the right side " +
          s"only through its time column '${rt.asInstanceOf[ColRef].name}'" +
          s" (got '${c.name}') — filter other right-side predicates in " +
          "a subquery over the right table")
      }
      if (!refsLeft(b0))
        fail("ASOF JOIN tolerance bound must reference both sides — a " +
          "right-only predicate belongs in a subquery filtering the " +
          "right side (post-match filtering cannot recover rows it " +
          "would exclude)")
      val Cmp(bop, ba, bb) = (b0: @unchecked)
      val (e0, x0, cop) =
        if (rightRefs(ba).nonEmpty) (ba, bb, bop)
        else (bb, ba, Map(">=" -> "<=", ">" -> "<",
                          "<=" -> ">=", "<" -> ">")(bop))
      if (rightRefs(x0).nonEmpty)
        fail("ASOF JOIN tolerance bound must keep the right time " +
          "column on ONE side of the comparison")
      // sign of each right-time occurrence through +/-/neg/cast; an
      // occurrence under any other operator is non-monotone → None
      def signs(e: Expr, s: Int): Seq[Option[Int]] = e match {
        case c: ColRef if isRightRef(c) => Seq(Some(s))
        case Arith("+", a2, b2) => signs(a2, s) ++ signs(b2, s)
        case Arith("-", a2, b2) => signs(a2, s) ++ signs(b2, -s)
        case Neg(e2)            => signs(e2, -s)
        case Cast(e2, _, _)     => signs(e2, s)
        case other =>
          Ast.children(other).flatMap(signs(_, s)).map(_ => None)
      }
      val occ = signs(e0, 1)
      val sgn =
        if (occ.nonEmpty && occ.forall(_.contains(1))) Some(1)
        else if (occ.nonEmpty && occ.forall(_.contains(-1))) Some(-1)
        else None
      val safe = sgn.exists { s =>
        // `E <= X` with E increasing in right-time (s>0) is
        // non-increasing in right-time; farther rows are SMALLER
        // right-times backward / LARGER forward
        val nonIncreasing = (cop == "<=" || cop == "<") == (s > 0)
        if (backward) !nonIncreasing else nonIncreasing
      }
      if (!safe)
        fail("ASOF JOIN tolerance bound must bound the match distance " +
          "from above (monotone toward the join direction); a bound a " +
          "farther row could satisfy when the nearest row fails cannot " +
          "lower as a post-match filter — pre-filter the right side " +
          "in a subquery instead")
    }
    val kNs = eqs.indices.map(i => s"__asof_k$i")
    val tN = "__asof_t"; val sN = "__asof_side"; val mN = "__asof_m"
    var r2 = rf.select(eqs.map(_._2).zip(kNs).map { case (e, n) =>
        exprToCol(e, None).as(n) } ++ Seq(
        exprToCol(rt, None).as(tN),
        F.struct(rf.columns.map(F.col): _*).as(mN)): _*)
      .filter(F.col(tN).isNotNull)
    if (kNs.nonEmpty)
      r2 = r2.filter(kNs.map(F.col(_).isNotNull).reduce(_ && _))
    val mType = r2.schema(mN).dataType
    val leftCols = lf.columns.toSeq
    val l3 = lf.select(leftCols.map(F.col) ++
      eqs.map(_._1).zip(kNs).map { case (e, n) =>
        exprToCol(e, None).as(n) } ++ Seq(
      exprToCol(lt, None).as(tN), F.lit(1).as(sN),
      F.lit(null).cast(mType).as(mN)): _*)
    val r3 = r2.select(lf.schema.fields.toSeq.map(f =>
        F.lit(null).cast(f.dataType).as(f.name)) ++
      kNs.map(F.col) ++ Seq(F.col(tN), F.lit(0).as(sN), F.col(mN)): _*)
    val u = l3.union(r3)
    val ord =
      if (backward) F.col(tN).asc_nulls_first else F.col(tN).asc_nulls_last
    val tie = if (backward == inclusive) F.col(sN).asc else F.col(sN).desc
    if (kNs.isEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "ASOF JOIN without an equality key lowers to a GLOBAL window — " +
          "both sides serialize through ONE partition. Correct by " +
          "semantics (fine for a small dimension side), but add an " +
          "equality conjunct for scale.")
    val spec = (if (kNs.nonEmpty) Window.partitionBy(kNs.map(F.col): _*)
                else Window.partitionBy()).orderBy(ord, tie)
    val matchN = "__asof_match"
    val matchCol =
      if (backward)
        F.last(F.col(mN), ignoreNulls = true).over(
          spec.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        F.first(F.col(mN), ignoreNulls = true).over(
          spec.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    var matched = u.withColumn(matchN, matchCol).filter(F.col(sN) === 1)
    // tolerance band (r8): re-evaluate the bound against the MATCHED
    // row — right refs read the match struct's fields, left refs the
    // bare columns. A false/NULL bound nulls the match (pandas
    // tolerance: the nearest row either qualifies or nothing does —
    // time-monotone bounds can't be satisfied by a farther row).
    band.foreach { b0 =>
      val b1 = Ast.transformUp(b0) {
        case ColRef(Some(q2), n) if rAl.contains(q2.toLowerCase) =>
          ColRef(None, s"$matchN.$n")
        case ColRef(Some(q2), n) if lAl.contains(q2.toLowerCase) =>
          ColRef(None, n)
        case ColRef(None, n) if rColsLc.contains(n.toLowerCase) &&
            !lColsLc.contains(n.toLowerCase) =>
          ColRef(None, s"$matchN.$n")
      }
      val ok = exprToCol(b1, None)
      matched = matched.withColumn(matchN,
        F.when(F.col(matchN).isNotNull && ok, F.col(matchN)))
    }
    if (!aj.leftOuter) matched = matched.filter(F.col(matchN).isNotNull)
    val out = matched.select(leftCols.map(F.col) ++
      rf.columns.toSeq.map(c => F.col(s"$matchN.$c").as(c)): _*)
    // both scopes' qualified refs resolve by dropping the qualifier
    // (names are disjoint — guarded above)
    flatAliases ++= (lAl ++ rAl)
    out
  }

  /** LATERAL (r5): correlated aggregate derived tables —
    * `cross join lateral (select count(*) n, sum(x) s from t where
    * t.k = outer.k) a` — the multi-column generalization of the
    * correlated scalar subquery. Restricted to aggregate subqueries
    * (no GROUP BY/HAVING/DISTINCT/ORDER/LIMIT, every item aggregates,
    * correlation by equality conjuncts), which guarantees exactly one
    * lateral row per outer row and makes CROSS/INNER/LEFT spellings
    * equivalent.
    *
    * Lowering (never per-row re-execution): the inner relation groups
    * by the correlation keys ONCE; the outer's distinct key tuples
    * left-join those groups (missing groups read NULL, bare COUNTs
    * coalesce to 0 — aggregate-over-empty semantics); item
    * expressions project under the lateral alias; the outer frame
    * then joins back NULL-SAFELY on the key tuple — one narrow key
    * shuffle for the aggregation plus one equi-join, the same scale
    * shape as the scalar decorrelation. */
  private def translateLateral(l: Relation, sub: SetExpr,
                               alias: String, kind: String): DataFrame = {
    val q = sub match {
      case Leaf(q0) => q0
      case _ => fail("LATERAL supports a single SELECT subquery")
    }
    if (q.sel.qualify.isDefined || q.sel.distinct ||
        q.sel.distinctOn.nonEmpty || q.sel.groupSets.nonEmpty)
      fail("LATERAL subqueries take no DISTINCT/QUALIFY/GROUPING SETS " +
        "(aggregate over the correlation, or use the top-n form)")
    if (q.sel.groupBy.nonEmpty || q.sel.having.nonEmpty ||
        (q.sel.items.nonEmpty && q.sel.items.exists(i => containsAgg(i.e))))
      translateLateralAgg(l, q, alias, kind)
    else
      translateLateralTopN(l, q, alias, kind)
  }

  private def translateLateralAgg(l: Relation, q: Query,
                                  alias: String, kind: String): DataFrame = {
    val lf = translateRelation(l)
    val outerAliases = relationAliases(l)
    if (q.orderBy.nonEmpty || q.limit.nonEmpty || q.offset.nonEmpty)
      fail("LATERAL aggregate subqueries take no ORDER BY/LIMIT " +
        "(one row per outer row, or one per surviving group)")
    val innerKeys = q.sel.groupBy
    if (q.sel.items.isEmpty)
      fail("LATERAL aggregate subqueries need select items")
    if (innerKeys.isEmpty && q.sel.having.isEmpty &&
        !q.sel.items.forall(i => containsAgg(i.e)))
      fail("LATERAL select items must either all aggregate or " +
        "(for the top-n form) none aggregate")
    val outerOnly = outerAliases -- relationAliases(q.sel.from)
    // theta conjuncts (r5b) decorrelate through the same per-distinct-
    // outer-tuple aggregation as theta scalar subqueries; general
    // correlated predicates (r5c: correlation under OR/NOT, mixed-side
    // comparisons) ride the same tuple join as residual conditions
    val (keyPairs, thetas, gens, genDefs, local) =
      corrSplitG(q, outerOnly, "LATERAL", allowTheta = true,
        Some("__lat_ge"))
    var inner = drainGenHoists(translateRelation(q.sel.from))
    local.reduceOption(And).foreach(p => inner = inner.filter(exprToCol(p, None)))
    val keyNames = keyPairs.indices.map(i => s"__lat_k$i")
    val tNames = thetas.indices.map(i => s"__lat_t$i")
    // inner GROUP BY keys (r7): each surviving (tuple, group) becomes
    // one lateral row — the "per-outer-row breakdown" shape. HAVING
    // filters groups BEFORE the join back. A grouped (or HAVING-
    // filtered) lateral can yield ZERO rows for a tuple, so the
    // missing-tuple fill only applies to the plain one-row-per-tuple
    // aggregate form; CROSS/INNER then drop unmatched outer rows and
    // LEFT keeps them with NULL lateral columns (standard LATERAL
    // join semantics — the first place the spelling matters for the
    // aggregate form).
    val grpNames = innerKeys.indices.map(i => s"__lat_g$i")
    val fillMissing = innerKeys.isEmpty && q.sel.having.isEmpty
    var aggs = Vector.empty[(String, AggExpr)]
    def aggRef(a: AggExpr): String =
      aggs.find(_._2 == a).map(_._1).getOrElse {
        val nn = s"__lat_a${aggs.size}"
        aggs :+= (nn -> a); nn
      }
    // TOP-DOWN: an aggregate must be captured WHOLE (its args are
    // inner-frame expressions the aggregation evaluates) — a
    // bottom-up pass would rewrite a group-key ref inside an agg arg
    // to a post-grouping helper name the inner frame doesn't have
    def substGroupKeys(e: Expr): Expr = e match {
      case a: AggExpr if a.window.isEmpty =>
        val n = aggRef(a)
        if (a.func == "count" && fillMissing)
          Coalesce(Seq(ColRef(None, n), NumLit("0")))
        else ColRef(None, n)
      case c if innerKeys.exists(k => sameExpr(k, c)) =>
        ColRef(None,
          innerKeys.zip(grpNames).find(t => sameExpr(t._1, c)).get._2)
      case other => Ast.mapChildren(other, substGroupKeys)
    }
    val innerAliasSet = relationAliases(q.sel.from)
    val items = q.sel.items.map { item =>
      val rewritten = substGroupKeys(item.e)
      if (refersToAliases(rewritten, innerAliasSet))
        fail("LATERAL aggregate select items must be aggregates or " +
          s"GROUP BY keys, got ${item.e}")
      val name = item.alias.getOrElse(defaultName(item.e, inner))
      (rewritten, name)
    }
    val havingSubst: Option[Expr] = q.sel.having.map(substGroupKeys)
    if (aggs.isEmpty)
      fail("LATERAL aggregate subqueries need at least one aggregate " +
        "(use the top-n form for plain correlated selection)")
    val aggCols = aggs.map { case (n, a) => aggColumn(a).as(n) }
    val grpCols = innerKeys.zip(grpNames).map { case (g, n) =>
      exprToCol(g, None).as(n) }
    if (keyPairs.isEmpty && thetas.isEmpty && gens.isEmpty) {
      // uncorrelated: a global aggregate is ONE row (or one per
      // group) — broadcast it
      var grouped =
        if (innerKeys.isEmpty) inner.agg(aggCols.head, aggCols.tail: _*)
        else inner.groupBy(grpCols: _*).agg(aggCols.head, aggCols.tail: _*)
      havingSubst.foreach(h => grouped = grouped.filter(exprToCol(h, None)))
      val lat = grouped.select(items.map { case (e, n) =>
        exprToCol(e, None).as(n) }: _*).alias(alias.toLowerCase)
      if (kind == "left") lf.join(F.broadcast(lat), F.lit(true), "left_outer")
      else lf.crossJoin(F.broadcast(lat))
    } else {
      // every outer (key, operand) tuple gets a row (missing groups
      // filled here, so COUNT coalesces apply BEFORE aliasing and
      // qualified refs a.col keep working), then join back
      // null-safely on the tuple. With thetas/generals the inner
      // side joins the DISTINCT tuple table on keys + the full
      // condition first — one aggregation per tuple, never per
      // outer row.
      val gNames = genDefs.map(_._1)
      val tupleNames = keyNames ++ tNames ++ gNames
      val tupleCols = keyPairs.zip(keyNames).map { case ((_, oe), n) =>
        exprToCol(oe, None).as(n) } ++
        thetas.zip(tNames).map { case ((_, _, oe), n) =>
          exprToCol(oe, None).as(n) } ++
        genDefs.map { case (n, oe) => exprToCol(oe, None).as(n) }
      val tuples = lf.select(tupleCols: _*).distinct()
      var grouped =
        if (thetas.isEmpty && gens.isEmpty)
          inner.groupBy(keyPairs.zip(keyNames).map { case ((ik, _), n) =>
            exprToCol(ik, None).as(n) } ++ grpCols: _*)
            .agg(aggCols.head, aggCols.tail: _*)
        else {
          val joinCond =
            (keyPairs.zip(keyNames).map { case ((ik, _), n) =>
              exprToCol(ik, None) === F.col(n) } ++
             thetas.zip(tNames).map { case ((ie, op, _), n) =>
              cmp(op, exprToCol(ie, None), F.col(n)) } ++
             gens.map(exprToCol(_, None))).reduce(_ && _)
          tuples.join(inner, joinCond, "inner")
            .groupBy(tupleNames.map(F.col) ++ grpCols: _*)
            .agg(aggCols.head, aggCols.tail: _*)
        }
      havingSubst.foreach(h => grouped = grouped.filter(exprToCol(h, None)))
      // a general predicate (IS NULL, OR arms) can select rows for a
      // NULL-operand tuple, so the fill join must be NULL-SAFE on the
      // general tuple columns (Spark's name-based join is not).
      // Grouped/HAVING forms skip the fill: a tuple with no surviving
      // groups has ZERO lateral rows, not one NULL row
      val filled =
        if (!fillMissing) grouped
        else if (gens.isEmpty)
          tuples.join(grouped, tupleNames.toSeq, "left_outer")
        else {
          val renamed = grouped.select(grouped.columns.map(c =>
            if (tupleNames.contains(c)) F.col(c).as(c + "__g")
            else F.col(c)): _*)
          tuples.join(renamed,
              tupleNames.map(n => F.col(n) <=> F.col(n + "__g"))
                .reduce(_ && _), "left_outer")
            .drop(tupleNames.map(_ + "__g"): _*)
        }
      val lat = filled.select((tupleNames.map(F.col) ++ items.map {
        case (e, n) => exprToCol(e, None).as(n) }): _*)
        .alias(alias.toLowerCase)
      val cond = (keyPairs.zip(keyNames).map { case ((_, oe), n) =>
        exprToCol(oe, None) <=> F.col(s"${alias.toLowerCase}.$n") } ++
        thetas.zip(tNames).map { case ((_, _, oe), n) =>
          exprToCol(oe, None) <=> F.col(s"${alias.toLowerCase}.$n") } ++
        genDefs.map { case (n, oe) =>
          exprToCol(oe, None) <=> F.col(s"${alias.toLowerCase}.$n")
        }).reduce(_ && _)
      val joinType =
        if (kind == "left" && !fillMissing) "left_outer" else "inner"
      lf.join(lat, cond, joinType).drop(tupleNames: _*)
    }
  }

  /** LATERAL top-n (r5b): `[cross|inner|left] join lateral (select
    * cols from t2 where t2.k = o.k order by s [desc] limit n
    * [offset m]) a` — the per-outer-row top-k shape (latest order per
    * customer, best k matches per query, ...).
    *
    * Lowering (never per-row re-execution): ONE row_number (or, for
    * FETCH ... WITH TIES, rank) window over the inner relation
    * partitioned by the correlation keys picks each group's rows in
    * (offset, offset+limit]; the outer frame then equi-joins the
    * survivors null-safely on the key tuple. One window shuffle on
    * the correlation keys plus one equi-join — the scale-safe
    * top-n-per-group plan (no global sort, no per-row subquery).
    * INNER/CROSS spellings drop outer rows with no inner match; LEFT
    * keeps them with NULL lateral columns — the one place the
    * spelling matters. Uncorrelated subqueries are a global
    * TakeOrdered broadcast instead. */
  private def translateLateralTopN(l: Relation, q: Query,
                                   alias: String,
                                   kind: String): DataFrame = {
    val lf = translateRelation(l)
    val outerAliases = relationAliases(l)
    if (q.sel.items.isEmpty)
      fail("LATERAL subquery needs at least one select item")
    if (q.orderBy.isEmpty || (q.limit.isEmpty && q.offset.isEmpty))
      fail("non-aggregate LATERAL subqueries require ORDER BY ... " +
        "LIMIT n (the deterministic top-n-per-outer-row form)")
    if (q.fetchTies && q.offset.exists(_ > 0))
      fail("LATERAL FETCH ... WITH TIES cannot combine with OFFSET")
    if (q.sel.items.exists(i => containsWindow(i.e)) ||
        q.orderBy.exists(oi => containsWindow(oi.e)))
      fail("window functions inside LATERAL top-n subqueries are " +
        "unsupported (apply them outside the lateral)")
    val outerOnly = outerAliases -- relationAliases(q.sel.from)
    val conjs = q.sel.where.map(splitConjuncts).getOrElse(Nil)
    val (corr, local) = conjs.partition(refersToAliases(_, outerOnly))
    val keyPairs = corr.map { // (inner expr, outer expr)
      case Cmp("=", a, b)
          if refersToAliases(b, outerOnly) && !refersToAliases(a, outerOnly) =>
        (a, b)
      case Cmp("=", a, b)
          if refersToAliases(a, outerOnly) && !refersToAliases(b, outerOnly) =>
        (b, a)
      case other => fail("LATERAL correlation must be equality " +
        s"conjuncts between inner and outer columns, got $other")
    }
    var inner = drainGenHoists(translateRelation(q.sel.from))
    local.reduceOption(And).foreach(p => inner = inner.filter(exprToCol(p, None)))
    // ORDER BY sees the subquery's select aliases (and positions),
    // falling back to inner columns — evaluated PRE-projection so
    // unprojected sort keys work too
    val aliasMap = q.sel.items.flatMap(i =>
      i.alias.map(a => a.toLowerCase -> i.e)).toMap
    def resolveSort(e: Expr): Expr = e match {
      case Star(_) => fail("ORDER BY ALL is unsupported inside LATERAL")
      case NumLit(t) if t.forall(_.isDigit) =>
        val i = t.toInt
        if (i < 1 || i > q.sel.items.length)
          fail(s"LATERAL ORDER BY position $i out of range")
        q.sel.items(i - 1).e
      case ColRef(None, n) if aliasMap.contains(n.toLowerCase) =>
        aliasMap(n.toLowerCase)
      case other => other
    }
    val sortCols = q.orderBy.map(oi =>
      orderedCol(exprToCol(resolveSort(oi.e), None), oi))
    // items project under the lateral alias; a bare * expands to the
    // inner relation's columns (qualified stars: alias-qualify refs)
    val items: Seq[(Expr, String)] = q.sel.items.flatMap { item =>
      item.e match {
        case Star(None) =>
          inner.columns.toSeq.map(c => (ColRef(None, c): Expr, c))
        case Star(Some(_)) =>
          fail("qualified stars inside LATERAL are unsupported " +
            "(use a bare * or name the columns)")
        case e => Seq((e, item.alias.getOrElse(defaultName(e, inner))))
      }
    }
    val off = q.offset.getOrElse(0L)
    if (keyPairs.isEmpty) {
      // uncorrelated: a global top-n is tiny — TakeOrdered + broadcast
      var lat0 = inner.orderBy(sortCols: _*)
      if (off > 0) lat0 = lat0.offset(off.toInt)
      q.limit.foreach(n => lat0 = lat0.limit(n.toInt))
      val lat = lat0.select(items.map { case (e, n) =>
        exprToCol(e, None).as(n) }: _*).alias(alias.toLowerCase)
      if (kind == "left") lf.join(F.broadcast(lat), F.lit(true), "left_outer")
      else lf.crossJoin(F.broadcast(lat))
    } else {
      val keyNames = keyPairs.indices.map(i => s"__lat_k$i")
      val w = Window
        .partitionBy(keyPairs.map(kp => exprToCol(kp._1, None)): _*)
        .orderBy(sortCols: _*)
      val rn = (if (q.fetchTies) F.rank() else F.row_number()).over(w)
      // filter on the MATERIALIZED rank column — filtering on the
      // window expression post-select would re-plan the window over
      // the projected frame, whose partition keys may be dropped
      var keep = F.col("__lat_rn") > F.lit(off)
      q.limit.foreach(n => keep = keep && F.col("__lat_rn") <= F.lit(off + n))
      val lat = inner
        .select((keyPairs.zip(keyNames).map { case ((ik, _), n) =>
          exprToCol(ik, None).as(n) } ++
          items.map { case (e, n) => exprToCol(e, None).as(n) } :+
          rn.as("__lat_rn")): _*)
        .filter(keep).drop("__lat_rn")
        .alias(alias.toLowerCase)
      val cond = keyPairs.zip(keyNames).map { case ((_, oe), n) =>
        exprToCol(oe, None) <=> F.col(s"${alias.toLowerCase}.$n")
      }.reduce(_ && _)
      val joined =
        if (kind == "left") lf.join(lat, cond, "left_outer")
        else lf.join(lat, cond, "inner")
      joined.drop(keyNames: _*)
    }
  }

  /** Lowers a PIVOT aggregate expression — an expression tree over
    * one or more plain aggregates (`round(avg(x), 4)`) — in aggregate
    * context: AggExpr nodes become aggregate Columns, scalar wrappers
    * compose around them. */
  private def lowerPivotAgg(e: Expr): Column = e match {
    case a: AggExpr if a.window.isEmpty => aggColumn(a)
    case FuncCall(n, args) => scalarFunc(n, args.map(lowerPivotAgg), args)
    case Arith(op, l, r) => arith(op, lowerPivotAgg(l), lowerPivotAgg(r))
    case Neg(x) => -lowerPivotAgg(x)
    case Cast(x, t, sf) => castCol(lowerPivotAgg(x), t, sf)
    case Coalesce(args) => F.coalesce(args.map(lowerPivotAgg): _*)
    case Subscript(x, i) => subscriptCol(x, i, lowerPivotAgg)
    case ArraySlice(x, lo, hi) => sliceCol(x, lo, hi, lowerPivotAgg)
    case FieldAccess(x, f0) => lowerPivotAgg(x).getField(f0)
    case NumLit(_) | StrLit(_) | BoolLit(_) | NullLit() => exprToCol(e, None)
    case other => fail(s"unsupported expression in PIVOT aggregate: $other")
  }

  /** graft join-type → Spark join-type string. SEMI/ANTI (r5) filter
    * the left side by match existence — right columns never surface
    * (they lower to the same LeftSemi/LeftAnti plans as EXISTS /
    * NOT EXISTS conjuncts). */
  private def sparkJoinType(t: String): String = t match {
    case "inner" => "inner"
    case "left"  => "left_outer"
    case "right" => "right_outer"
    case "full"  => "full_outer"
    case "semi"  => "left_semi"
    case "anti"  => "left_anti"
    case other   => fail(s"unknown join type $other")
  }

  // ---- select core --------------------------------------------------

  /** Resolves `OVER name` references against the SELECT's WINDOW
    * clause (returns the select with `windows` consumed). Unknown
    * names and definition-to-definition references fail loudly. */
  private def resolveNamedWindows(sel: Select): Select = {
    val defs0 = sel.windows.map { case (n, w) => n.toLowerCase -> w }
    if (defs0.map(_._1).distinct.length != sel.windows.length)
      fail("duplicate WINDOW definition name")
    // window inheritance (PostgreSQL/DuckDB): a spec may name a base
    // window. A bare reference (`OVER w`, `w2 AS (w)`) copies the
    // resolved base verbatim; a reference WITH clauses copies the
    // base's PARTITION BY, may add ORDER BY only if the base has
    // none, may not add its own PARTITION BY, and the base may not
    // carry a frame — the PostgreSQL rules, enforced loudly.
    def merge(base: WindowSpec, child: WindowSpec): WindowSpec = {
      if (child.partitionBy.isEmpty && child.orderBy.isEmpty &&
          child.frame.isEmpty) base
      else {
        if (child.partitionBy.nonEmpty)
          fail("a window referencing another may not add PARTITION BY")
        if (base.orderBy.nonEmpty && child.orderBy.nonEmpty)
          fail("a window referencing another may add ORDER BY only if " +
            "the base has none")
        if (base.frame.isDefined)
          fail("a referenced base window may not carry a frame")
        WindowSpec(base.partitionBy,
          if (child.orderBy.nonEmpty) child.orderBy else base.orderBy,
          child.frame, exclude = child.exclude)
      }
    }
    val resolved = scala.collection.mutable.Map.empty[String, WindowSpec]
    def resolveDef(n: String, seen: Set[String]): WindowSpec =
      resolved.getOrElse(n, {
        if (seen.contains(n))
          fail(s"WINDOW definitions form a cycle through '$n'")
        val raw = defs0.collectFirst { case (k, w) if k == n => w }
          .getOrElse(
            fail(s"unknown window name '$n' (define it in the WINDOW clause)"))
        val r = raw.ref match {
          case Some(b) =>
            merge(resolveDef(b.toLowerCase, seen + n), raw.copy(ref = None))
          case None => raw
        }
        resolved(n) = r; r
      })
    def resolveSpec(w: WindowSpec): WindowSpec = w.ref match {
      case Some(n) => merge(resolveDef(n.toLowerCase, Set.empty),
        w.copy(ref = None))
      case None => w
    }
    def fix(e: Expr): Expr = Ast.transformUp(e) {
      case a: AggExpr if a.window.exists(_.ref.isDefined) =>
        a.copy(window = a.window.map(resolveSpec))
      case RankExpr(d, w) if w.ref.isDefined => RankExpr(d, resolveSpec(w))
      case wf: WinFunc if wf.window.ref.isDefined =>
        wf.copy(window = resolveSpec(wf.window))
    }
    sel.copy(items = sel.items.map(i => i.copy(e = fix(i.e))),
      having = sel.having.map(fix), qualify = sel.qualify.map(fix),
      windows = Nil)
  }

  /** The select's source frame, exposed for best-effort STATIC TYPE
    * resolution (the DISTINCT window fold picks its accumulator type
    * from it — r8). Saved/restored around each select so nested
    * subquery translations can't clobber the outer frame. */
  private var resolveFrame: Option[DataFrame] = None

  private def translateSelect(sel00: Select): DataFrame = {
    val saved = resolveFrame
    try translateSelectImpl(sel00) finally resolveFrame = saved
  }

  private def translateSelectImpl(sel00: Select): DataFrame = {
    val sel0 = resolveNamedWindows(sel00)
    val from0 = translateRelation(sel0.from)
    // COLUMNS(*) / COLUMNS('regex') expansion (r11c, DuckDB) — needs
    // the FROM schema, so it runs here, before item classification:
    // expanded aggregates reach translateAggregate as real aggregates
    val sel = expandColumnsItems(sel0, from0.columns.toSeq)
    resolveFrame = Some(from0)

    // IN (subquery) in WHERE must become a join (Catalyst has no
    // scalar IN-subquery expression reachable from the public Column
    // API). Top-level AND conjuncts lower to semi/anti joins — the
    // cheapest shape. IN-subqueries in other boolean positions (under
    // OR, nested NOT, comparisons — reference sql.lark:118-130 allows
    // them anywhere a comparison goes) lower to an existence-flag
    // left_outer join against the distinct key set plus a broadcast
    // 1-row summary, reproducing SQL's three-valued IN semantics
    // (TRUE on match; FALSE on no-match against a null-free set or an
    // empty set; NULL when the probe is null or the set has nulls).
    var from = from0
    var helperCols = List.empty[String]

    val outerAliasesPre = relationAliases(sel.from)

    // Scalar subqueries (SELECT / WHERE / GROUP BY / HAVING positions).
    //
    // Uncorrelated: hoist to a broadcast 1-row cross join and
    // substitute the materialized column (must produce a single row —
    // the standard scalar-subquery contract).
    //
    // Correlated aggregate form — `(select AGG-expr from t WHERE t.k =
    // outer.k [and local...] [GROUP BY ...])` — decorrelates
    // classically: group the inner relation by its correlation keys
    // (plus any inner GROUP BY keys), left_outer join the grouped
    // result on the correlation keys, and read the aggregate
    // expression. The select item may be any expression over one or
    // more aggregates (`max(x) - min(x)`). Missing groups yield NULL
    // (SQL's aggregate-over-empty), except ungrouped COUNT which
    // coalesces to 0 — with an inner GROUP BY an empty correlation
    // group returns zero ROWS, so even COUNT reads NULL. An inner
    // GROUP BY that leaves >1 row in some evaluated correlation group
    // raises the standard more-than-one-row error at runtime (window
    // count over the correlation keys + raise_error). Outer refs must
    // be alias-qualified; every correlated conjunct must be an
    // equality.
    def hoistScalars(e: Expr): Expr =
      Ast.transformUp(e) { case ScalarSubquery(sub) =>
        // standard SQL shadowing: an inner relation with the same
        // name/alias as an outer one hides it, so only qualifiers NOT
        // re-introduced by the subquery's own FROM count as outer refs
        def outerOnly(q: Query): Set[String] =
          outerAliasesPre -- relationAliases(q.sel.from)
        val corrForm = sub match {
          case Leaf(q) if q.sel.groupMode == "plain" &&
              q.sel.groupSets.isEmpty &&
              q.sel.qualify.isEmpty &&
              (!q.sel.distinct || q.sel.groupBy.isEmpty) &&
              q.limit.isEmpty && q.offset.isEmpty && q.sel.items.length == 1 &&
              containsAgg(q.sel.items.head.e) &&
              q.sel.where.exists(w =>
                splitConjuncts(w).exists(refersToAliases(_, outerOnly(q)))) =>
            Some(q)
          case _ => None
        }
        corrForm match {
          case Some(q) =>
            val outerRefs = outerOnly(q)
            val idx = helperCols.size
            // theta conjuncts (any number) decorrelate for plain
            // aggregates AND (r5b) for inner GROUP BY/HAVING — the
            // "aggregate over earlier/smaller rows" shape in both
            // grouped and ungrouped forms
            val (keyPairs, thetas, gens, genDefs, local) = corrSplitG(q,
              outerRefs, "scalar subquery", allowTheta = true,
              Some(s"__csq_${idx}_ge"))
            var inner = drainGenHoists(translateRelation(q.sel.from))
            local.reduceOption(And).foreach(p =>
              inner = inner.filter(exprToCol(p, None)))
            val keyNames = keyPairs.indices.map(i => s"__csq_${idx}_k$i")
            val innerKeys = q.sel.groupBy
            val gNames = innerKeys.indices.map(j => s"__csq_${idx}_g$j")
            // every aggregate node in the item (and the subquery's
            // HAVING) becomes one agg column; the item expression is
            // rebuilt over the post-join refs, HAVING filters the
            // grouped frame BEFORE the join (so filtered-out groups
            // read NULL — zero subquery rows — even for COUNT)
            var aggs = Vector.empty[(String, AggExpr)]
            def aggRef(a: AggExpr): String =
              aggs.find(_._2 == a).map(_._1).getOrElse {
                val nn = s"__csq_${idx}_a${aggs.size}"
                aggs :+= (nn -> a); nn
              }
            val substituted = Ast.transformUp(q.sel.items.head.e) {
              case a: AggExpr if a.window.isEmpty =>
                val n = aggRef(a)
                if (a.func == "count" && innerKeys.isEmpty &&
                    q.sel.having.isEmpty)
                  Coalesce(Seq(ColRef(None, n), NumLit("0")))
                else ColRef(None, n)
            }
            // HAVING: aggregates map to agg columns; bare refs that
            // structurally match a group key read its grouped column
            val havingSubst: Option[Expr] = q.sel.having.map { h =>
              Ast.transformUp(h) {
                case a: AggExpr if a.window.isEmpty =>
                  ColRef(None, aggRef(a))
                case c: ColRef
                    if (keyPairs.map(_._1) ++ innerKeys)
                      .exists(k => sameExpr(k, c)) =>
                  val all = keyPairs.map(_._1).zip(keyNames) ++
                    innerKeys.zip(gNames)
                  ColRef(None, all.find(t => sameExpr(t._1, c)).get._2)
              }
            }
            if (aggs.isEmpty)
              fail("correlated scalar subquery needs at least one aggregate")
            val grpCols = keyPairs.zip(keyNames).map { case ((ik, _), n) =>
              exprToCol(ik, None).as(n)
            } ++ innerKeys.zip(gNames).map { case (g, n) =>
              exprToCol(g, None).as(n)
            }
            val aggCols = aggs.map { case (n, a) => aggColumn(a).as(n) }
            // r13 (VERDICT r12 #4) widens the r10 fusion beyond the
            // plain shape to the two next-simplest ones, both provably
            // single-group per outer row:
            //  - inner GROUP BY where every key structurally matches a
            //    correlation equality key (grouping adds nothing but
            //    the zero-rows ⟹ NULL-even-for-COUNT contract);
            //  - GROUP-BY-less HAVING whose predicate reads only
            //    aggregates (evaluated over the same window columns).
            // Both reproduce the generic tuple path's semantics
            // exactly — including its empty-selected-set ⟹ NULL rule —
            // via the __gc inner-row count below; the grouped-theta
            // fuzz suites (seeds 113/89) differential-pin the results.
            val innerKeysFusable = innerKeys.isEmpty ||
              innerKeys.forall(g => keyPairs.exists(kp => sameExpr(kp._1, g)))
            val havingAggOnly = q.sel.having.forall { h =>
              var bare = false
              Ast.transformUp(Ast.transformUp(h) {
                case a: AggExpr if a.window.isEmpty => NumLit("0")
              }) { case c: ColRef => bare = true; c }
              !bare
            }
            val fusable = thetas.length == 1 && gens.isEmpty &&
              innerKeysFusable && havingAggOnly &&
              keyPairs.nonEmpty &&
              Set("<", "<=", ">", ">=").contains(thetas.head._2) &&
              aggs.forall { case (_, a) =>
                Set("count", "sum", "min", "max", "avg").contains(a.func) &&
                  !a.distinct && a.aggOrder.isEmpty && a.extraArgs.isEmpty } &&
              // the union re-selects every outer column by name — a
              // self-joined outer frame with duplicate names keeps
              // the tuple path
              from.columns.map(_.toLowerCase).distinct.length ==
                from.columns.length
            if (fusable) {
                // single-theta running-aggregate fusion (r10, VERDICT
                // r9 #7 — the asof joinless pattern): instead of
                // distinct-tuples → join → groupBy → join-back, UNION
                // the outer rows (marker 0, the theta operand as the
                // sort value) with the inner rows (marker 1, the
                // theta expression), window-partition by the
                // correlation keys ordered by value, and read each
                // outer row's aggregate as a running window aggregate
                // over ROWS UNBOUNDED PRECEDING..CURRENT — the frame
                // IS the theta-selected set when equal values
                // tie-break by marker (strict op: outer first among
                // equals; inclusive: outer last) and '>' ops sort
                // DESC. ONE key exchange total; no distinct, no
                // grouped summary, no back-join. Inner rows with a
                // NULL value or NULL key never satisfy the SQL
                // predicate — filtered before the union; outer rows
                // with a NULL operand sort nulls-FIRST, so their
                // frame is empty — exactly aggregate-over-empty.
                val (ie, op, oe) = thetas.head
                val ukN = keyPairs.indices.map(j => s"__csq_${idx}_uk$j")
                val valN = s"__csq_${idx}_val"; val mN = s"__csq_${idx}_m"
                val argNs = aggs.indices.map(j => s"__csq_${idx}_w$j")
                val iProj0 = inner.select(
                  keyPairs.zip(ukN).map { case ((ik, _), n) =>
                    exprToCol(ik, None).as(n) } ++
                  Seq(exprToCol(ie, None).as(valN)) ++
                  aggs.zip(argNs).map { case ((_, a), n) =>
                    (a.arg match {
                      case Star(_) => F.lit(1L) // count(*): inner markers
                      case e2      => exprToCol(e2, None)
                    }).as(n) }: _*)
                val iProj = (F.col(valN).isNotNull +: ukN.map(n =>
                  F.col(n).isNotNull)).reduce(_ && _) match {
                  case c => iProj0.filter(c)
                }
                val iTypes = iProj.schema.fields
                  .map(f => f.name -> f.dataType).toMap
                val oSide = from.select(
                  from.columns.toSeq.map(F.col) ++
                  keyPairs.zip(ukN).map { case ((_, ok), n) =>
                    exprToCol(ok, None).as(n) } ++
                  Seq(exprToCol(oe, None).as(valN), F.lit(0).as(mN)) ++
                  argNs.map(n => F.lit(null).cast(iTypes(n)).as(n)): _*)
                val iSide = iProj.select(
                  from.schema.fields.toSeq.map(f =>
                    F.lit(null).cast(f.dataType).as(f.name)) ++
                  ukN.map(F.col) ++
                  Seq(F.col(valN), F.lit(1).as(mN)) ++
                  argNs.map(F.col): _*)
                val strict = op == "<" || op == ">"
                val descending = op == ">" || op == ">="
                val ord = Seq(
                  if (descending) F.col(valN).desc_nulls_first
                  else F.col(valN).asc_nulls_first,
                  if (strict) F.col(mN).asc else F.col(mN).desc)
                val w = Window.partitionBy(ukN.map(F.col): _*)
                  .orderBy(ord: _*)
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                // raw window aggregates first; the public agg names
                // are produced by the wrap projection below (grouped /
                // HAVING shapes read NULL where the generic path's
                // zero-group join-miss did)
                val rawNs = aggs.indices.map(j => s"__csq_${idx}_r$j")
                val aggColsW = aggs.zip(argNs).zip(rawNs).map {
                  case (((_, a), n), rn) =>
                    val c = a.func match {
                      case "count" => F.count(F.col(n))
                      case "sum"   => F.sum(F.col(n))
                      case "min"   => F.min(F.col(n))
                      case "max"   => F.max(F.col(n))
                      case "avg"   => F.avg(F.col(n))
                    }
                    c.over(w).as(rn)
                }
                // grouped / HAVING shapes: an EMPTY theta-selected set
                // yields zero inner groups, so every aggregate —
                // including COUNT — must read NULL, exactly as the
                // generic path's join-miss does; __gc counts the
                // frame's INNER rows to detect it. HAVING evaluates
                // over the raw window aggregates and NULLs the values
                // of failing groups (zero surviving rows).
                val needGc = innerKeys.nonEmpty || q.sel.having.nonEmpty
                val gcN = s"__csq_${idx}_gc"
                val gcCol =
                  if (needGc)
                    Seq(F.count(F.when(F.col(mN) === 1, F.lit(1)))
                      .over(w).as(gcN))
                  else Nil
                val unioned = oSide.union(iSide)
                val winFrame = unioned
                  .select(unioned.columns.toSeq.map(F.col) ++
                    aggColsW ++ gcCol: _*)
                  .filter(F.col(mN) === 0)
                val hCond = havingSubst.map { h =>
                  exprToCol(Ast.transformUp(h) {
                    case c @ ColRef(None, n) =>
                      val i = aggs.indexWhere(_._1 == n)
                      if (i >= 0) ColRef(None, rawNs(i)) else c
                  }, None)
                }
                val finalAggCols = aggs.map(_._1).zip(rawNs).map {
                  case (n0, rn) =>
                    var c: org.apache.spark.sql.Column = F.col(rn)
                    hCond.foreach(hc => c = F.when(hc, c))
                    if (needGc) c = F.when(F.col(gcN) > 0, c)
                    c.as(n0)
                }
                from = winFrame.select(
                  winFrame.columns.toSeq.map(F.col) ++ finalAggCols: _*)
                helperCols = aggs.map(_._1).toList ::: rawNs.toList :::
                  gcN :: valN :: mN ::
                  (ukN.toList ::: argNs.toList ::: helperCols)
                substituted // ≤1 group per outer row by construction:
                            // no >1-row guard needed
            } else if (thetas.nonEmpty || gens.nonEmpty) {
                // theta / general scalar: the aggregated set depends
                // on the outer operand(s), so aggregate per DISTINCT
                // outer (keys, operands) tuple — a join on the
                // correlation keys carrying every theta comparison
                // and (r5c) every general correlated predicate
                // (correlation under OR/NOT, mixed-side comparisons)
                // as residual condition — then join back on the
                // tuple. One row per tuple, no outer-row
                // multiplication; sound for ANY condition (it
                // evaluates row-by-row inside the join).
                val tNs = thetas.indices.map(j => s"__csq_${idx}_t$j")
                val gNs = genDefs.map(_._1)
                val okCols = keyPairs.zip(keyNames).map { case ((_, ok), n) =>
                  exprToCol(ok, None).as(n) }
                val tuples = from
                  .select(okCols ++
                    thetas.zip(tNs).map { case ((_, _, oe), n) =>
                      exprToCol(oe, None).as(n) } ++
                    genDefs.map { case (n, oe) =>
                      exprToCol(oe, None).as(n) }: _*)
                  .distinct()
                val joinCond =
                  (keyPairs.zip(keyNames).map { case ((ik, _), n) =>
                    exprToCol(ik, None) === F.col(n) } ++
                   thetas.zip(tNs).map { case ((ie, op, _), n) =>
                    cmp(op, exprToCol(ie, None), F.col(n)) } ++
                   gens.map(exprToCol(_, None))).reduce(_ && _)
                // inner GROUP BY keys (r5b) extend the tuple grouping;
                // HAVING filters groups BEFORE the join back, and more
                // than one surviving group per tuple is the standard
                // loud runtime error (window count + raise_error)
                var grouped = tuples.join(inner, joinCond, "inner")
                  .groupBy((keyNames ++ tNs ++ gNs).map(F.col) ++
                    innerKeys.zip(gNames).map { case (g, n) =>
                      exprToCol(g, None).as(n) }: _*)
                  .agg(aggCols.head, aggCols.tail: _*)
                havingSubst.foreach(h =>
                  grouped = grouped.filter(exprToCol(h, None)))
                val cntN = s"__csq_${idx}_c"
                val guarded: Expr =
                  if (innerKeys.isEmpty) substituted
                  else {
                    grouped = grouped.withColumn(cntN,
                      F.count(F.lit(1)).over(
                        Window.partitionBy(
                          (keyNames ++ tNs ++ gNs).map(F.col): _*)))
                    CaseWhen(Seq((Cmp(">", ColRef(None, cntN), NumLit("1")),
                      FuncCall("raise_error", Seq(StrLit(
                        "scalar subquery returned more than one row"))))),
                      substituted)
                  }
                // general tuple columns join back NULL-SAFELY: unlike
                // pure comparisons, a general predicate (IS NULL, OR
                // arms) can select rows for a NULL operand tuple, and
                // that tuple's aggregate must reach its outer rows
                val backCond =
                  (keyPairs.zip(keyNames).map { case ((_, ok), n) =>
                    exprToCol(ok, None) === F.col(n) } ++
                   thetas.zip(tNs).map { case ((_, _, oe), n) =>
                    exprToCol(oe, None) === F.col(n) } ++
                   genDefs.map { case (n, oe) =>
                    exprToCol(oe, None) <=> F.col(n) }).reduce(_ && _)
                from = from.join(grouped, backCond, "left_outer")
                helperCols = aggs.map(_._1).toList ::: cntN ::
                  (tNs.toList ::: gNs.toList ::: keyNames.toList :::
                    gNames.toList ::: helperCols)
                guarded
            } else {
                var grouped = inner.groupBy(grpCols: _*)
                  .agg(aggCols.head, aggCols.tail: _*)
                havingSubst.foreach(h =>
                  grouped = grouped.filter(exprToCol(h, None)))
                val cntN = s"__csq_${idx}_c"
                val guarded: Expr =
                  if (innerKeys.isEmpty) substituted
                  else {
                    grouped = grouped.withColumn(cntN,
                      F.count(F.lit(1)).over(
                        Window.partitionBy(keyNames.map(F.col): _*)))
                    CaseWhen(Seq((Cmp(">", ColRef(None, cntN), NumLit("1")),
                      FuncCall("raise_error", Seq(StrLit(
                        "scalar subquery returned more than one row"))))),
                      substituted)
                  }
                val cond = keyPairs.zip(keyNames).map { case ((_, ok), n) =>
                  exprToCol(ok, None) === F.col(n)
                }.reduce(_ && _)
                from = from.join(grouped, cond, "left_outer")
                helperCols = aggs.map(_._1).toList ::: cntN ::
                  (keyNames.toList ::: gNames.toList ::: helperCols)
                guarded
            }
          case None =>
            val subDf = translate(sub)
            if (subDf.columns.length != 1)
              fail("scalar subquery requires a single-column subquery")
            val n = s"__ssq_${helperCols.size}"
            // collapse to exactly ONE row before the cross join: 0 rows
            // must yield NULL (not eliminate every outer row) and >1
            // rows must be a loud runtime error (not row multiplication)
            // — the standard scalar-subquery contract. Rename
            // positionally first: an unaliased expression item's
            // generated name can contain dots, which F.col would
            // parse as field access.
            val one = subDf.toDF("__v0")
              .agg(F.first(F.col("__v0")).as("__v"),
                F.count(F.lit(1)).as("__c"))
              .select(
                F.when(F.col("__c") > 1, F.raise_error(F.lit(
                  "scalar subquery returned more than one row")))
                  .otherwise(F.col("__v")).as(n))
            from = from.crossJoin(F.broadcast(one))
            helperCols = n :: helperCols
            ColRef(None, n)
        }
      }
    // GROUP-BY-less HAVING EXISTS rewrites FIRST (it introduces the
    // scalar-subquery guard hoistScalars then materializes)
    def preHoist(e: Expr): Expr =
      hoistScalars(rewriteHavingOnlyExists(e, outerAliasesPre))
    val selScalars0 = sel.copy(
      items = sel.items.map(i => i.copy(e = preHoist(i.e))),
      where = sel.where.map(preHoist),
      groupBy = sel.groupBy.map(hoistScalars),
      having = sel.having.map(hoistScalars),
      qualify = sel.qualify.map(preHoist))

    // QUALIFY (post-window filter): the WHOLE predicate hoists to ONE
    // hidden boolean select item — windows AND plain input columns
    // both evaluate on the pre-projection frame (so a predicate may
    // reference input columns the SELECT list drops, like DuckDB) —
    // and the projected result filters on that column, before
    // DISTINCT. Select-item aliases substitute their expressions
    // first (shadowed by real input columns, the GROUP BY/HAVING
    // guard). Standard QUALIFY evaluation order:
    // FROM→WHERE→GROUP/HAVING→window→QUALIFY→DISTINCT→ORDER.
    var qualifyHidden = List.empty[String]
    val (qualifyExpr, selScalars) = selScalars0.qualify match {
      case Some(q0) =>
        val aliasMap = selScalars0.items.collect {
          case SelectItem(e, Some(a)) => a.toLowerCase -> e
        }.toMap
        val substituted = Ast.transformUp(q0) {
          case ColRef(None, n) if aliasMap.contains(n.toLowerCase) &&
              !from.columns.exists(_.equalsIgnoreCase(n)) =>
            aliasMap(n.toLowerCase)
        }
        val n = "__qw_0"
        qualifyHidden = n :: Nil
        (Some(ColRef(None, n): Expr),
          selScalars0.copy(items =
            selScalars0.items :+ SelectItem(substituted, Some(n))))
      case None => (None, selScalars0)
    }

    val outerAliases = relationAliases(sel.from)

    // [NOT] IN / EXISTS as a VALUE (non-conjunct boolean positions:
    // under OR/NOT in WHERE, and SELECT-item projections): rewrite
    // each subquery node to an existence-flag column joined onto
    // `from`. Shared by the WHERE residual above and the select-item
    // pass below; the monotone counter keeps helper names unique
    // across both.
    lazy val lowerBoolFlags: Expr => Expr = {
      var flagIdx = helperCols.size
      def freshIdx(): Int = { val i = flagIdx; flagIdx += 1; i }
      (expr0: Expr) =>
        Ast.transformUp(expr0) {
          case InSubquery(e: RowTuple, sub0) =>
            // r9: tuple IN in arbitrary boolean position (under OR,
            // projected, NOT ...) — full 3VL as a flag. Lowering is
            // the distinct-outer-tuple pattern: the DISTINCT probe
            // tuples join the subquery on the "comparison not
            // strictly false" condition (every pair equal-or-either-
            // null), aggregate match/not-false marks per tuple, and
            // join back null-safely — no outer-row multiplication;
            // the tuple×sub join is the inherent cost of composite
            // 3VL (null arms defeat hash keys). r10 closes the last
            // 36bi wall: CORRELATED tuple IN routes through the same
            // distinct-outer-tuple machinery, the tuple widened by
            // the correlation operands (the 36n flag pattern with a
            // composite probe).
            val sub = degroupCorrSub(sub0, outerAliases, forExists = false)
            val ps = e.items.map(exprToCol(_, None))
            if (setExprRefers(sub, outerAliases)) {
              // correlated composite probe (r10): the subquery must be
              // a plain FROM/WHERE select of matching arity
              val q = sub match {
                case Leaf(q0) if q0.sel.groupBy.isEmpty &&
                    q0.sel.having.isEmpty && q0.sel.qualify.isEmpty &&
                    q0.limit.isEmpty && q0.offset.isEmpty &&
                    q0.sel.items.length == ps.length =>
                  q0
                case _ => fail("correlated row-value IN supports plain " +
                  "FROM/WHERE subqueries of matching arity only")
              }
              val outerRefs = outerAliases -- relationAliases(q.sel.from)
              val i = freshIdx()
              val flagN = s"__sq_flag_$i"
              val markN = s"__sq_mark_$i"; val grpN = s"__sq_grp_$i"
              val (keyPairs, thetas, gens, genDefs, local) =
                corrSplitG(q, outerRefs, "IN", allowTheta = true,
                  Some(s"__sq_ge_${i}_"))
              var inner = drainGenHoists(translateRelation(q.sel.from))
              local.reduceOption(And).foreach(p =>
                inner = inner.filter(exprToCol(p, None)))
              val probeNs = ps.indices.map(j => s"__sq_tp_${i}_$j")
              val okN = keyPairs.indices.map(j => s"__sq_ok_${i}_$j")
              val tNs = thetas.indices.map(j => s"__sq_tu_${i}_$j")
              val gNs = genDefs.map(_._1)
              val tuples = from.select(
                (ps.zip(probeNs).map { case (p, n) => p.as(n) } ++
                 keyPairs.zip(okN).map { case ((_, ok), n) =>
                   exprToCol(ok, None).as(n) } ++
                 thetas.zip(tNs).map { case ((_, _, oe), n) =>
                   exprToCol(oe, None).as(n) } ++
                 genDefs.map { case (n, oe) =>
                   exprToCol(oe, None).as(n) }): _*).distinct()
              val keyCs = q.sel.items.map(it => exprToCol(it.e, None))
              // join admits correlation-group rows whose composite
              // comparison is NOT STRICTLY FALSE; strictly-false-only
              // and empty groups both land on the FALSE arm via the
              // missing group row — exactly the uncorrelated 3VL
              val notFalse = ps.indices.map { j =>
                keyCs(j) === F.col(probeNs(j)) ||
                  keyCs(j).isNull || F.col(probeNs(j)).isNull
              }.reduce(_ && _)
              val joinCond =
                (keyPairs.zip(okN).map { case ((ik, _), n) =>
                   exprToCol(ik, None) === F.col(n) } ++
                 thetas.zip(tNs).map { case ((ie, op, _), n) =>
                   cmp(op, exprToCol(ie, None), F.col(n)) } ++
                 gens.map(exprToCol(_, None)))
                  .foldLeft(notFalse)(_ && _)
              val grouped = tuples.join(inner, joinCond, "inner")
                .groupBy((probeNs ++ okN ++ tNs ++ gNs).map(F.col): _*)
                .agg(F.max(F.coalesce(
                  ps.indices.map(j => keyCs(j) === F.col(probeNs(j)))
                    .reduce(_ && _),
                  F.lit(false))).as(markN))
                .withColumn(grpN, F.lit(true))
              val backCond =
                (ps.zip(probeNs).map { case (p, n) => p <=> F.col(n) } ++
                 keyPairs.zip(okN).map { case ((_, ok), n) =>
                   exprToCol(ok, None) <=> F.col(n) } ++
                 thetas.zip(tNs).map { case ((_, _, oe), n) =>
                   exprToCol(oe, None) <=> F.col(n) } ++
                 genDefs.map { case (n, oe) =>
                   exprToCol(oe, None) <=> F.col(n) }).reduce(_ && _)
              from = from.join(grouped, backCond, "left_outer")
                .withColumn(flagN,
                  F.when(F.col(markN) <=> F.lit(true), F.lit(true))
                    .when(F.col(grpN).isNull, F.lit(false))
                    .otherwise(F.lit(null).cast(BooleanType)))
              helperCols = flagN :: markN :: grpN ::
                (probeNs.toList ::: okN.toList ::: tNs.toList :::
                  gNs.toList ::: helperCols)
              ColRef(None, flagN)
            } else {
            val subDf0 = translate(sub)
            if (subDf0.columns.length != ps.length)
              fail(s"IN (subquery) requires a ${ps.length}-column " +
                s"subquery to match the probe, got " +
                s"${subDf0.columns.length}")
            val i = freshIdx()
            val flagN = s"__sq_flag_$i"
            val markN = s"__sq_mark_$i"; val nfN = s"__sq_nf_$i"
            val probeNs = ps.indices.map(j => s"__sq_tp_${i}_$j")
            val keyNs = ps.indices.map(j => s"__sq_tk_${i}_$j")
            val keyed = subDf0.toDF(keyNs: _*)
            val tuples = from.select(ps.zip(probeNs).map { case (p, n) =>
              p.as(n) }: _*).distinct()
            val grouped = tuples.join(keyed,
                probeNs.zip(keyNs).map { case (n, k) =>
                  F.col(n) === F.col(k) || F.col(n).isNull ||
                    F.col(k).isNull }.reduce(_ && _), "inner")
              .groupBy(probeNs.map(F.col): _*)
              .agg(F.max(F.coalesce(
                probeNs.zip(keyNs).map { case (n, k) =>
                  F.col(n) === F.col(k) }.reduce(_ && _),
                F.lit(false))).as(markN))
              .withColumn(nfN, F.lit(true))
            from = from.join(grouped,
                ps.zip(probeNs).map { case (p, n) => p <=> F.col(n) }
                  .reduce(_ && _), "left_outer")
              .withColumn(flagN,
                F.when(F.col(markN) <=> F.lit(true), F.lit(true))
                  .when(F.col(nfN).isNull, F.lit(false)) // incl. empty set
                  .otherwise(F.lit(null).cast(BooleanType)))
            helperCols = flagN :: markN :: nfN ::
              (probeNs.toList ::: helperCols)
            ColRef(None, flagN)
            }
          case InSubquery(e, sub0) =>
            val sub = degroupCorrSub(sub0, outerAliases, forExists = false)
            val probe = exprToCol(e, None)
            val i = freshIdx()
            val flagN = s"__sq_flag_$i"
            val corrForm = sub match {
              case Leaf(q) if q.sel.groupBy.isEmpty && q.sel.having.isEmpty &&
                  q.sel.qualify.isEmpty &&
                  q.limit.isEmpty && q.offset.isEmpty &&
                  q.sel.items.length == 1 &&
                  q.sel.where.exists(w => splitConjuncts(w).exists(
                    refersToAliases(_, outerAliases -- relationAliases(q.sel.from)))) =>
                Some(q)
              case _ => None
            }
            corrForm match {
              case Some(q) =>
                // correlated IN in arbitrary boolean position: per-
                // correlation-group existence flag with full 3VL —
                // TRUE on match; FALSE when the group is empty; NULL
                // when the probe is null or the group has a null key.
                // Two narrow key-shuffled left_outer joins (group
                // summary + distinct match keys), no row multiplication.
                //
                // With a range (theta) conjunct, each arm carries the
                // per-group min/max of the inner range expression
                // (`∃ t < x ⟺ min(t) < x`): match iff the probe's key
                // group has a theta-satisfying row, nonempty iff the
                // correlation group does, null-key iff a null-keyed
                // row does — the same 3VL table, evaluated against
                // the outer side after the join.
                val outerRefs = outerAliases -- relationAliases(q.sel.from)
                val (keyPairs, thetas, gens, genDefs, local) =
                  corrSplitG(q, outerRefs, "IN", allowTheta = true,
                    Some(s"__sq_ge_${i}_"))
                var inner = drainGenHoists(translateRelation(q.sel.from))
                local.reduceOption(And).foreach(p =>
                  inner = inner.filter(exprToCol(p, None)))
                val keyN = s"__sq_key_$i"; val markN = s"__sq_mark_$i"
                val grpN = s"__sq_grp_$i"; val nullN = s"__sq_null_$i"
                if (gens.nonEmpty || thetas.length >= 2) {
                  // JOINT theta condition, or a GENERAL correlated
                  // predicate (r5c: correlation under OR/NOT, mixed-
                  // side comparisons): per-group min/max cannot
                  // decompose these, so switch to the distinct-outer-
                  // tuple lowering — aggregate the 3VL arms per
                  // DISTINCT (probe, keys, operands) tuple over a
                  // join carrying the FULL condition, then join back
                  // on the tuple. |tuples| ≤ |outer| rows ever
                  // shuffle; no outer-row multiplication.
                  val probeT = s"__sq_tp_$i"
                  val okN = keyPairs.indices.map(j => s"__sq_ok_${i}_$j")
                  val tNs = thetas.indices.map(j => s"__sq_tu_${i}_$j")
                  val gNs = genDefs.map(_._1)
                  val tuples = from.select(
                    probe.as(probeT) +:
                      (keyPairs.zip(okN).map { case ((_, ok), n) =>
                        exprToCol(ok, None).as(n) } ++
                       thetas.zip(tNs).map { case ((_, _, oe), n) =>
                        exprToCol(oe, None).as(n) } ++
                       genDefs.map { case (n, oe) =>
                        exprToCol(oe, None).as(n) }): _*).distinct()
                  val joinCond =
                    (keyPairs.zip(okN).map { case ((ik, _), n) =>
                      exprToCol(ik, None) === F.col(n) } ++
                     thetas.zip(tNs).map { case ((ie, op, _), n) =>
                      cmp(op, exprToCol(ie, None), F.col(n)) } ++
                     gens.map(exprToCol(_, None))).reduce(_ && _)
                  val keyC = exprToCol(q.sel.items.head.e, None)
                  val grouped = tuples.join(inner, joinCond, "inner")
                    .groupBy((probeT +: (okN ++ tNs ++ gNs)).map(F.col): _*)
                    .agg(
                      F.max(F.coalesce(keyC === F.col(probeT), F.lit(false)))
                        .as(markN),
                      F.max(keyC.isNull).as(nullN))
                    .withColumn(grpN, F.lit(true))
                  val backCond =
                    ((probe <=> F.col(probeT)) +:
                      (keyPairs.zip(okN).map { case ((_, ok), n) =>
                        exprToCol(ok, None) <=> F.col(n) } ++
                       thetas.zip(tNs).map { case ((_, _, oe), n) =>
                        exprToCol(oe, None) <=> F.col(n) } ++
                       genDefs.map { case (n, oe) =>
                        exprToCol(oe, None) <=> F.col(n) })).reduce(_ && _)
                  from = from.join(grouped, backCond, "left_outer")
                    .withColumn(flagN,
                      F.when(F.col(markN) <=> F.lit(true), F.lit(true))
                        .when(F.col(grpN).isNull, F.lit(false))
                        .when(probe.isNull || F.col(nullN),
                          F.lit(null).cast(BooleanType))
                        .otherwise(F.lit(false)))
                  helperCols = flagN :: markN :: grpN :: nullN :: probeT ::
                    (okN.toList ::: tNs.toList ::: gNs.toList ::: helperCols)
                } else {
                val theta = thetas.headOption
                val ckS = keyPairs.indices.map(j => s"__sq_cs_${i}_$j")
                val ckK = keyPairs.indices.map(j => s"__sq_ck_${i}_$j")
                val thetaCols = theta.map { case (ie, _, _) =>
                  exprToCol(ie, None) }.toSeq
                val keyed = inner.select(
                  exprToCol(q.sel.items.head.e, None).as(keyN) +:
                    (keyPairs.zip(ckS).map { case ((ik, _), n) =>
                      exprToCol(ik, None).as(n) } ++
                     thetaCols.map(_.as(s"__sq_t_$i"))): _*)
                val sumCond = keyPairs.zip(ckS).map { case ((_, ok), n) =>
                  exprToCol(ok, None) === F.col(n) }
                  .reduceOption(_ && _).getOrElse(F.lit(true))
                val keyCond = keyPairs.zip(ckK).map { case ((_, ok), n) =>
                  exprToCol(ok, None) === F.col(n)
                }.foldLeft(probe === F.col(keyN))(_ && _)
                theta match {
                  case None =>
                    val summary = keyed
                      .groupBy(ckS.map(F.col): _*)
                      .agg(F.coalesce(F.max(F.col(keyN).isNull), F.lit(false)).as(nullN))
                      .withColumn(grpN, F.lit(true))
                    val keys = keyed.filter(F.col(keyN).isNotNull).distinct()
                      .withColumn(markN, F.lit(true))
                      .select(F.col(keyN) +: F.col(markN) +:
                        ckS.zip(ckK).map { case (s, k) => F.col(s).as(k) }: _*)
                    from = from
                      .join(summary, sumCond, "left_outer")
                      .join(keys, keyCond, "left_outer")
                      .withColumn(flagN,
                        F.when(F.col(markN).isNotNull, F.lit(true))
                          .when(F.col(grpN).isNull, F.lit(false))
                          .when(probe.isNull || F.col(nullN),
                            F.lit(null).cast(BooleanType))
                          .otherwise(F.lit(false)))
                    helperCols = flagN :: markN :: grpN :: nullN :: keyN ::
                      (ckS.toList ::: ckK.toList ::: helperCols)
                  case Some((_, op, oe)) =>
                    val t = F.col(s"__sq_t_$i")
                    val allDefs = thetaAggCols(t, op, s"__sq_tall_$i")
                    val nulDefs = thetaAggCols(
                      F.when(F.col(keyN).isNull, t), op, s"__sq_tnull_$i")
                    val matDefs = thetaAggCols(t, op, s"__sq_tmatch_$i")
                    val sumAggs = allDefs ++ nulDefs
                    val summary = keyed
                      .groupBy(ckS.map(F.col): _*)
                      .agg(sumAggs.head._2.as(sumAggs.head._1),
                        sumAggs.tail.map { case (n, c) => c.as(n) }: _*)
                      .withColumn(grpN, F.lit(true))
                    val keys = keyed.filter(F.col(keyN).isNotNull)
                      .groupBy((F.col(keyN) +: ckS.map(F.col)): _*)
                      .agg(matDefs.head._2.as(matDefs.head._1),
                        matDefs.tail.map { case (n, c) => c.as(n) }: _*)
                      .withColumn(markN, F.lit(true))
                      .select(F.col(keyN) +: F.col(markN) +:
                        (matDefs.map(d => F.col(d._1)) ++
                          ckS.zip(ckK).map { case (s, k) =>
                            F.col(s).as(k) }): _*)
                    val outerC = exprToCol(oe, None)
                    def tc(defs: Seq[(String, Column)]): Column =
                      thetaCond(op, defs.map(d => F.col(d._1)), outerC)
                    val matched =
                      (F.col(markN).isNotNull && tc(matDefs)) <=> F.lit(true)
                    val nonempty =
                      (F.col(grpN).isNotNull && tc(allDefs)) <=> F.lit(true)
                    from = from
                      .join(summary, sumCond, "left_outer")
                      .join(keys, keyCond, "left_outer")
                      .withColumn(flagN,
                        F.when(matched, F.lit(true))
                          .when(!nonempty, F.lit(false))
                          .when(probe.isNull ||
                              (tc(nulDefs) <=> F.lit(true)),
                            F.lit(null).cast(BooleanType))
                          .otherwise(F.lit(false)))
                    helperCols = flagN :: markN :: grpN :: keyN ::
                      ((allDefs ++ nulDefs ++ matDefs).map(_._1).toList :::
                        ckS.toList ::: ckK.toList ::: helperCols)
                }
                }
              case None =>
                // grouped + theta/general IN in FLAG position (r6 —
                // the last correlation-matrix cell): membership over
                // per-(distinct outer tuple, inner keys) surviving
                // groups, materialized as the same full-3VL flag the
                // conjunct NOT IN path uses, kept as a COLUMN here
                val groupedTheta = sub match {
                  case Leaf(q0) =>
                    groupedThetaSurvivors(q0,
                      outerAliases -- relationAliases(q0.sel.from),
                      from, wantValue = true)
                  case _ => None
                }
                groupedTheta match {
                  case Some((survivors, _, Some(_))) =>
                    val (joined, hs) = survivorMembershipFlag(
                      from, probe, survivors, flagN)
                    from = joined
                    helperCols = hs ::: helperCols
                  case _ =>
                    val (step, hs, _) = inFlagStep(sub, probe, "__sq", i)
                    from = step(from)
                    helperCols = hs ::: helperCols
                }
            }
            ColRef(None, flagN)
          case ExistsSubquery(sub0) =>
            // EXISTS in arbitrary boolean position (under OR, nested
            // NOT). EXISTS is two-valued, so the flag is never NULL.
            val sub = degroupCorrSub(sub0, outerAliases, forExists = true)
            val i = freshIdx()
            val flagN = s"__sq_flag_$i"
            existsCorrInfo(sub, outerAliases) match {
              case Some((q, outerRefs, _, _))
                  if q.sel.groupBy.nonEmpty || q.sel.having.nonEmpty ||
                    q.sel.qualify.nonEmpty ||
                    q.limit.nonEmpty || q.offset.nonEmpty =>
                // grouped + theta/general EXISTS in FLAG position
                // (r6): does any group of the tuple's theta-selected
                // rows satisfy HAVING? — surviving tuples LEFT-join
                // back as a presence mark; EXISTS stays two-valued
                // (an absent tuple, incl. NULL keys/operands under
                // pure comparisons, reads false; general tuple
                // columns join null-safely)
                groupedThetaExistsSurvivors(q, outerRefs, from) match {
                  case Some((survivors, cond)) =>
                    val parts = lastSurvivorParts.get
                    val markN = s"__sq_mark_$i"
                    from = from.join(
                        survivors.withColumn(markN, F.lit(true)),
                        cond, "left_outer")
                      .withColumn(flagN, F.col(markN).isNotNull)
                    helperCols = flagN :: markN ::
                      (parts.tupleNames ::: helperCols)
                  case None =>
                    fail("correlated EXISTS subquery supports FROM/WHERE only")
                }
              case Some((q, outerRefs, _, _)) =>
                // dedup the inner side on its correlation keys before a
                // left_outer presence join — no row multiplication. A
                // range (theta) conjunct rides as the per-group min/max
                // of the inner range expression, compared against the
                // outer side after the join (`∃ t < x ⟺ min(t) < x`);
                // EXISTS is two-valued, so an UNKNOWN comparison (null
                // range values, null outer) reads false.
                val (keyPairs, thetas, gens, genDefs, local) =
                  corrSplitG(q, outerRefs, "EXISTS", allowTheta = true,
                    Some(s"__sq_ge_${i}_"))
                var inner = drainGenHoists(translateRelation(q.sel.from))
                local.reduceOption(And).foreach(p =>
                  inner = inner.filter(exprToCol(p, None)))
                val markN = s"__sq_mark_$i"
                if (gens.nonEmpty || thetas.length >= 2) {
                  // JOINT theta condition (e.g. a time-window pair
                  // `e.ts < o.ts AND e.ts > o.ts - 1h`) or a GENERAL
                  // correlated predicate (r5c: correlation under
                  // OR/NOT, mixed-side comparisons): min/max cannot
                  // decompose these, so semi-join the DISTINCT
                  // (keys, operands) outer-tuple table against the
                  // inner rows on the FULL condition, then join the
                  // surviving tuples back. EXISTS is two-valued — an
                  // absent tuple (incl. NULL operands) reads false.
                  val okN = keyPairs.indices.map(j => s"__sq_ok_${i}_$j")
                  val tNs = thetas.indices.map(j => s"__sq_tu_${i}_$j")
                  val gNs = genDefs.map(_._1)
                  val tuples = from.select(
                    keyPairs.zip(okN).map { case ((_, ok), n) =>
                      exprToCol(ok, None).as(n) } ++
                    thetas.zip(tNs).map { case ((_, _, oe), n) =>
                      exprToCol(oe, None).as(n) } ++
                    genDefs.map { case (n, oe) =>
                      exprToCol(oe, None).as(n) }: _*).distinct()
                  val joinCond =
                    (keyPairs.zip(okN).map { case ((ik, _), n) =>
                      exprToCol(ik, None) === F.col(n) } ++
                     thetas.zip(tNs).map { case ((ie, op, _), n) =>
                      cmp(op, exprToCol(ie, None), F.col(n)) } ++
                     gens.map(exprToCol(_, None))).reduce(_ && _)
                  val matched = tuples.join(inner, joinCond, "left_semi")
                    .withColumn(markN, F.lit(true))
                  val backCond =
                    (keyPairs.zip(okN).map { case ((_, ok), n) =>
                      exprToCol(ok, None) <=> F.col(n) } ++
                     thetas.zip(tNs).map { case ((_, _, oe), n) =>
                      exprToCol(oe, None) <=> F.col(n) } ++
                     genDefs.map { case (n, oe) =>
                      exprToCol(oe, None) <=> F.col(n) }).reduce(_ && _)
                  from = from.join(matched, backCond, "left_outer")
                    .withColumn(flagN, F.col(markN).isNotNull)
                  helperCols = flagN :: markN ::
                    (okN.toList ::: tNs.toList ::: gNs.toList ::: helperCols)
                } else {
                val theta = thetas.headOption
                val ckK = keyPairs.indices.map(j => s"__sq_ck_${i}_$j")
                val cond = keyPairs.zip(ckK).map { case ((_, ok), n) =>
                  exprToCol(ok, None) === F.col(n) }
                  .reduceOption(_ && _).getOrElse(F.lit(true))
                theta match {
                  case None =>
                    val keys = inner.select(keyPairs.zip(ckK).map {
                        case ((ik, _), n) => exprToCol(ik, None).as(n) }: _*)
                      .distinct().withColumn(markN, F.lit(true))
                    from = from.join(keys, cond, "left_outer")
                      .withColumn(flagN, F.col(markN).isNotNull)
                    helperCols = flagN :: markN :: (ckK.toList ::: helperCols)
                  case Some((ie, op, oe)) =>
                    val aggDefs =
                      thetaAggCols(exprToCol(ie, None), op, s"__sq_tagg_$i")
                    val keys = inner
                      .groupBy(keyPairs.zip(ckK).map { case ((ik, _), n) =>
                        exprToCol(ik, None).as(n) }: _*)
                      .agg(aggDefs.head._2.as(aggDefs.head._1),
                        aggDefs.tail.map { case (n, c) => c.as(n) }: _*)
                      .withColumn(markN, F.lit(true))
                    from = from.join(keys, cond, "left_outer")
                      .withColumn(flagN,
                        (F.col(markN).isNotNull &&
                          thetaCond(op, aggDefs.map(d => F.col(d._1)),
                            exprToCol(oe, None))) <=> F.lit(true))
                    helperCols = flagN :: markN ::
                      (aggDefs.map(_._1).toList ::: ckK.toList ::: helperCols)
                }
                }
              case None =>
                // uncorrelated: broadcast 1-row COUNT(*) > 0 summary
                // over the one-row nonempty probe
                val summary =
                  existsProbeSide(sub).agg((F.count(F.lit(1)) > 0).as(flagN))
                from = from.crossJoin(F.broadcast(summary))
                helperCols = flagN :: helperCols
            }
            ColRef(None, flagN)
          case QuantCmp(op, all, e, sub0) =>
            // Quantified comparison `x op ANY/ALL (subquery)` in any
            // boolean position: lower against a (count, has-null,
            // min, max) summary of the subquery column — `x < ANY(S)
            // ⟺ x < max(S)`, `x < ALL(S) ⟺ ¬(x >= min(S))`, `<> ANY`
            // and `= ALL` through the min/max pair — with the
            // standard 3VL arms (empty set, null probe, null-bearing
            // set) decided by quantFlag. Correlated equality-key
            // forms group the summary per key and left-join (narrow
            // key shuffle, no row multiplication); uncorrelated
            // forms broadcast the one-row summary. (`= ANY`/`<> ALL`
            // never reach here — the parser canonicalizes them to
            // [NOT] IN.)
            val sub = degroupCorrSub(sub0, outerAliases, forExists = false)
            val probe = exprToCol(e, None)
            val i = freshIdx()
            val flagN = s"__sq_flag_$i"
            val corrForm = sub match {
              case Leaf(q) if q.sel.groupBy.isEmpty && q.sel.having.isEmpty &&
                  q.sel.qualify.isEmpty &&
                  q.limit.isEmpty && q.offset.isEmpty &&
                  q.sel.items.length == 1 &&
                  q.sel.where.exists(w => splitConjuncts(w).exists(
                    refersToAliases(_, outerAliases -- relationAliases(q.sel.from)))) =>
                Some(q)
              case _ => None
            }
            corrForm match {
              case Some(q) =>
                val outerRefs = outerAliases -- relationAliases(q.sel.from)
                val (keyPairs, thetas, gens, genDefs, local) =
                  corrSplitG(q, outerRefs, "quantified comparison",
                    allowTheta = true, Some(s"__sq_ge_${i}_"))
                var inner = drainGenHoists(translateRelation(q.sel.from))
                local.reduceOption(And).foreach(p =>
                  inner = inner.filter(exprToCol(p, None)))
                val cntN = s"__sq_qc_$i"; val nulN = s"__sq_qn_$i"
                val minN = s"__sq_qmin_$i"; val maxN = s"__sq_qmax_$i"
                val y = exprToCol(q.sel.items.head.e, None)
                def summaryAggs = Seq(
                  F.count(F.lit(1)).as(cntN),
                  F.coalesce(F.max(y.isNull), F.lit(false)).as(nulN),
                  F.min(y).as(minN), F.max(y).as(maxN))
                if (thetas.nonEmpty || gens.nonEmpty) {
                  // theta- or (r5c) generally-correlated quantifier:
                  // the compared set depends on the outer operand(s),
                  // so build the summary per DISTINCT (keys,
                  // operands) tuple over a join carrying every theta
                  // comparison and every general correlated predicate
                  // (correlation under OR/NOT, mixed-side
                  // comparisons) — the same distinct-outer-tuple
                  // shape as theta scalars — then join back
                  // null-safely. A tuple whose selection is empty
                  // (incl. NULL operands under pure comparisons) has
                  // no summary row; count coalesces to 0 and the
                  // empty arms fire (ANY→FALSE, ALL→TRUE).
                  val okN = keyPairs.indices.map(j => s"__sq_ok_${i}_$j")
                  val tNs = thetas.indices.map(j => s"__sq_tu_${i}_$j")
                  val gNs = genDefs.map(_._1)
                  val tuples = from.select(
                    keyPairs.zip(okN).map { case ((_, ok), n) =>
                      exprToCol(ok, None).as(n) } ++
                    thetas.zip(tNs).map { case ((_, _, oe), n) =>
                      exprToCol(oe, None).as(n) } ++
                    genDefs.map { case (n, oe) =>
                      exprToCol(oe, None).as(n) }: _*).distinct()
                  val joinCond =
                    (keyPairs.zip(okN).map { case ((ik, _), n) =>
                      exprToCol(ik, None) === F.col(n) } ++
                     thetas.zip(tNs).map { case ((ie, top, _), n) =>
                      cmp(top, exprToCol(ie, None), F.col(n)) } ++
                     gens.map(exprToCol(_, None))).reduce(_ && _)
                  val grouped = tuples.join(inner, joinCond, "inner")
                    .groupBy((okN ++ tNs ++ gNs).map(F.col): _*)
                    .agg(summaryAggs.head, summaryAggs.tail: _*)
                  val backCond =
                    (keyPairs.zip(okN).map { case ((_, ok), n) =>
                      exprToCol(ok, None) <=> F.col(n) } ++
                     thetas.zip(tNs).map { case ((_, _, oe), n) =>
                      exprToCol(oe, None) <=> F.col(n) } ++
                     genDefs.map { case (n, oe) =>
                      exprToCol(oe, None) <=> F.col(n) }).reduce(_ && _)
                  from = from.join(grouped, backCond, "left_outer")
                    .withColumn(flagN, quantFlag(op, all, probe,
                      F.coalesce(F.col(cntN), F.lit(0L)),
                      F.coalesce(F.col(nulN), F.lit(false)),
                      F.col(minN), F.col(maxN)))
                  helperCols = flagN :: cntN :: nulN :: minN :: maxN ::
                    (okN.toList ::: tNs.toList ::: gNs.toList ::: helperCols)
                } else {
                val ckS = keyPairs.indices.map(j => s"__sq_cs_${i}_$j")
                val summary = inner
                  .groupBy(keyPairs.zip(ckS).map { case ((ik, _), n) =>
                    exprToCol(ik, None).as(n) }: _*)
                  .agg(summaryAggs.head, summaryAggs.tail: _*)
                val cond = keyPairs.zip(ckS).map { case ((_, ok), n) =>
                  exprToCol(ok, None) === F.col(n) }
                  .reduceOption(_ && _).getOrElse(F.lit(true))
                // an absent group (no summary row) is the EMPTY set:
                // coalesce count to 0 so the empty arms fire
                from = from.join(summary, cond, "left_outer")
                  .withColumn(flagN, quantFlag(op, all, probe,
                    F.coalesce(F.col(cntN), F.lit(0L)),
                    F.coalesce(F.col(nulN), F.lit(false)),
                    F.col(minN), F.col(maxN)))
                helperCols = flagN :: cntN :: nulN :: minN :: maxN ::
                  (ckS.toList ::: helperCols)
                }
              case None =>
                val (step, hs, _) = quantFlagStep(sub, probe, op, all, "__sq", i)
                from = step(from)
                helperCols = hs ::: helperCols
            }
            ColRef(None, flagN)
        }
    }

    val whereResidual: Option[Expr] = selScalars.where.map { w =>
      val (subqueries, residual0) = extractInSubqueries(w)
      subqueries.foreach {
        case (InSubquery(e, sub0), negated) =>
          val sub = degroupCorrSub(sub0, outerAliases, forExists = false)
          // r9: a RowTuple probe fans out to component probes — the
          // semi/anti lowering generalizes element-wise (positive:
          // ALL pairs equal; negated anti-condition: every pair equal
          // OR either side null = "comparison not strictly false")
          val probes: Seq[Column] = e match {
            case RowTuple(items) => items.map(exprToCol(_, None))
            case _               => Seq(exprToCol(e, None))
          }
          val arity = probes.length
          // r13 (guide §3.1): the negated null arms are spelled
          // `isnull(p = k)` — semantically identical to
          // `p.isNull || k.isNull` (`=` is NULL iff either side is) —
          // because Spark's ExtractSingleColumnNullAwareAntiJoin only
          // pattern-matches `Or(EqualTo(l, r), IsNull(EqualTo(l, r)))`.
          // The old spelling planned every uncorrelated single-column
          // NOT IN as an O(|outer|·|set|) BroadcastNestedLoopJoin;
          // this one plans the hash-based null-aware anti join over
          // the same broadcast (q_tpch_q16 0.99→0.57 s matched-mode;
          // same broadcast either way, so strictly better at any
          // scale). Multi-column and correlated forms keep their
          // BNLJ/residual shape (Spark has no multi-column NAAJ).
          def pairCond(keyCols: Seq[Column], neg: Boolean): Column =
            probes.zip(keyCols).map { case (p, k) =>
              if (neg) p === k || (p === k).isNull else p === k
            }.reduce(_ && _)
          // Correlated IN (sub's WHERE references an outer alias):
          // split like EXISTS — correlated conjuncts join, local
          // conjuncts filter — and key on the sub's select expression.
          // Known limitation: if the probe/key column NAME exists on
          // both sides, Spark raises AMBIGUOUS_REFERENCE (a loud
          // failure, not a wrong result) — qualify or alias to avoid.
          // inner relations shadow same-named outer ones (standard
          // SQL scoping) — only non-shadowed qualifiers are outer refs
          val corrForm = sub match {
            case Leaf(q) if q.sel.groupBy.isEmpty && q.sel.having.isEmpty &&
                q.sel.qualify.isEmpty &&
                q.limit.isEmpty && q.offset.isEmpty &&
                q.sel.items.length == arity &&
                q.sel.where.exists(w =>
                  splitConjuncts(w).exists(refersToAliases(_,
                    outerAliases -- relationAliases(q.sel.from)))) =>
              Some(q)
            case _ => None
          }
          corrForm match {
            case Some(q) =>
              val outerRefs = outerAliases -- relationAliases(q.sel.from)
              var inner = drainGenHoists(translateRelation(q.sel.from))
              val (corr, local) = q.sel.where
                .map(splitConjuncts).getOrElse(Nil)
                .partition(refersToAliases(_, outerRefs))
              local.reduceOption(And).foreach(p =>
                inner = inner.filter(exprToCol(p, None)))
              val keyCols = q.sel.items.map(i => exprToCol(i.e, None))
              // NOT IN needs the null arms for three-valued logic: a
              // null probe or a null key inside a NONEMPTY correlation
              // group yields UNKNOWN (row dropped), while an empty
              // group never satisfies the corr conjuncts, so the anti
              // join keeps the row — TRUE, as SQL requires.
              val matchCond = pairCond(keyCols, negated)
              // r8: nested uncorrelated scalars in the correlated
              // conjuncts hoist onto the inner frame (see
              // correlatedExistsSide)
              val corrH = corr.map(hoistNestedScalars(_,
                outerRefs ++ relationAliases(q.sel.from), "IN"))
              inner = drainGenHoists(inner)
              val cond = corrH.map(exprToCol(_, None))
                .foldLeft(matchCond)(_ && _)
              from = from.join(inner, cond,
                if (negated) "left_anti" else "left_semi")
            case None =>
              // grouped + theta IN conjuncts (r5b): membership =
              // surviving (tuple, value) match; NOT IN via the full
              // 3VL flag (per-tuple presence/has-null summary +
              // distinct non-null matches — UNKNOWN filters, a
              // tuple's empty set keeps the row)
              val groupedTheta = sub match {
                case Leaf(q0) if arity == 1 =>
                  groupedThetaSurvivors(q0,
                    outerAliases -- relationAliases(q0.sel.from),
                    from, wantValue = true)
                case _ => None
              }
              groupedTheta match {
                case Some((survivors, cond0, Some(v))) if !negated =>
                  from = from.join(survivors, cond0 && probes.head === v,
                    "left_semi")
                case Some((survivors, _, Some(_))) =>
                  // full 3VL via the shared flag builder (r6):
                  // strictly-FALSE membership survives NOT IN
                  val fi = gteIdx
                  val (joined, hs) = survivorMembershipFlag(
                    from, probes.head, survivors, s"__gte_${fi}_nif")
                  from = joined.filter(!F.col(s"__gte_${fi}_nif"))
                    .drop(hs: _*)
                case _ =>
                  val subDf = translate(sub)
                  if (subDf.columns.length != arity)
                    fail(s"IN (subquery) requires a $arity-column " +
                      s"subquery to match the probe, got " +
                      s"${subDf.columns.length}")
                  // anti-join emulating SQL NOT IN three-valued logic:
                  // a null probe or any null key means "no row is NOT
                  // IN" (unless the set is empty, where the anti join
                  // keeps everything — the condition never evaluates)
                  val keyCols = subDf.columns.toSeq.map(subDf(_))
                  val cond = pairCond(keyCols, negated)
                  from = from.join(subDf.distinct(), cond,
                    if (negated) "left_anti" else "left_semi")
              }
          }
        case (ExistsSubquery(sub0), negated) =>
          val sub = degroupCorrSub(sub0, outerAliases, forExists = true)
          // [NOT] EXISTS: semi/anti join. A CORRELATED subquery's
          // WHERE splits ONCE (existsCorrInfo) into local conjuncts
          // (filter the inner relation) and correlated conjuncts
          // (the join condition; outer refs must be alias-qualified),
          // restricted to FROM/WHERE shape. An UNCORRELATED subquery
          // may be ANY query — aggregates, GROUP BY, LIMIT, set ops —
          // reduced to a one-row nonempty probe (existsProbeSide).
          existsCorrInfo(sub, outerAliases) match {
            case Some((q, outerRefs, corr, local)) =>
              // grouped + HAVING with THETA correlation (r5b): does
              // any group over the theta-selected rows satisfy h? —
              // per-distinct-outer-tuple survivors, semi/anti-joined
              groupedThetaExistsSurvivors(q, outerRefs, from) match {
                case Some((survivors, cond)) =>
                  from = from.join(survivors, cond,
                    if (negated) "left_anti" else "left_semi")
                case None =>
                  val (inner, cond) =
                    correlatedExistsSide(q, corr, local, outerRefs)
                  from = from.join(inner, cond,
                    if (negated) "left_anti" else "left_semi")
              }
            case None =>
              from = from.join(existsProbeSide(sub), F.lit(true),
                if (negated) "left_anti" else "left_semi")
          }
        case (other, _) => fail(s"unexpected hoisted subquery $other")
      }
      residual0.map(lowerBoolFlags)
    }.flatten


    // IN/EXISTS in SELECT-item position (boolean projections,
    // `select ..., x in (select ...) as flag`): the flag joins land
    // on `from` before filtering; the item reads the flag column
    val selItems = selScalars.copy(items =
      selScalars.items.map(i => i.copy(e = lowerBoolFlags(i.e))))

    val filtered0 = whereResidual match {
      case Some(w) => from.filter(exprToCol(w, None))
      case None    => from
    }
    val hasAgg = selItems.items.exists(i => containsAgg(i.e)) ||
      selItems.groupBy.nonEmpty || selItems.having.exists(containsAgg)

    // Hoisted scalar-subquery columns referenced from an aggregating
    // SELECT/HAVING must survive the aggregation: append them to the
    // group keys. Uncorrelated values are globally constant, and a
    // correlated value is constant within any group that SQL would
    // accept the subquery in — so grouping is unchanged.
    val selAgg =
      if (!hasAgg) selItems
      else {
        // hoisted helper columns referenced outside an aggregate —
        // scalar-subquery values AND existence flags (projected
        // IN/EXISTS booleans): a flag probing a group key is constant
        // within any group SQL would accept it in, so appending it to
        // the keys leaves the grouping unchanged
        def refs(e: Expr): Seq[Expr] = e match {
          case ColRef(None, n)
              if n.startsWith("__ssq_") || n.startsWith("__csq_") ||
                 n.startsWith("__sq_flag_") =>
            Seq(ColRef(None, n))
          case _: AggExpr => Nil // inside an aggregate is fine
          case other => Ast.children(other).flatMap(refs)
        }
        val extra = (selItems.items.flatMap(i => refs(i.e)) ++
          selItems.having.toSeq.flatMap(refs)).distinct
        if (extra.isEmpty) selItems
        else if (selItems.groupMode != "plain") {
          // ROLLUP/CUBE: extending the key list would CHANGE the
          // grouping sets. An uncorrelated scalar is a global
          // constant, so aggregate it instead (min of a constant);
          // a correlated one varies across the rolled-up super-groups
          // and has no defined value there — loud error.
          // flags vary per base group the same way — no defined value
          // in a rolled-up super-group
          if (extra.exists { case ColRef(_, n) =>
                 n.startsWith("__csq_") || n.startsWith("__sq_flag_")
               case _ => false })
            fail("correlated scalar subqueries / projected IN-EXISTS " +
              "flags with ROLLUP/CUBE are not supported")
          def wrap(e: Expr): Expr = e match {
            case c @ ColRef(None, n) if n.startsWith("__ssq_") =>
              AggExpr("min", distinct = false, c, None)
            case a: AggExpr => a // refs inside aggregates already survive
            case other => Ast.mapChildren(other, wrap)
          }
          selItems.copy(
            items = selItems.items.map(i => i.copy(e = wrap(i.e))),
            having = selItems.having.map(wrap))
        }
        else selItems.copy(groupBy = selItems.groupBy ++ extra)
      }

    // GROUPS frame pre-pass (r7b, plain path): materialize the hidden
    // dense_rank ordinals on the pre-projection frame and retarget
    // every GROUPS spec to RANGE over them (see GroupsFrameRewriter).
    // The ordinals join helperCols, so SELECT * cannot leak them and
    // the final drop cleans up. DISTINCT stays sound: dense_rank is a
    // function of the (partition, order) key VALUES, so duplicate
    // projected rows carry duplicate ordinals.
    val (plainFrom, selPlain) =
      if (!hasAgg && selAgg.items.exists(i => containsGroupsFrame(i.e))) {
        val rw = new GroupsFrameRewriter(exprToCol(_, None))
        val items2 = selAgg.items.map(i => i.copy(e = rw.rewrite(i.e)))
        val d = rw.pending.foldLeft(filtered0) {
          case (df, (n, c)) => df.withColumn(n, c)
        }
        helperCols = rw.pending.keys.toList ::: helperCols
        (d, selAgg.copy(items = items2))
      } else (filtered0, selAgg)

    val projected: DataFrame =
      if (!hasAgg) {
        val base = selPlain.having match { // HAVING w/o aggregates = WHERE
          case Some(h) => plainFrom.filter(exprToCol(h, None))
          case None    => plainFrom
        }
        // UNNEST (r5, DuckDB select-position form): lowered to explode
        // — a Generate producing one output row per array element
        // (empty/NULL arrays produce zero rows, matching DuckDB).
        // Restrictions keep the semantics unambiguous: top-level item
        // only, at most one per SELECT, not mixed with window
        // functions (relative evaluation order would be undefined).
        def isUnnest(e: Expr): Boolean = e match {
          case FuncCall("unnest", _) => true
          case _ => false
        }
        def nestedUnnest(e: Expr): Boolean =
          Ast.children(e).exists(c => isUnnest(c) || nestedUnnest(c))
        val unnestCount = selPlain.items.count(i => isUnnest(i.e))
        if (selPlain.items.exists(i => nestedUnnest(i.e)))
          fail("unnest(...) is only supported as a top-level select item")
        if (unnestCount > 0 && selPlain.items.exists(i => containsWindow(i.e)))
          fail("unnest(...) cannot be combined with window functions " +
            "in the same SELECT")
        if (unnestCount > 1) {
          // Parallel unnests ZIP (r5b, DuckDB semantics): one output
          // row per index up to the LONGEST array, shorter arrays and
          // NULL arrays padded with NULLs. Lowered as ONE explode of
          // the tiny index sequence (never of the value arrays — the
          // Generate-copy trap) with values re-read positionally via
          // try_element_at; non-unnest items evaluate once pre-explode.
          var j = -1
          val infos = selPlain.items.map { item =>
            j += 1
            item.e match {
              case FuncCall("unnest", args) =>
                if (args.length != 1)
                  fail("unnest takes exactly one array argument")
                (j, s"__un_a$j", Some(args.head),
                  item.alias.getOrElse("unnest"))
              case e =>
                (j, s"__un_o$j", None,
                  item.alias.getOrElse(defaultName(e, base)))
            }
          }
          val pre = base.select(infos.map {
            case (jj, hn, Some(arr), _) => exprToCol(arr, None).as(hn)
            case (jj, hn, None, _) =>
              exprToCol(selPlain.items(jj).e, None).as(hn)
          }: _*)
          val maxLen = F.greatest(infos.collect { case (_, hn, Some(_), _) =>
            F.coalesce(F.when(F.col(hn).isNotNull, F.size(F.col(hn))),
              F.lit(0)) }: _*)
          val exploded = pre.select(F.col("*"),
            F.explode(F.when(maxLen > F.lit(0),
              F.sequence(F.lit(1), maxLen))).as("__un_i"))
          exploded.select(infos.map {
            case (_, hn, Some(_), name) =>
              F.try_element_at(F.col(hn), F.col("__un_i")).as(name)
            case (_, hn, None, name) => F.col(hn).as(name)
          }: _*)
        }
        else base.select(selectCols(selPlain.items, base): _*)
      } else translateAggregate(selAgg, filtered0)

    val qualified = qualifyExpr match {
      case Some(qe) =>
        val f = projected.filter(exprToCol(qe, None))
        if (qualifyHidden.isEmpty) f else f.drop(qualifyHidden: _*)
      case None => projected
    }
    val dis = if (selItems.distinct) qualified.distinct() else qualified
    // hoisted helper columns (IN flags, scalar-subquery values) must
    // not leak through SELECT * — drop ignores absent columns, so
    // explicit projections are unaffected
    if (helperCols.isEmpty) dis else dis.drop(helperCols: _*)
  }

  /** GROUP BY / global aggregation with HAVING support. Aggregate
    * expressions referenced in HAVING are computed in the same agg
    * (single shuffle with map-side partial aggregation), filtered,
    * then pruned by the final projection. */
  /** COLUMNS(*) / COLUMNS('regex') select-item expansion (r11c,
    * DuckDB star-function): each item containing a COLUMNS call
    * expands to one item per matching column (table order; regex is
    * RE2-style partial match, anchor with ^$ for exact). Naming:
    * the expanded item takes the SOURCE column's name; an explicit
    * alias prefixes it (`max(COLUMNS('…')) AS m` → m_<col>) so
    * multiple expanded items stay distinguishable. One COLUMNS call
    * per item; an empty match set is a loud error (a silently empty
    * projection hides a typo'd pattern). */
  private def expandColumnsItems(sel: Select, cols: Seq[String]): Select = {
    def isColumnsCall(e: Expr): Boolean = e match {
      case FuncCall(n, _) => n.equalsIgnoreCase("columns")
      case _ => false
    }
    def hasColumns(e: Expr): Boolean =
      isColumnsCall(e) || Ast.children(e).exists(hasColumns)
    if (!sel.items.exists(si => hasColumns(si.e))) sel
    else {
      val items = sel.items.flatMap { si =>
        if (!hasColumns(si.e)) Seq(si)
        else {
          var pat: Option[Seq[Expr]] = None
          Ast.transformUp(si.e) {
            case f @ FuncCall(n, args) if n.equalsIgnoreCase("columns") =>
              if (pat.exists(_ != args))
                fail("one COLUMNS call per select item")
              pat = Some(args)
              f
          }
          val matching = pat.get match {
            case Seq(Star(None)) => cols
            case Seq(StrLit(re)) =>
              val p = try re.r catch {
                case e: Exception =>
                  fail(s"COLUMNS pattern does not parse: ${e.getMessage}")
              }
              cols.filter(c => p.findFirstIn(c).isDefined)
            case other =>
              fail(s"COLUMNS takes * or a string pattern, got $other")
          }
          if (matching.isEmpty)
            fail(s"COLUMNS matched no columns of [${cols.mkString(", ")}]")
          matching.map { c =>
            val e2 = Ast.transformUp(si.e) {
              case FuncCall(n, _) if n.equalsIgnoreCase("columns") =>
                ColRef(None, c)
            }
            SelectItem(e2, Some(si.alias.map(a => s"${a}_$c").getOrElse(c)))
          }
        }
      }
      sel.copy(items = items)
    }
  }

  private def translateAggregate(sel: Select, in: DataFrame): DataFrame = {
    // reference parity (test_errors.py:73-76): sum/avg over a
    // non-numeric column is rejected rather than implicitly cast
    def checkNumericAgg(e: Expr): Unit = e match {
      case AggExpr(f, _, ColRef(_, n), _, _, _)
          if f == "sum" || f == "avg" || f == "stddev" || f == "variance" =>
        in.schema.fields.find(_.name.equalsIgnoreCase(n)).foreach { fld =>
          fld.dataType match {
            case _: org.apache.spark.sql.types.NumericType => ()
            case other =>
              fail(s"cannot $f non-numeric column $n of type ${other.simpleString}")
          }
        }
      case other => Ast.children(other).foreach(checkNumericAgg)
    }
    sel.items.foreach(i => checkNumericAgg(i.e))
    sel.having.foreach(checkNumericAgg)

    // GROUP BY <integer literal> is positional (1-based select item),
    // matching Spark SQL and DuckDB — grouping by a constant would
    // put everything in one group
    val itemAliases = sel.items.collect {
      case SelectItem(e, Some(a)) => a.toLowerCase -> e
    }.toMap
    // positional refs address USER items only — hidden __qw_ QUALIFY
    // and __ob_ aggregate-order items are appended after them and must
    // stay unaddressable (group by <n+1> would otherwise silently
    // group by the predicate/sort key)
    val visibleItems = sel.items.filterNot(_.alias.exists(a =>
      a.startsWith("__qw_") || a.startsWith("__ob_")))
    def resolveGroupKey(g: Expr): Expr = g match {
      case NumLit(t) if t.matches("[0-9]+") =>
        val i = t.toInt
        if (i < 1 || i > visibleItems.length)
          fail(s"GROUP BY position $i out of range (1..${visibleItems.length})")
        visibleItems(i - 1).e match {
          case Star(_) => fail("GROUP BY position cannot reference *")
          case e => e
        }
      // GROUP BY <select alias> (Spark groupByAliases / DuckDB): the
      // alias resolves only when the name is not a real input column
      case ColRef(None, n)
          if itemAliases.contains(n.toLowerCase) &&
            !in.columns.exists(_.equalsIgnoreCase(n)) =>
        itemAliases(n.toLowerCase)
      case other => other
    }
    val groupExprs = sel.groupBy.map(resolveGroupKey)
    // non-bare-column group keys get stable names so SELECT items that
    // repeat the key expression read the grouped VALUE instead of
    // re-evaluating the expression over the aggregated frame (where
    // the source columns no longer exist)
    val groupNamed: Seq[(Expr, Column, Option[String])] =
      groupExprs.zipWithIndex.map {
        case (g @ ColRef(_, _), _) => (g, exprToCol(g, None), None)
        case (g, i) =>
          val n = s"__gk_$i"
          (g, exprToCol(g, None).as(n), Some(n))
      }
    val groupCols = groupNamed.map(_._2)

    // every aggregate node appearing in SELECT or HAVING, deduped by
    // its rendered column text PLUS the distinct flag — the internal
    // node behind Column.fn(name, isDistinct = true) renders WITHOUT
    // the DISTINCT marker, so text alone would silently unify
    // stddev(x) with stddev(DISTINCT x)
    var aggMap = Vector.empty[(String, String, Column)] // name, key, col
    def aggName(a: AggExpr): String = {
      val c = aggColumn(a)
      val key = s"${a.func}|${a.distinct}|$c"
      aggMap.find(_._2 == key) match {
        case Some((n, _, _)) => n
        case None =>
          val n = s"__agg_${aggMap.size}"
          aggMap :+= ((n, key, c))
          n
      }
    }

    // rewrite an expression: aggregate nodes → post-agg column refs,
    // group-by expressions → their post-agg values
    def post(e: Expr): Column = e match {
      case a @ AggExpr(_, _, _, None, _, _) =>
        F.col(aggName(a))
      // window functions over the AGGREGATED result (standard SQL:
      // windows evaluate after GROUP BY/HAVING) — partition/order keys
      // and arguments lower through post, so aggregates and group keys
      // inside the window spec resolve to their post-agg columns
      case a: AggExpr if a.window.isDefined =>
        if (a.func == "string_agg" || a.func == "array_agg")
          orderedSetWindowed(a, post)
        else {
          // DISTINCT sum/avg typed fold: resolve the arg against the
          // PRE-AGG frame (group keys keep their type through the
          // aggregate; post-agg-only refs fall back to the double fold)
          val at = (a.arg, resolveFrame) match {
            case _ if !((a.distinct && (a.func == "sum" || a.func == "avg")) ||
              a.window.exists(_.exclude != "no others")) => None
            case (Star(_), _) | (_, None) => None
            case (e, Some(df)) =>
              scala.util.Try(df.select(exprToCol(e, None)).schema.head.dataType).toOption
          }
          windowedAgg(a, post, at)
        }
      case RankExpr(dense, w) =>
        (if (dense) F.dense_rank() else F.rank()).over(windowSpec(w, post))
      case WinFunc(nm, args, w, ign) =>
        winFunc(nm, args, post, ign).over(windowSpec(w, post))
      case _ if groupNamed.exists(t => sameExpr(t._1, e)) =>
        groupNamed.find(t => sameExpr(t._1, e)).get match {
          case (_, _, Some(n)) => F.col(n) // named expression key
          case _               => exprToCol(e, None) // bare column key
        }
      case ColRef(_, _) => exprToCol(e, None)
      case NumLit(_) | NullLit() | StrLit(_) | BoolLit(_) | NowLit() |
           TodayLit() | TimestampLit(_, _) | DateLit(_) => exprToCol(e, None)
      case Arith(op @ ("+" | "-"), l, i: IntervalLit) =>
        shiftByInterval(post(l), i, negate = op == "-")
      case Arith("+", i: IntervalLit, r) =>
        shiftByInterval(post(r), i, negate = false)
      case Arith(op, l, r)  => arith(op, post(l), post(r))
      case Neg(x)           => -post(x)
      case CaseWhen(bs, o) =>
        bs.tail.foldLeft(F.when(post(bs.head._1), post(bs.head._2))) {
          case (acc, (c, v)) => acc.when(post(c), post(v))
        }.otherwise(post(o))
      case Cast(x, t, sf) => castCol(post(x), t, sf)
      case Coalesce(args) => F.coalesce(args.map(post): _*)
      case And(l, r)      => post(l) && post(r)
      case Or(l, r)       => post(l) || post(r)
      case Not(x)         => !post(x)
      case Cmp(op, l, r)  => cmp(op, post(l), post(r))
      case Between(x, lo, hi) => post(x).between(post(lo), post(hi))
      case InList(x, vs, neg) =>
        val c = inListCol(post(x), vs, v => post(v))
        if (neg) !c else c
      case IsNull(x, neg) => if (neg) post(x).isNotNull else post(x).isNull
      case Like(x, p, esc) => likeCol(post(x), p, esc, ci = false)
      case ILike(x, p, esc) => likeCol(post(x), p, esc, ci = true)
      case FuncCall(nm, args) if args.exists(_.isInstanceOf[Lambda]) =>
        hofCall(nm, args, post)
      case FuncCall(nm, args) => scalarFunc(nm, args.map(post), args)
      // r11 subscript/field sugar composes over aggregates and group
      // keys too (`collect_list(x)[1]`, `s.f` on a grouped struct)
      case Subscript(x, i)    => subscriptCol(x, i, post)
      case ArraySlice(x, lo, hi) => sliceCol(x, lo, hi, post)
      case FieldAccess(x, f0) => post(x).getField(f0)
      case other => fail(s"unsupported expression in aggregate context: $other")
    }

    // group-by keys must appear in output when selected; compute the
    // post-agg projection for each select item
    val groupKeyed =
      if (groupCols.isEmpty) in.groupBy()
      else sel.groupMode match {
        case "rollup" => in.rollup(groupCols: _*)
        case "cube"   => in.cube(groupCols: _*)
        case "sets" =>
          // explicit GROUPING SETS over the flattened key union; keys
          // resolve positionals/aliases like plain GROUP BY, then are
          // matched to the grouping columns by structural equality.
          // Expression keys are MATERIALIZED as named `__gk_i` columns
          // first and both lists pass plain references: handing
          // `expr AS __gk_i` to groupingSets twice creates two alias
          // nodes with distinct exprIds, and Spark's Expand then
          // null-pads the selected one in every set (plain attribute
          // references resolve by name, so the set entry and the
          // grouping column are the same attribute).
          val preIn = groupNamed.foldLeft(in) {
            case (d, (g, _, Some(n))) => d.withColumn(n, exprToCol(g, None))
            case (d, _) => d
          }
          def plainKey(t: (Expr, Column, Option[String])): Column = t match {
            case (_, _, Some(n)) => F.col(n)
            case (g, _, None)    => exprToCol(g, None)
          }
          val sets = sel.groupSets.map(_.map(resolveGroupKey).map { g =>
            groupNamed.find(t => sameExpr(t._1, g)) match {
              case Some(t) => plainKey(t)
              case None =>
                fail(s"GROUPING SETS key $g missing from the key union")
            }
          })
          preIn.groupingSets(sets, groupNamed.map(plainKey): _*)
        case _        => in.groupBy(groupCols: _*)
      }

    // HAVING may reference SELECT aliases (DuckDB/Spark SQL both
    // allow it): substitute the aliased expression before lowering
    // (itemAliases is the same map GROUP BY alias resolution uses).
    // Mirrors the GROUP BY guard: an alias that shadows a REAL input
    // column does not substitute — DuckDB/Spark prefer the column.
    def resolveAliases(e: Expr): Expr = Ast.transformUp(e) {
      case ColRef(None, n) if itemAliases.contains(n.toLowerCase) &&
          !in.columns.exists(_.equalsIgnoreCase(n)) =>
        itemAliases(n.toLowerCase)
    }
    // IN/EXISTS subqueries in HAVING (reference grammar: sql.lark:22
    // having_expr → bool_expression:112-119 → subquery_in:130) lower
    // as existence flags joined onto the AGGREGATED result — the
    // probe may itself be an aggregate, so the pre-agg semi-join
    // machinery cannot apply. Uncorrelated subqueries only; a
    // correlated one fails loudly at analysis (unresolved outer ref).
    // `lowerProbe` abstracts probe lowering: `post` in the aggregate
    // path, plain exprToCol in the distinct (no-aggregate) path.
    def lowerHavingSubqueries(h: Expr, lowerProbe: Expr => Column)
        : (Expr, List[DataFrame => DataFrame], List[String]) = {
      var joins = List.empty[DataFrame => DataFrame]
      var helpers = List.empty[String]
      var idx = 0
      val rewritten = Ast.transformUp(h) {
        case InSubquery(probe, sub) =>
          val i = idx; idx += 1
          // correlated IN in HAVING (r5b): group-key equality
          // correlation — per correlation key a presence/has-null
          // summary plus distinct non-null (key, value) match rows,
          // two left joins onto the aggregated frame; the flag
          // replays the standard 3VL table with "empty" = no inner
          // rows for this key
          val corrInfo = sub match {
            case Leaf(q) if q.sel.groupBy.isEmpty &&
                q.sel.having.isEmpty && q.sel.qualify.isEmpty &&
                q.limit.isEmpty && q.offset.isEmpty &&
                q.sel.items.length == 1 &&
                q.sel.where.exists(w => splitConjuncts(w).exists(
                  refersToAliases(_,
                    relationAliases(sel.from) -- relationAliases(q.sel.from))))
              => Some((q,
                relationAliases(sel.from) -- relationAliases(q.sel.from)))
            case _ => None
          }
          corrInfo match {
            case Some((q, outerRefs)) =>
              val (keyPairs, local) = corrKeyPairs(q, outerRefs, "HAVING IN")
              var inner = drainGenHoists(translateRelation(q.sel.from))
              local.reduceOption(And).foreach(p =>
                inner = inner.filter(exprToCol(p, None)))
              val vN = s"__hq_v_$i"
              val sNs = keyPairs.indices.map(j => s"__hq_sk_${i}_$j")
              val mNs = keyPairs.indices.map(j => s"__hq_mk_${i}_$j")
              val presentN = s"__hq_present_$i"; val nullN = s"__hq_null_$i"
              val markN = s"__hq_mark_$i"; val flagN = s"__hq_flag_$i"
              val base = inner.select(keyPairs.zip(sNs).map {
                  case ((ik, _), n) => exprToCol(ik, None).as(n) } :+
                exprToCol(q.sel.items.head.e, None).as(vN): _*)
              val summary = base.groupBy(sNs.map(F.col): _*)
                .agg(F.lit(true).as(presentN),
                  F.coalesce(F.max(F.col(vN).isNull), F.lit(false)).as(nullN))
              val matches = base.filter(F.col(vN).isNotNull)
                .select(sNs.zip(mNs).map { case (s0, m) =>
                  F.col(s0).as(m) } :+ F.col(vN): _*)
                .distinct().withColumn(markN, F.lit(true))
              val probeCol = lowerProbe(probe)
              joins ::= { (df: DataFrame) =>
                val sCond = keyPairs.zip(sNs).map { case ((_, oe), n) =>
                  lowerProbe(oe) === F.col(n) }.reduce(_ && _)
                val mCond = (keyPairs.zip(mNs).map { case ((_, oe), n) =>
                  lowerProbe(oe) === F.col(n) } :+
                  (probeCol === F.col(vN))).reduce(_ && _)
                df.join(summary, sCond, "left_outer")
                  .join(matches, mCond, "left_outer")
                  .withColumn(flagN,
                    F.when(F.col(markN).isNotNull, F.lit(true))
                      .when(F.col(presentN).isNull, F.lit(false))
                      .when(probeCol.isNull || F.col(nullN),
                        F.lit(null).cast(org.apache.spark.sql.types.BooleanType))
                      .otherwise(F.lit(false)))
                  .drop((sNs ++ mNs): _*).drop(vN)
              }
              helpers = flagN :: markN :: presentN :: nullN :: helpers
              ColRef(None, flagN)
            case None =>
              val (step, hs, flagN) =
                inFlagStep(sub, lowerProbe(probe), "__hq", i)
              joins ::= step
              helpers = hs ::: helpers
              ColRef(None, flagN)
          }
        case ExistsSubquery(sub) =>
          val i = idx; idx += 1
          val flagN = s"__hq_flag_$i"
          // correlated EXISTS in HAVING (r5b): the correlation's outer
          // side must be a GROUP KEY expression (anything else has no
          // post-aggregation value — standard SQL agrees); the flag
          // left-joins the inner side's DISTINCT keys onto the
          // aggregated frame. Equality correlation only.
          existsCorrInfo(sub, relationAliases(sel.from)) match {
            case Some((q, outerRefs, _, _)) =>
              if (q.sel.groupBy.nonEmpty || q.sel.having.nonEmpty ||
                  q.sel.qualify.nonEmpty)
                fail("correlated EXISTS in HAVING supports FROM/WHERE only")
              val (keyPairs, local) =
                corrKeyPairs(q, outerRefs, "HAVING EXISTS")
              var inner = drainGenHoists(translateRelation(q.sel.from))
              local.reduceOption(And).foreach(p =>
                inner = inner.filter(exprToCol(p, None)))
              val kNs = keyPairs.indices.map(j => s"__hq_k_${i}_$j")
              val rhs = inner.select(keyPairs.zip(kNs).map {
                  case ((ik, _), n) => exprToCol(ik, None).as(n) }: _*)
                .distinct().withColumn(flagN, F.lit(true))
              joins ::= { (df: DataFrame) =>
                val cond = keyPairs.zip(kNs).map { case ((_, oe), n) =>
                  lowerProbe(oe) === F.col(n) }.reduce(_ && _)
                df.join(rhs, cond, "left_outer")
                  .withColumn(flagN, F.coalesce(F.col(flagN), F.lit(false)))
                  .drop(kNs: _*)
              }
              helpers = flagN :: helpers
              ColRef(None, flagN)
            case None =>
              val summary =
                existsProbeSide(sub).agg((F.count(F.lit(1)) > 0).as(flagN))
              joins ::= { (df: DataFrame) =>
                df.crossJoin(F.broadcast(summary)) }
              helpers = flagN :: helpers
              ColRef(None, flagN)
          }
        case QuantCmp(op, all, probe, sub) =>
          val i = idx; idx += 1
          // correlated quantified comparison in HAVING (r5b): the
          // (count, has-null, min, max) summary computes PER
          // correlation key and left-joins on the group keys; a
          // missing key row is the empty set (count 0)
          val corrInfo = sub match {
            case Leaf(q) if q.sel.groupBy.isEmpty &&
                q.sel.having.isEmpty && q.sel.qualify.isEmpty &&
                q.limit.isEmpty && q.offset.isEmpty &&
                q.sel.items.length == 1 &&
                q.sel.where.exists(w => splitConjuncts(w).exists(
                  refersToAliases(_,
                    relationAliases(sel.from) -- relationAliases(q.sel.from))))
              => Some((q,
                relationAliases(sel.from) -- relationAliases(q.sel.from)))
            case _ => None
          }
          corrInfo match {
            case Some((q, outerRefs)) =>
              val (keyPairs, local) =
                corrKeyPairs(q, outerRefs, "HAVING quantified comparison")
              var inner = drainGenHoists(translateRelation(q.sel.from))
              local.reduceOption(And).foreach(p =>
                inner = inner.filter(exprToCol(p, None)))
              val kNs = keyPairs.indices.map(j => s"__hq_qk_${i}_$j")
              val cntN = s"__hq_qc_$i"; val nulN = s"__hq_qn_$i"
              val minN = s"__hq_qmin_$i"; val maxN = s"__hq_qmax_$i"
              val flagN = s"__hq_flag_$i"
              val y = exprToCol(q.sel.items.head.e, None)
              val summary = inner
                .select(keyPairs.zip(kNs).map { case ((ik, _), n) =>
                  exprToCol(ik, None).as(n) } :+ y.as("__hq_y"): _*)
                .groupBy(kNs.map(F.col): _*)
                .agg(F.count(F.lit(1)).as(cntN),
                  F.coalesce(F.max(F.col("__hq_y").isNull), F.lit(false))
                    .as(nulN),
                  F.min(F.col("__hq_y")).as(minN),
                  F.max(F.col("__hq_y")).as(maxN))
              val probeCol = lowerProbe(probe)
              joins ::= { (df: DataFrame) =>
                val cond = keyPairs.zip(kNs).map { case ((_, oe), n) =>
                  lowerProbe(oe) === F.col(n) }.reduce(_ && _)
                df.join(summary, cond, "left_outer")
                  .withColumn(flagN, quantFlag(op, all, probeCol,
                    F.coalesce(F.col(cntN), F.lit(0L)),
                    F.coalesce(F.col(nulN), F.lit(false)),
                    F.col(minN), F.col(maxN)))
                  .drop(kNs: _*)
              }
              helpers = flagN :: cntN :: nulN :: minN :: maxN :: helpers
              ColRef(None, flagN)
            case None =>
              val (step, hs, flagN) =
                quantFlagStep(sub, lowerProbe(probe), op, all, "__hq", i)
              joins ::= step
              helpers = hs ::: helpers
              ColRef(None, flagN)
          }
      }
      (rewritten, joins.reverse, helpers)
    }

    // GROUP BY with no aggregates (reference: test_group_by,
    // aggregation.py:18) flows through the SAME aggregation pipeline
    // as everything else, with a dummy aggregate standing in (dropped
    // below): one row per full key tuple — even for keys the SELECT
    // list drops — rollup/cube/sets super-groups included, windows
    // and HAVING evaluated over the grouped frame via `post`. A
    // separate distinct() shortcut used to live here; it silently
    // collapsed groups on unprojected keys, evaluated window items
    // over pre-group rows, and dropped rollup super-group rows.

    // GROUPS frame pre-pass (r7b, aggregate path): windows over the
    // AGGREGATED frame may carry GROUPS frames too — rewrite items
    // against `post` lowering (partition/order keys resolve to their
    // post-agg columns); the hidden ordinals materialize on the
    // aggregated frame after HAVING (standard evaluation order) and
    // never reach the output (the final select projects named items).
    val grw = new GroupsFrameRewriter(post)
    val selGItems: Seq[SelectItem] =
      if (sel.items.exists(i => containsGroupsFrame(i.e)))
        sel.items.map(i => i.copy(e = grw.rewrite(i.e)))
      else sel.items

    // force materialization of agg map: walk select + having
    val selectPost: Seq[(Expr, Option[String], Column)] = selGItems.map {
      case SelectItem(Star(_) | StarMod(_, _, _), _) =>
        fail("SELECT * with aggregation requires explicit columns")
      // hidden QUALIFY items: select aliases resolve inside the window
      // spec (DuckDB QUALIFY scoping) — the aliased expression is the
      // only form that still exists post-aggregation
      case SelectItem(e, alias) if alias.exists(_.startsWith("__qw_")) =>
        val e2 = resolveAliases(e)
        (e2, alias, post(e2))
      case SelectItem(e, alias) => (e, alias, post(e))
    }
    val (havingExpr, havingJoins) = sel.having match {
      case Some(h) =>
        val (e2, js, _) = lowerHavingSubqueries(resolveAliases(h), post)
        (Some(e2), js)
      case None => (None, Nil)
    }
    val havingPost: Option[Column] = havingExpr.map(post)

    // GROUP BY with no aggregates anywhere: a dummy aggregate carries
    // the grouping (RelationalGroupedDataset.agg needs one), dropped
    // right after — semantically one row per group, same cost as a
    // distinct() over the keys
    val aggExprs: Seq[Column] = aggMap.map { case (n, _, c) => c.as(n) } match {
      case Seq() => Seq(F.first(F.lit(1)).as("__gb_dummy"))
      case es => es
    }

    var agged: DataFrame =
      groupKeyed.agg(aggExprs.head, aggExprs.tail: _*).drop("__gb_dummy")

    agged = havingJoins.foldLeft(agged)((d, f) => f(d))
    havingPost.foreach(h => agged = agged.filter(h))
    grw.pending.foreach { case (n, c) => agged = agged.withColumn(n, c) }

    val out = selectPost.map { case (e, alias, c) =>
      c.as(alias.getOrElse(defaultName(e, in)))
    }
    agged.select(out: _*)
  }

  /** Structural equality for group-key matching: ColRef names compare
    * case-insensitively, and qualifiers compare (case-insensitively)
    * only when BOTH sides carry one — `GROUP BY k` matches `SELECT
    * t.k`, but `GROUP BY b.k` does NOT match `SELECT a.k` (which
    * previously silently read b's grouped value under a's label). */
  private def sameExpr(a: Expr, b: Expr): Boolean = (a, b) match {
    case (ColRef(q1, n1), ColRef(q2, n2)) =>
      n1.equalsIgnoreCase(n2) && ((q1, q2) match {
        case (Some(x), Some(y)) => x.equalsIgnoreCase(y)
        case _ => true
      })
    case _ =>
      Ast.sameShape(a, b) &&
        Ast.children(a).lazyZip(Ast.children(b)).forall(sameExpr)
  }

  private def containsAgg(e: Expr): Boolean = e match {
    case AggExpr(_, _, _, None, _, _) => true
    // windowed aggregates and window functions are per-row values —
    // but a PLAIN aggregate inside their args or window spec (e.g.
    // `rank() over (order by count(*))`) still makes the query
    // aggregating, so descend into the children
    case w @ (AggExpr(_, _, _, Some(_), _, _) | RankExpr(_, _) |
              WinFunc(_, _, _, _)) =>
      Ast.children(w).exists(containsAgg)
    case other => Ast.children(other).exists(containsAgg)
  }

  /** All alias/table names visible from a FROM tree (lowercased) —
    * used to classify correlated predicates inside EXISTS. */
  private def relationAliases(r: Relation): Set[String] = r match {
    case TableRef(n, a) => Set(a.getOrElse(n).toLowerCase)
    case TableFnRel(fn, _, _, a) => Set(a.getOrElse(fn).toLowerCase)
    case MacroCallRel(fn, _, a) => Set(a.getOrElse(fn).toLowerCase)
    case SubqueryRel(_, a) => a.map(_.toLowerCase).toSet
    case ValuesRel(_, _, a) => a.map(_.toLowerCase).toSet
    case AliasedRel(_, a) => Set(a.toLowerCase)
    case JoinRel(l, rr, _, _) => relationAliases(l) ++ relationAliases(rr)
    case PositionalJoinRel(l, rr) =>
      relationAliases(l) ++ relationAliases(rr)
    case AsofJoinRel(l, rr, _, _) => relationAliases(l) ++ relationAliases(rr)
    case UsingJoinRel(l, rr, _, _) => relationAliases(l) ++ relationAliases(rr)
    case NaturalJoinRel(l, rr, _) => relationAliases(l) ++ relationAliases(rr)
    case PivotRel(rel, _, _, _) => relationAliases(rel)
    case UnpivotRel(rel, _, _, _) => relationAliases(rel)
    case LateralRel(l, _, a, _) => relationAliases(l) + a.toLowerCase
    case UnnestRel(l, _, a, _, _, _) =>
      l.map(relationAliases).getOrElse(Set.empty) ++ a.map(_.toLowerCase)
    case SampleRel(r2, _, _) => relationAliases(r2)
  }

  /** Top-level AND conjuncts of a predicate tree. */
  private def splitConjuncts(e: Expr): Seq[Expr] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** True if the expression references a column qualified with one of
    * `aliases`. */
  private def refersToAliases(e: Expr, aliases: Set[String]): Boolean = e match {
    case ColRef(Some(q), _) => aliases.contains(q.toLowerCase)
    case other => Ast.children(other).exists(refersToAliases(_, aliases))
  }

  /** Uncorrelated IN existence-flag machinery for one probe: a
    * broadcast 1-row (empty?, has-null?) summary plus the distinct
    * non-null key set, composed into a join-and-flag step. Returns
    * (applyStep, helperColumns, flagName). The ONE home for the IN
    * three-valued truth table — shared by the WHERE-residual and
    * HAVING lowerings (TRUE on match; FALSE against an empty set;
    * NULL when the probe is null or the set has nulls). */
  private def inFlagStep(sub: SetExpr, probe: Column, prefix: String, i: Int)
      : (DataFrame => DataFrame, List[String], String) = {
    val subDf = translate(sub)
    if (subDf.columns.length != 1)
      fail("IN (subquery) requires a single-column subquery")
    val keyN = s"${prefix}_key_$i"; val markN = s"${prefix}_mark_$i"
    val emptyN = s"${prefix}_empty_$i"; val nullN = s"${prefix}_null_$i"
    val flagN = s"${prefix}_flag_$i"
    val keyed = subDf.select(F.col(subDf.columns.head).as(keyN))
    val summary = keyed.agg(
      (F.count(F.lit(1)) === 0).as(emptyN),
      F.coalesce(F.max(F.col(keyN).isNull), F.lit(false)).as(nullN))
    val keys = keyed.filter(F.col(keyN).isNotNull).distinct()
      .withColumn(markN, F.lit(true))
    val step = (df: DataFrame) =>
      df.crossJoin(F.broadcast(summary))
        .join(keys, probe === F.col(keyN), "left_outer")
        .withColumn(flagN,
          F.when(F.col(markN).isNotNull, F.lit(true))
            .when(F.col(emptyN), F.lit(false))
            .when(probe.isNull || F.col(nullN),
              F.lit(null).cast(BooleanType))
            .otherwise(F.lit(false)))
    (step, List(flagN, markN, emptyN, nullN, keyN), flagN)
  }

  /** Uncorrelated quantified-comparison machinery for one probe: a
    * broadcast 1-row (count, has-null, min, max) summary of the
    * subquery column composed into a join-and-flag step — shared by
    * the boolean-position and HAVING lowerings. */
  private def quantFlagStep(sub: SetExpr, probe: Column, op: String,
                            all: Boolean, prefix: String, i: Int)
      : (DataFrame => DataFrame, List[String], String) = {
    val subDf = translate(sub)
    if (subDf.columns.length != 1)
      fail("quantified comparison requires a single-column subquery")
    val y = F.col(subDf.columns.head)
    val cntN = s"${prefix}_qc_$i"; val nulN = s"${prefix}_qn_$i"
    val minN = s"${prefix}_qmin_$i"; val maxN = s"${prefix}_qmax_$i"
    val flagN = s"${prefix}_flag_$i"
    val summary = subDf.agg(
      F.count(F.lit(1)).as(cntN),
      F.coalesce(F.max(y.isNull), F.lit(false)).as(nulN),
      F.min(y).as(minN), F.max(y).as(maxN))
    val step = (df: DataFrame) =>
      df.crossJoin(F.broadcast(summary))
        .withColumn(flagN, quantFlag(op, all, probe,
          F.col(cntN), F.col(nulN), F.col(minN), F.col(maxN)))
    (step, List(flagN, cntN, nulN, minN, maxN), flagN)
  }

  /** The quantified-comparison truth table over a (count, has-null,
    * min, max) summary of the subquery column — standard SQL 8.9 3VL.
    * ANY: TRUE iff some comparison is TRUE, decided through the
    * non-null bounds (`x < ANY ⟺ x < max`, `x <> ANY ⟺ min <> max ∨
    * min <> x`); FALSE against an EMPTY set; otherwise UNKNOWN when
    * the probe is null or the set has nulls, else FALSE. ALL: TRUE
    * against an empty set; FALSE iff some comparison is FALSE
    * (`x < ALL` fails iff `x >= min`, `x = ALL` iff a bound differs);
    * otherwise UNKNOWN when nulls are involved, else TRUE. min/max
    * ignore nulls, so an all-null set leaves the bound comparison
    * UNKNOWN (coalesced to "not decided") and the null arms decide. */
  private def quantFlag(op: String, all: Boolean, x: Column, cnt: Column,
                        hasNull: Column, mn: Column, mx: Column): Column = {
    val nullB = F.lit(null).cast(BooleanType)
    if (!all) {
      val anyTrue = op match {
        case "<"   => x < mx
        case "<="  => x <= mx
        case ">"   => x > mn
        case ">="  => x >= mn
        case "<>"  => (mn =!= mx) || (mn =!= x)
        case other => fail(s"unsupported quantified comparison op $other ANY")
      }
      F.when(cnt === 0, F.lit(false))
        .when(x.isNull, nullB)
        .when(F.coalesce(anyTrue, F.lit(false)), F.lit(true))
        .when(hasNull, nullB)
        .otherwise(F.lit(false))
    } else {
      val someFalse = op match {
        case "<"   => x >= mn
        case "<="  => x > mn
        case ">"   => x <= mx
        case ">="  => x < mx
        case "="   => (mn =!= x) || (mx =!= x)
        case other => fail(s"unsupported quantified comparison op $other ALL")
      }
      F.when(cnt === 0, F.lit(true))
        .when(x.isNull, nullB)
        .when(F.coalesce(someFalse, F.lit(false)), F.lit(false))
        .when(hasNull, nullB)
        .otherwise(F.lit(true))
    }
  }

  /** The ONE EXISTS correlation classifier (the conjunct and residual
    * lowerings previously each re-derived it). For a Leaf subquery,
    * splits its WHERE once into correlated and local conjuncts
    * against the non-shadowed outer aliases; returns None when
    * uncorrelated. Correlation outside WHERE has no decorrelated
    * lowering: outer refs in the select items are LEGAL and ignored
    * (EXISTS discards its projection — see [[existsProbeSide]]), but
    * outer refs in HAVING or GROUP BY fail with a graft message here
    * rather than a deep analyzer error later. */
  private def existsCorrInfo(sub: SetExpr, outerAliases: Set[String])
      : Option[(Query, Set[String], Seq[Expr], Seq[Expr])] = sub match {
    case Leaf(q0) =>
      // LIMIT k >= 1 cannot change existence — strip it so the common
      // hand-written `EXISTS (SELECT 1 ... LIMIT 1)` lowers; LIMIT 0
      // and OFFSET genuinely alter emptiness and stay loud errors
      val q = if (q0.limit.exists(_ >= 1) && q0.offset.isEmpty)
        q0.copy(limit = None) else q0
      val outerRefs = outerAliases -- relationAliases(q.sel.from)
      val (corr, local) = q.sel.where.map(splitConjuncts).getOrElse(Nil)
        .partition(refersToAliases(_, outerRefs))
      if (corr.nonEmpty) Some((q, outerRefs, corr, local))
      else if ((q.sel.having.toSeq ++ q.sel.groupBy)
                 .exists(refersToAliases(_, outerRefs)))
        fail("correlated EXISTS supports correlation in WHERE only")
      else None
    case _ => None
  }

  /** Rewrites a correlated EXISTS whose inner query is a GROUP-BY-less
    * HAVING aggregate — `EXISTS (SELECT ... FROM i WHERE i.k = o.k
    * HAVING count(*) > 5)`, the "more than N related rows" idiom.
    * Such an aggregate emits exactly ONE row even over an EMPTY
    * group, so existence equals the HAVING predicate evaluated on
    * the correlated group:
    *
    *   EXISTS(... WHERE corr ∧ local HAVING h)
    *     ⟺ EXISTS(SELECT 1 ... WHERE corr ∧ local
    *              GROUP BY corrKeys HAVING h)        — nonempty groups
    *     ∨ ( (SELECT h FROM i WHERE false)           — h on empty input
    *         ∧ NOT EXISTS(SELECT 1 ... WHERE corr ∧ local) )
    *
    * The first disjunct reaches the grouped derived-table rewrite
    * ([[degroupCorrSub]] — grouping by the correlation keys makes
    * each correlated set one group); the guard's scalar subquery is
    * UNCORRELATED (one row: aggregates over zero input — TRUE only
    * for shapes like `count(*) = 0`) and its empty scan folds
    * plan-side. Applies only to equality-correlated, window-free
    * shapes; anything else keeps its loud error. */
  private def rewriteHavingOnlyExists(e0: Expr,
                                      outerAliases: Set[String]): Expr =
    Ast.transformUp(e0) {
      case orig @ ExistsSubquery(Leaf(q0)) if q0.sel.groupBy.isEmpty &&
          q0.sel.having.nonEmpty && q0.sel.groupSets.isEmpty &&
          q0.sel.qualify.isEmpty && q0.offset.isEmpty &&
          q0.limit.forall(_ >= 1) =>
        val q = q0.copy(limit = None)
        val outerRefs = outerAliases -- relationAliases(q.sel.from)
        val (corr, local) = q.sel.where.map(splitConjuncts).getOrElse(Nil)
          .partition(refersToAliases(_, outerRefs))
        val eqOnly = corr.nonEmpty && corr.forall {
          case Cmp("=", l, r) =>
            refersToAliases(l, outerRefs) ^ refersToAliases(r, outerRefs)
          case _ => false
        }
        // HAVING may resolve the inner SELECT's item aliases
        val aliasMap = q.sel.items.collect {
          case SelectItem(ie, Some(a)) => a.toLowerCase -> ie }.toMap
        val h = Ast.transformUp(q.sel.having.get) {
          case ColRef(None, n) if aliasMap.contains(n.toLowerCase) =>
            aliasMap(n.toLowerCase)
        }
        // theta correlation (r5b): a GROUP-BY-less HAVING aggregate
        // row exists ALWAYS (one row even over empty input), so
        // EXISTS equals the HAVING evaluated on the aggregates — and
        // each aggregate over the theta-selected set IS the matching
        // theta-correlated scalar subquery (identical empty
        // semantics: COUNT reads 0, others NULL). COALESCE keeps
        // EXISTS two-valued.
        val thetaOk = corr.nonEmpty && corr.forall {
          case Cmp("=" | "<" | "<=" | ">" | ">=" | "<>", l, r) =>
            refersToAliases(l, outerRefs) ^ refersToAliases(r, outerRefs)
          case _ => false
        }
        if (refersToAliases(h, outerRefs) || containsWindow(h))
          orig
        else if (!eqOnly && thetaOk) {
          var rewritable = true
          val h2 = Ast.transformUp(h) {
            case a: AggExpr if a.window.isEmpty =>
              ScalarSubquery(Leaf(Query(q.sel.copy(distinct = false,
                items = Seq(SelectItem(a, None)), having = None),
                Nil, None, None)))
            case a: AggExpr => rewritable = false; a
          }
          if (!rewritable) orig else Coalesce(Seq(h2, BoolLit(false)))
        }
        else if (!eqOnly)
          orig
        else {
          val innerKeys = corr.map { case Cmp("=", l, r) =>
            if (refersToAliases(l, outerRefs)) r else l }
          val one = Seq(SelectItem(NumLit("1"), None))
          val grouped = ExistsSubquery(Leaf(q.copy(sel = q.sel.copy(
            distinct = false, items = one,
            groupBy = innerKeys, having = Some(h)))))
          // COALESCE keeps EXISTS two-valued: h over empty input may
          // be NULL (avg/max thresholds), which must read FALSE
          val emptyGuard = ScalarSubquery(Leaf(Query(Select(
            distinct = false,
            items = Seq(SelectItem(Coalesce(Seq(h, BoolLit(false))), None)),
            from = q.sel.from, where = Some(BoolLit(false)),
            groupBy = Nil, having = None), Nil, None, None)))
          val anyRows = ExistsSubquery(Leaf(q.copy(sel = q.sel.copy(
            distinct = false, items = one, having = None))))
          Or(grouped, And(emptyGuard, Not(anyRows)))
        }

      // probe IN (SELECT agg FROM i WHERE i.k = o.k HAVING h): the
      // set holds at most ONE row (the group aggregate, kept only
      // when h passes), so membership is `set nonempty ∧ probe =
      // value` — the nonempty test is the having-only EXISTS above
      // and the value a correlated scalar WITH the HAVING (NULL when
      // filtered out). 3VL: empty set → AND(false, NULL) = FALSE;
      // null probe/value propagate NULL through the equality.
      case InSubquery(probe, Leaf(q0)) if q0.sel.groupBy.isEmpty &&
          q0.sel.having.nonEmpty && q0.sel.groupSets.isEmpty &&
          q0.sel.qualify.isEmpty && q0.offset.isEmpty &&
          q0.limit.isEmpty && q0.sel.items.length == 1 && {
            val outerRefs = outerAliases -- relationAliases(q0.sel.from)
            val corr = q0.sel.where.map(splitConjuncts).getOrElse(Nil)
              .filter(refersToAliases(_, outerRefs))
            corr.nonEmpty && corr.forall {
              // theta conjuncts admitted r5b: both the nonempty test
              // (having-only EXISTS) and the value (scalar WITH the
              // HAVING) handle them
              case Cmp("=" | "<" | "<=" | ">" | ">=" | "<>", l, r) =>
                refersToAliases(l, outerRefs) ^ refersToAliases(r, outerRefs)
              case _ => false
            } && !(q0.sel.having.toSeq ++ q0.sel.items.map(_.e))
              .exists(e => refersToAliases(e, outerRefs) || containsWindow(e))
          } =>
        val nonempty =
          rewriteHavingOnlyExists(ExistsSubquery(Leaf(q0)), outerAliases)
        And(nonempty, Cmp("=", probe, ScalarSubquery(Leaf(q0))))
    }

  /** Rewrites a correlated subquery whose inner query AGGREGATES
    * (nonempty GROUP BY, optionally HAVING) into the FROM/WHERE shape
    * every correlated lowering already handles: the aggregate moves
    * into a derived table whose grouping keys grow the correlated
    * equality keys (projected under reserved `__gq_` names), and the
    * correlation becomes plain WHERE equalities against those
    * columns. `EXISTS (SELECT 1 FROM o WHERE o.k = c.k GROUP BY o.d
    * HAVING count(*) > 3)` thereby reaches the same semi-join
    * lowering as an unaggregated EXISTS, and membership/3VL flag
    * lowerings apply unchanged to grouped IN. Sound because a
    * NONEMPTY GROUP BY yields no output groups for a correlation key
    * with no rows — existence/membership is decided per surviving
    * group. (A GROUP-BY-less HAVING aggregate always emits one row
    * even over zero input, which this rewrite cannot express — that
    * shape keeps its existing loud error.) Returns the input
    * unchanged when the rewrite doesn't apply — uncorrelated, no
    * grouping, non-equality correlation, ROLLUP/CUBE/SETS, QUALIFY,
    * LIMIT/OFFSET, window functions (their partitions would span
    * correlation groups) — so those shapes keep their existing
    * lowerings or loud errors. */
  private def degroupCorrSub(sub: SetExpr, outerAliases: Set[String],
                             forExists: Boolean): SetExpr = sub match {
    // EXISTS over GROUP BY without HAVING (r5b): grouping cannot
    // change existence — drop it. This also admits THETA correlation
    // (the derived-table rewrite below is equality-only): the plain
    // correlated-EXISTS lowerings then apply, and the plan loses an
    // aggregation it never needed.
    case Leaf(q) if forExists && q.sel.groupBy.nonEmpty &&
        q.sel.having.isEmpty && q.sel.groupMode == "plain" &&
        q.sel.groupSets.isEmpty && q.sel.qualify.isEmpty &&
        q.limit.isEmpty && q.offset.isEmpty &&
        !q.sel.groupBy.exists(
          refersToAliases(_, outerAliases -- relationAliases(q.sel.from))) =>
      Leaf(Query(q.sel.copy(distinct = false,
        items = Seq(SelectItem(NumLit("1"), None)), groupBy = Nil),
        Nil, None, None))
    case Leaf(q) if q.sel.groupBy.nonEmpty && q.sel.groupMode == "plain" &&
        q.sel.groupSets.isEmpty && q.sel.qualify.isEmpty &&
        q.limit.isEmpty && q.offset.isEmpty =>
      val outerRefs = outerAliases -- relationAliases(q.sel.from)
      val (corr, local) = q.sel.where.map(splitConjuncts).getOrElse(Nil)
        .partition(refersToAliases(_, outerRefs))
      val pairs: Seq[Option[(Expr, Expr)]] = corr.map {
        case Cmp("=", l, r) if refersToAliases(r, outerRefs) &&
            !refersToAliases(l, outerRefs) => Some((l, r))
        case Cmp("=", l, r) if refersToAliases(l, outerRefs) &&
            !refersToAliases(r, outerRefs) => Some((r, l))
        case _ => None
      }
      val windowed =
        (q.sel.items.map(_.e) ++ q.sel.having).exists(containsWindow)
      if (corr.isEmpty || pairs.contains(None) || windowed ||
          (!forExists && q.sel.items.length != 1) ||
          (q.sel.having.toSeq ++ q.sel.groupBy)
            .exists(refersToAliases(_, outerRefs)))
        sub
      else {
        val kvs = pairs.flatten
        val keyNs = kvs.indices.map(j => s"__gq_k_$j")
        // EXISTS discards its projection, so items referencing the
        // outer scope (legal SQL there) are dropped rather than sent
        // to the derived-table translation, which could not resolve
        // them; IN keeps its single item under a stable alias
        val baseItems =
          if (forExists) {
            val kept =
              q.sel.items.filterNot(i => refersToAliases(i.e, outerRefs))
            if (kept.nonEmpty) kept else Seq(SelectItem(NumLit("1"), None))
          } else {
            val it = q.sel.items.head
            Seq(if (it.alias.isDefined) it else it.copy(alias = Some("__gq_v")))
          }
        val derived = Leaf(Query(q.sel.copy(
            distinct = false,
            items = baseItems ++ kvs.map(_._1).zip(keyNs)
              .map { case (e, n) => SelectItem(e, Some(n)) },
            where = local.reduceOption(And),
            groupBy = q.sel.groupBy ++ kvs.map(_._1)),
          Nil, None, None))
        val a = "__gq_sub"
        val cond = keyNs.zip(kvs.map(_._2)).map { case (n, o) =>
          Cmp("=", ColRef(Some(a), n), o): Expr }.reduce(And)
        val item =
          if (forExists) SelectItem(NumLit("1"), None)
          else SelectItem(ColRef(Some(a), baseItems.head.alias.get), None)
        Leaf(Query(Select(distinct = false, items = Seq(item),
          from = SubqueryRel(derived, Some(a)), where = Some(cond),
          groupBy = Nil, having = None), Nil, None, None))
      }
    case _ => sub
  }

  private var gteIdx = 0

  /** Grouped + HAVING EXISTS with THETA correlation, conjunct
    * position (r5b): `EXISTS (SELECT 1 FROM t WHERE t.k = o.k AND
    * t.x < o.y GROUP BY g HAVING h)` — does ANY group of the
    * theta-selected rows satisfy h? The theta comparison makes the
    * group content outer-row-dependent, so the inner side joins the
    * DISTINCT outer (key, theta-operand) tuple table on keys + theta
    * first, groups by (tuple, inner keys), filters by h, and the
    * surviving tuples semi/anti-join back — one aggregation per
    * tuple, never per outer row. Returns None when the shape doesn't
    * apply (equality-only and simpler shapes keep their existing
    * lowerings). */
  private def groupedThetaExistsSurvivors(
      q: Query, outerRefs: Set[String], outer: DataFrame)
      : Option[(DataFrame, Column)] =
    groupedThetaSurvivors(q, outerRefs, outer, wantValue = false)
      .map { case (s, c, _) => (s, c) }

  /** Shared grouped-theta survivor machinery (r5b): the DISTINCT
    * outer (key, theta-operand) tuple table joins the inner relation
    * on keys + theta, groups by (tuple, inner keys), filters by the
    * substituted HAVING. `wantValue = false` (EXISTS) returns the
    * surviving tuples; `wantValue = true` (IN) additionally carries
    * the single select item's value per surviving group, so
    * membership is `tuple match AND probe = value`. Returns None when
    * the shape doesn't apply — equality-only (degroup handles it),
    * outer refs in HAVING/keys/item, windows, no theta. */
  private def groupedThetaSurvivors(
      q: Query, outerRefs: Set[String], outer: DataFrame,
      wantValue: Boolean)
      : Option[(DataFrame, Column, Option[Column])] = {
    if (q.sel.groupBy.isEmpty ||
        (!wantValue && q.sel.having.isEmpty) ||
        (wantValue && q.sel.items.length != 1) ||
        q.sel.groupMode != "plain" || q.sel.groupSets.nonEmpty ||
        q.sel.qualify.nonEmpty || q.limit.nonEmpty || q.offset.nonEmpty)
      return None
    val aliasMap = q.sel.items.collect {
      case SelectItem(ie, Some(a)) => a.toLowerCase -> ie }.toMap
    val h0 = q.sel.having.map(h => Ast.transformUp(h) {
      case ColRef(None, n) if aliasMap.contains(n.toLowerCase) =>
        aliasMap(n.toLowerCase)
    })
    val item0 = if (wantValue) Some(q.sel.items.head.e) else None
    val checked = h0.toSeq ++ item0
    if (checked.exists(e =>
          refersToAliases(e, outerRefs) || containsWindow(e)) ||
        q.sel.groupBy.exists(refersToAliases(_, outerRefs)))
      return None
    val i = gteIdx; gteIdx += 1
    val (keyPairs, thetas, gens, genDefs, local) =
      corrSplitG(q, outerRefs, "subquery", allowTheta = true,
        Some(s"__gte_${i}_ge"))
    // equality-only: the degroup derived-table rewrite handles it
    if (thetas.isEmpty && gens.isEmpty) return None
    val keyNames = keyPairs.indices.map(j => s"__gte_${i}_k$j")
    val tNames = thetas.indices.map(j => s"__gte_${i}_t$j")
    val gNames = q.sel.groupBy.indices.map(j => s"__gte_${i}_g$j")
    val geNames = genDefs.map(_._1)
    var inner = drainGenHoists(translateRelation(q.sel.from))
    local.reduceOption(And).foreach(p =>
      inner = inner.filter(exprToCol(p, None)))
    val tuples = outer.select(
      keyPairs.zip(keyNames).map { case ((_, oe), n) =>
        exprToCol(oe, None).as(n) } ++
      thetas.zip(tNames).map { case ((_, _, oe), n) =>
        exprToCol(oe, None).as(n) } ++
      genDefs.map { case (n, oe) =>
        exprToCol(oe, None).as(n) }: _*).distinct()
    val joinCond =
      (keyPairs.zip(keyNames).map { case ((ik, _), n) =>
        exprToCol(ik, None) === F.col(n) } ++
       thetas.zip(tNames).map { case ((ie, op, _), n) =>
        cmp(op, exprToCol(ie, None), F.col(n)) } ++
       gens.map(exprToCol(_, None))).reduce(_ && _)
    var aggs = Vector.empty[(String, AggExpr)]
    def subst(e: Expr): Expr = Ast.transformUp(e) {
      case a: AggExpr if a.window.isEmpty =>
        val n = aggs.find(_._2 == a).map(_._1).getOrElse {
          val nn = s"__gte_${i}_a${aggs.size}"
          aggs :+= (nn -> a); nn
        }
        ColRef(None, n)
      case c: ColRef if q.sel.groupBy.exists(k => sameExpr(k, c)) =>
        ColRef(None,
          gNames(q.sel.groupBy.indexWhere(k => sameExpr(k, c))))
    }
    val hSub = h0.map(subst)
    val valSub = item0.map(subst)
    if (aggs.isEmpty && !wantValue)
      return None // EXISTS form needs aggregates in h
    val aggCols =
      if (aggs.isEmpty) Seq(F.count(F.lit(1)).as(s"__gte_${i}_n"))
      else aggs.map { case (n, a) => aggColumn(a).as(n) }
    var grouped = tuples.join(inner, joinCond, "inner")
      .groupBy((keyNames ++ tNames ++ geNames).map(F.col) ++
        q.sel.groupBy.zip(gNames).map { case (g, n) =>
          exprToCol(g, None).as(n) }: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    hSub.foreach(h => grouped = grouped.filter(exprToCol(h, None)))
    val vName = s"__gte_${i}_v"
    val tupleCols = (keyNames ++ tNames ++ geNames).map(F.col)
    val survivors = valSub match {
      case Some(v) =>
        grouped.select(tupleCols :+ exprToCol(v, None).as(vName): _*)
          .distinct()
      case None =>
        grouped.select(tupleCols: _*).distinct()
    }
    // two-valued in conjunct position: tuples with NULL keys/operands
    // never joined any inner row under pure comparisons, are absent
    // from survivors, and the === back-join reads false (anti reads
    // true). GENERAL tuple columns (r5c) join back NULL-SAFELY: an
    // IS NULL arm can select rows for a NULL-operand tuple, and that
    // surviving tuple must reach its outer rows.
    val cond =
      (keyPairs.zip(keyNames).map { case ((_, oe), n) =>
        exprToCol(oe, None) === F.col(n) } ++
       thetas.zip(tNames).map { case ((_, _, oe), n) =>
        exprToCol(oe, None) === F.col(n) } ++
       genDefs.map { case (n, oe) =>
        exprToCol(oe, None) <=> F.col(n) }).reduce(_ && _)
    lastSurvivorParts = Some(SurvivorParts(
      (keyNames ++ tNames ++ geNames).toList,
      keyPairs.map(_._2) ++ thetas.map(_._3) ++ genDefs.map(_._2),
      if (valSub.isDefined) Some(vName) else None,
      nullSafe = List.fill(keyNames.length + tNames.length)(false) :::
        List.fill(geNames.length)(true)))
    Some((survivors, cond, valSub.map(_ => F.col(vName))))
  }

  /** Structured view of the last [[groupedThetaSurvivors]] result for
    * callers needing more than a semi-join (the NOT IN flag wiring):
    * tuple column names, the matching outer expressions, and the
    * value column name. */
  private final case class SurvivorParts(tupleNames: List[String],
                                         outerExprs: Seq[Expr],
                                         valueName: Option[String],
                                         nullSafe: List[Boolean])
  private var lastSurvivorParts: Option[SurvivorParts] = None

  /** Full 3VL membership flag from grouped-theta/general survivors
    * (r6, extracted from the r5b conjunct NOT-IN wiring so FLAG
    * positions can ride the same machinery): per-tuple summary
    * (present, any-null surviving value) plus distinct non-null
    * (tuple, value) matches, both LEFT-joined onto `from0` — flag
    * TRUE on a value match, FALSE for a tuple with no surviving
    * groups, NULL when the probe is null or a surviving value is
    * null without a match. General tuple columns join null-safely
    * (IS NULL arms legitimately select rows for NULL-operand
    * tuples). Returns the joined frame and every helper column it
    * added (including `flagN` itself). */
  private def survivorMembershipFlag(from0: DataFrame, probe: Column,
      survivors: DataFrame, flagN: String): (DataFrame, List[String]) = {
    val parts = lastSurvivorParts.get
    val vn = parts.valueName.get
    val i2 = gteIdx; gteIdx += 1
    val presentN = s"__gte_${i2}_present"
    val nullN = s"__gte_${i2}_nul"
    val markN = s"__gte_${i2}_mark"
    val summary = survivors
      .groupBy(parts.tupleNames.map(F.col): _*)
      .agg(F.lit(true).as(presentN),
        F.coalesce(F.max(F.col(vn).isNull), F.lit(false)).as(nullN))
    val mNs = parts.tupleNames.map(_ + "_m")
    val matches = survivors.filter(F.col(vn).isNotNull)
      .select(parts.tupleNames.zip(mNs).map { case (a, b) =>
        F.col(a).as(b) } :+ F.col(vn): _*)
      .distinct().withColumn(markN, F.lit(true))
    def tCmp(oe: Expr, n: String, ns: Boolean): Column =
      if (ns) exprToCol(oe, None) <=> F.col(n)
      else exprToCol(oe, None) === F.col(n)
    val sCond = parts.outerExprs.zip(parts.tupleNames)
      .zip(parts.nullSafe)
      .map { case ((oe, n), ns) => tCmp(oe, n, ns) }
      .reduce(_ && _)
    val mCond = (parts.outerExprs.zip(mNs)
      .zip(parts.nullSafe).map {
        case ((oe, n), ns) => tCmp(oe, n, ns) } :+
      (probe === F.col(vn))).reduce(_ && _)
    val flag =
      F.when(F.col(markN).isNotNull, F.lit(true))
        .when(F.col(presentN).isNull, F.lit(false))
        .when(probe.isNull || F.col(nullN),
          F.lit(null).cast(BooleanType))
        .otherwise(F.lit(false))
    val out = from0.join(summary, sCond, "left_outer")
      .join(matches, mCond, "left_outer")
      .withColumn(flagN, flag)
    (out, flagN :: markN :: presentN :: nullN :: vn ::
      (parts.tupleNames ::: mNs))
  }

  /** Inner side + join condition for a correlated EXISTS in conjunct
    * position: local conjuncts filter the inner relation, correlated
    * conjuncts become the semi/anti join condition. */
  private def correlatedExistsSide(q: Query, corr: Seq[Expr], local: Seq[Expr],
                                   outerRefs: Set[String])
      : (DataFrame, Column) = {
    if (q.sel.groupBy.nonEmpty || q.sel.having.nonEmpty ||
        q.sel.qualify.nonEmpty || q.limit.nonEmpty || q.offset.nonEmpty)
      fail("correlated EXISTS subquery supports FROM/WHERE only")
    var inner = drainGenHoists(translateRelation(q.sel.from))
    local.reduceOption(And).foreach(p =>
      inner = inner.filter(exprToCol(p, None)))
    // r8: nested uncorrelated scalars inside the join condition hoist
    // onto the inner frame (the condition joins outer vs inner, so a
    // cross-joined inner column resolves naturally)
    val corr2 = corr.map(hoistNestedScalars(_,
      outerRefs ++ relationAliases(q.sel.from), "EXISTS"))
    inner = drainGenHoists(inner)
    (inner,
      corr2.reduceOption(And).map(exprToCol(_, None)).getOrElse(F.lit(true)))
  }

  /** One-row nonempty probe for an uncorrelated EXISTS. Existence
    * ignores the subquery's projection, so a plain Leaf's select
    * items are replaced with a literal (outer refs there — legal
    * SQL — never reach the analyzer) and every shape is cut to
    * `select 1 ... limit 1`: ONE row decides the semi/anti join or
    * flag, rather than materializing (and at scale broadcasting) the
    * full inner result. GROUP BY / HAVING / ORDER BY shapes keep
    * their items (HAVING may resolve select aliases); LIMIT/OFFSET
    * are preserved by the inner translation first, so `limit 0` /
    * `offset n` still decide emptiness correctly. */
  private def existsProbeSide(sub: SetExpr): DataFrame = {
    val stripped = sub match {
      case Leaf(q) if q.sel.groupBy.isEmpty && q.sel.having.isEmpty &&
          q.orderBy.isEmpty =>
        Leaf(q.copy(sel = q.sel.copy(distinct = false,
          items = Seq(SelectItem(NumLit("1"), None)))))
      case other => other
    }
    translate(stripped).select(F.lit(1).as("__exists_probe")).limit(1)
  }

  /** Splits a correlated subquery's WHERE for the decorrelated
    * lowerings: equality conjuncts become `(innerExpr, outerExpr)`
    * group/join key pairs; when `allowTheta`, range conjuncts
    * (<, <=, >, >=, <>) between an inner-only and an outer-only
    * expression are returned normalized as `(innerExpr, op,
    * outerExpr)` in source order. A SINGLE theta decorrelates through
    * a per-group min/max (`∃ t: t < x  ⟺  min(t) < x`); several are a
    * JOINT condition min/max cannot decompose, and the callers switch
    * to the distinct-outer-tuple lowering instead.
    *
    * r5c: with `genPrefix` set, conjuncts the classifier cannot
    * reduce to key/theta pairs — correlation under OR or NOT,
    * mixed-side comparisons (`i.a - o.a < 5`), BETWEEN / LIKE /
    * IS NULL / CASE over outer refs — are returned as GENERAL
    * predicates with every outer column reference substituted by a
    * reserved tuple-column name, plus the (name → outer ColRef)
    * definitions. The callers' distinct-outer-tuple lowerings
    * evaluate them row-by-row inside the tuple join: each embedded
    * equality stays a top-level comparison after substitution, so
    * Catalyst still extracts hash-join keys when the condition has
    * any; a pure-OR correlation is a nested-loop join against the
    * DISTINCT tuple table — the irreducible cost of the semantics,
    * bounded by |distinct outer tuples| × |inner|, never
    * |outer| × |inner|. Conjuncts nesting subqueries, aggregates, or
    * window functions stay loud (not evaluable in a join condition),
    * as does everything general when `genPrefix` is None. */
  /** Uncorrelated scalar subqueries hoisted out of general correlated
    * conjuncts (36ax, r8): reserved name → guarded broadcast 1-row
    * frame. The corrSplitG caller MUST drain these onto its inner
    * frame (drainGenHoists) before evaluating the gen conjuncts in a
    * join condition; an unconsumed hoist surfaces as a loud
    * unresolved-column error, never a wrong result. */
  private val genHoists =
    scala.collection.mutable.ListBuffer.empty[(String, DataFrame)]

  private def drainGenHoists(inner: DataFrame): DataFrame = {
    val out = genHoists.foldLeft(inner) { case (df, (_, one)) =>
      df.crossJoin(F.broadcast(one))
    }
    genHoists.clear()
    out
  }

  /** r8 (36ax closing): replaces UNCORRELATED nested scalar
    * subqueries inside a correlated predicate with guarded broadcast
    * 1-row columns — recorded in genHoists for the caller to
    * cross-join onto its inner frame (drainGenHoists) so the
    * reserved name resolves inside the join condition. The guard is
    * the standard scalar contract (0 rows → NULL, >1 rows → loud
    * runtime error). A nested scalar referencing the outer or inner
    * scope stays a loud wall. */
  /** Does any expression INSIDE `se` (its selects/wheres/havings and
    * nested subqueries, at any depth) reference one of `aliases`,
    * honoring standard shadowing (a relation re-introducing the alias
    * hides the outer one)? ScalarSubquery is an Expr-traversal LEAF,
    * so refersToAliases alone cannot see in — this walks the query
    * tree. */
  private def setExprRefers(se: SetExpr, aliases: Set[String]): Boolean = {
    def exprRefers(e: Expr, as: Set[String]): Boolean = e match {
      case ColRef(Some(q), _) => as.contains(q.toLowerCase)
      case InSubquery(p, s2)  => exprRefers(p, as) || setRefers(s2, as)
      case ExistsSubquery(s2) => setRefers(s2, as)
      case ScalarSubquery(s2) => setRefers(s2, as)
      case QuantCmp(_, _, p, s2) => exprRefers(p, as) || setRefers(s2, as)
      case other => Ast.children(other).exists(exprRefers(_, as))
    }
    def setRefers(s: SetExpr, as: Set[String]): Boolean = s match {
      case Leaf(q) =>
        val vis = as -- relationAliases(q.sel.from)
        if (vis.isEmpty) false
        else {
          val exprs = q.sel.items.map(_.e) ++ q.sel.where ++
            q.sel.groupBy ++ q.sel.having ++ q.sel.qualify ++
            q.sel.groupSets.flatten ++ q.orderBy.map(_.e)
          exprs.exists(exprRefers(_, vis))
        }
      case SetOp(_, l, r) => setRefers(l, as) || setRefers(r, as)
      case WithQuery(ctes, body, _, _) =>
        ctes.exists(c => setRefers(c._2, as)) || setRefers(body, as)
      case OrderedSet(body, ob, _, _, _) =>
        setRefers(body, as) || ob.exists(o => exprRefers(o.e, as))
    }
    setRefers(se, aliases)
  }

  private def hoistNestedScalars(e: Expr, taboo: Set[String],
                                 what: String): Expr = e match {
    case s @ ScalarSubquery(sub) =>
      if (setExprRefers(sub, taboo))
        fail(s"correlated $what predicates may not nest CORRELATED " +
          "subqueries inside a non-conjunct correlation")
      // translate(sub) may recursively enter corrSplitG, whose entry
      // hygiene clears genHoists — save/restore so a pending sibling
      // hoist survives the nested translation (r8 ADVICE)
      val savedHoists = genHoists.toList
      val subDf =
        try translate(sub)
        finally { genHoists.clear(); genHoists ++= savedHoists }
      if (subDf.columns.length != 1)
        fail("scalar subquery requires a single-column subquery")
      val nm = s"__nsc_${genHoists.size}"
      // positional rename: dotted generated names break F.col (see
      // the uncorrelated lowering's note)
      val one = subDf.toDF("__v0")
        .agg(F.first(F.col("__v0")).as("__v"), F.count(F.lit(1)).as("__c"))
        .select(
          F.when(F.col("__c") > 1, F.raise_error(F.lit(
            "scalar subquery returned more than one row")))
            .otherwise(F.col("__v")).as(nm))
      genHoists += ((nm, one))
      ColRef(None, nm)
    case other => Ast.mapChildren(other, hoistNestedScalars(_, taboo, what))
  }

  private def corrSplitG(q: Query, outerRefs: Set[String], what: String,
                         allowTheta: Boolean, genPrefix: Option[String])
      : (Seq[(Expr, Expr)], Seq[(Expr, String, Expr)],
         Seq[Expr], Seq[(String, Expr)], Seq[Expr]) = {
    genHoists.clear() // hygiene: a failed earlier lowering must not leak
    val (corr, local) = q.sel.where.map(splitConjuncts).getOrElse(Nil)
      .partition(refersToAliases(_, outerRefs))
    def flip(op: String): String = op match {
      case "<" => ">"
      case "<=" => ">="
      case ">" => "<"
      case ">=" => "<="
      case "<>" => "<>"
    }
    val eq = Seq.newBuilder[(Expr, Expr)]
    var theta = List.empty[(Expr, String, Expr)]
    val gen = Seq.newBuilder[Expr]
    val genDefs = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), (String, Expr)]
    // a key/theta pair's OUTER side must not reference the subquery's
    // own aliases (a MIXED-side expression like `i.a + o.b` has no
    // side split — r5c routes it to the general lowering; previously
    // it misclassified and died in the analyzer)
    val innerAliases = relationAliases(q.sel.from)
    def checkEvaluable(e: Expr): Unit = e match {
      case s: ScalarSubquery =>
        // r8 (36ax closing): an UNCORRELATED nested scalar is a
        // query-wide constant — hoistable to a guarded broadcast
        // 1-row column on the inner frame (see substitute below).
        // One referencing the outer or inner scope stays loud.
        if (setExprRefers(s.sub, outerRefs ++ innerAliases))
          fail(s"correlated $what predicates may not nest CORRELATED " +
            "subqueries inside a non-conjunct correlation")
      case _: InSubquery | _: ExistsSubquery | _: QuantCmp =>
        fail(s"correlated $what predicates may not nest subqueries " +
          "inside a non-conjunct correlation")
      case _: AggExpr | _: WinFunc | _: RankExpr =>
        fail(s"correlated $what predicates may not contain aggregates " +
          "or window functions")
      case other => Ast.children(other).foreach(checkEvaluable)
    }
    def substitute(e: Expr): Expr = e match {
      case s: ScalarSubquery =>
        // checkEvaluable verified it is uncorrelated: the shared
        // hoist lowers it once; the caller's drainGenHoists puts the
        // column on the inner frame of the tuple join
        hoistNestedScalars(s, outerRefs ++ innerAliases, what)
      case c @ ColRef(Some(qual), n) if outerRefs.contains(qual.toLowerCase) =>
        val key = (qual.toLowerCase, n.toLowerCase)
        val nm = genDefs.getOrElseUpdate(key,
          (s"${genPrefix.get}${genDefs.size}", c))._1
        ColRef(None, nm)
      case other => Ast.mapChildren(other, substitute)
    }
    def outerSide(e: Expr): Boolean =
      refersToAliases(e, outerRefs) && !refersToAliases(e, innerAliases)
    corr.foreach {
      case Cmp("=", l, r) if outerSide(r) &&
          !refersToAliases(l, outerRefs) => eq += ((l, r))
      case Cmp("=", l, r) if outerSide(l) &&
          !refersToAliases(r, outerRefs) => eq += ((r, l))
      case Cmp(op @ ("<" | "<=" | ">" | ">=" | "<>"), l, r)
          if allowTheta && outerSide(r) &&
            !refersToAliases(l, outerRefs) => theta ::= ((l, op, r))
      case Cmp(op @ ("<" | "<=" | ">" | ">=" | "<>"), l, r)
          if allowTheta && outerSide(l) &&
            !refersToAliases(r, outerRefs) => theta ::= ((r, flip(op), l))
      case other if genPrefix.isDefined =>
        checkEvaluable(other)
        gen += substitute(other)
      case other =>
        val accepted = if (allowTheta)
          "equalities or a <, <=, >, >=, <> comparison" else "equalities"
        fail(s"correlated $what predicates in this position must be " +
          s"$accepted, got $other")
    }
    (eq.result(), theta.reverse, gen.result(),
      genDefs.values.toSeq, local)
  }

  /** [[corrSplitG]] without the general-predicate lowering (positions
    * where only key/theta decorrelations exist). */
  private def corrSplit(q: Query, outerRefs: Set[String], what: String,
                        allowTheta: Boolean)
      : (Seq[(Expr, Expr)], Seq[(Expr, String, Expr)], Seq[Expr]) = {
    val (eq, theta, _, _, local) =
      corrSplitG(q, outerRefs, what, allowTheta, None)
    (eq, theta, local)
  }

  /** Equality-only corrSplit (positions with no theta lowering). */
  private def corrKeyPairs(q: Query, outerRefs: Set[String], what: String)
      : (Seq[(Expr, Expr)], Seq[Expr]) = {
    val (pairs, _, local) = corrSplit(q, outerRefs, what, allowTheta = false)
    (pairs, local)
  }

  /** The decorrelating aggregates for a theta conjunct: per-group min
    * for <, <= (`∃ t: t < x ⟺ min(t) < x`), max for >, >=; for <>
    * the (count, min, max) triple (`∃ t: t <> x ⟺ count(t) > 0 ∧
    * (min ≠ max ∨ min ≠ x)` — two distinct values guarantee one
    * differs from any x; one value just compares). min/max/count
    * skip NULLs, so rows whose theta expression is NULL never satisfy
    * the (3VL-unknown) comparison — as SQL requires. Returns
    * (helperName, aggColumn) pairs; [[thetaCond]] consumes the same
    * names in order. */
  private def thetaAggCols(c: Column, op: String, prefix: String)
      : Seq[(String, Column)] = op match {
    case "<" | "<=" => Seq(prefix -> F.min(c))
    case ">" | ">=" => Seq(prefix -> F.max(c))
    case "<>" => Seq(s"${prefix}_c" -> F.count(c),
      s"${prefix}_n" -> F.min(c), s"${prefix}_x" -> F.max(c))
  }

  /** The outer-side comparison over [[thetaAggCols]]'s aggregates.
    * NULL-safe only as SQL 3VL dictates: any NULL operand yields
    * NULL, which every caller collapses with `<=> true`. */
  private def thetaCond(op: String, cols: Seq[Column], outer: Column)
      : Column = op match {
    case "<>" =>
      val Seq(cnt, mn, mx) = cols
      outer.isNotNull && cnt > 0 && (mn =!= mx || mn =!= outer)
    case _ => cmp(op, cols.head, outer)
  }

  /** Splits a WHERE tree into (top-level-conjunct [NOT] IN/EXISTS
    * subqueries with negation flags, residual predicate). */
  private def extractInSubqueries(e: Expr): (Seq[(Expr, Boolean)], Option[Expr]) =
    e match {
      case s: InSubquery => (Seq((s, false)), None)
      case Not(s: InSubquery) => (Seq((s, true)), None)
      case s: ExistsSubquery => (Seq((s, false)), None)
      case Not(s: ExistsSubquery) => (Seq((s, true)), None)
      case And(l, r) =>
        val (ls, lr) = extractInSubqueries(l)
        val (rs, rr) = extractInSubqueries(r)
        val residual = (lr, rr) match {
          case (Some(a), Some(b)) => Some(And(a, b))
          case (a, b) => a.orElse(b)
        }
        (ls ++ rs, residual)
      // anything else (incl. IN-subqueries under OR / nested NOT)
      // stays in the residual for existence-flag lowering
      case other => (Nil, Some(other))
    }

  // ---- projection ---------------------------------------------------

  private def selectCols(items: Seq[SelectItem], in: DataFrame): Seq[Column] =
    items.flatMap {
      case SelectItem(Star(None), _) => Seq(F.col("*"))
      case SelectItem(Star(Some(t)), _) => Seq(F.col(s"${t.toLowerCase}.*"))
      case SelectItem(StarMod(q, exclude, replace), _) =>
        // `* EXCLUDE/REPLACE`: expand the star against the input
        // frame, drop excluded names, swap replaced columns in place
        // (original position AND name) — unknown names are loud
        val base: Seq[String] = q match {
          case None    => in.columns.toSeq
          case Some(t) => in.select(F.col(s"${t.toLowerCase}.*")).columns.toSeq
        }
        def resolve(n: String, what: String): String =
          base.find(_.equalsIgnoreCase(n)).getOrElse(
            fail(s"$what column '$n' is not in the ${
              q.map(t => s"$t.*").getOrElse("*")} expansion"))
        val excluded = exclude.map(resolve(_, "EXCLUDE")).toSet
        val replaced = replace.map { case (e, n) =>
          resolve(n, "REPLACE") -> e }.toMap
        base.filterNot(excluded).map { n =>
          replaced.get(n) match {
            case Some(e) => exprToCol(e, None).as(n)
            case None    => q.map(t => F.col(s"${t.toLowerCase}.$n"))
                              .getOrElse(F.col(n))
          }
        }
      case SelectItem(FuncCall("unnest", args), alias) =>
        if (args.length != 1) fail("unnest takes exactly one array argument")
        // inline the array expression INSIDE explode — exploding a
        // pre-materialized array column makes Generate copy the
        // backing array per emitted element (~13× slower, measured r3)
        Seq(F.explode(exprToCol(args.head, None)).as(alias.getOrElse("unnest")))
      case SelectItem(e, alias) =>
        Seq(exprToCol(e, None).as(alias.getOrElse(defaultName(e, in))))
    }

  /** Output name for an unaliased select item: the schema-cased column
    * name for bare refs (reference maintains source case —
    * test_select.py:104), else a deterministic lowered rendering. */
  private def defaultName(e: Expr, in: DataFrame): String = e match {
    // hoisted scalar-subquery columns: an unaliased item must NOT
    // surface under the internal helper name, which the post-
    // projection helper drop would remove from the output
    case ColRef(_, n) if n.startsWith("__ssq_") || n.startsWith("__csq_") =>
      "scalar_subquery" + n.dropWhile(!_.isDigit).takeWhile(_.isDigit)
    case ColRef(_, n) =>
      in.columns.find(_.equalsIgnoreCase(n)).getOrElse(n)
    case AggExpr(f, d, Star(_), _, _, _) =>
      if (d) s"${f}_distinct_star" else s"${f}_star"
    // the ROLLUP/CUBE path wraps hoisted scalar subqueries in min():
    // keep the plain path's user-visible name, not min___ssq_N
    case AggExpr(_, _, ColRef(_, n), _, _, _)
        if n.startsWith("__ssq_") || n.startsWith("__csq_") =>
      "scalar_subquery" + n.dropWhile(!_.isDigit).takeWhile(_.isDigit)
    case AggExpr(f, d, ColRef(_, n), _, _, _) =>
      if (d) s"${f}_distinct_$n" else s"${f}_$n"
    case _ => render(e)
  }

  private def render(e: Expr): String = e match {
    case ColRef(_, n) => n.toLowerCase
    case NumLit(t) => t
    case StrLit(v) => v
    case Arith(op, l, r) => s"${render(l)}$op${render(r)}"
    case Cast(x, t, sf) => s"cast_${render(x)}_$t${if (sf) "_try" else ""}"
    case Coalesce(as) => s"coalesce_${as.map(render).mkString("_")}"
    case _ => "expr"
  }

  // ---- expression lowering ------------------------------------------

  def exprToCol(e: Expr, in: Option[DataFrame]): Column = e match {
    case ColRef(Some(q), n) if flatAliases.contains(q.toLowerCase) =>
      F.col(n)
    case ColRef(Some(q), n) => F.col(s"${q.toLowerCase}.$n")
    case ColRef(None, n) if lambdaEnv.contains(n.toLowerCase) =>
      lambdaEnv(n.toLowerCase)
    case ColRef(None, n)    => F.col(n)
    case Star(None)         => F.col("*")
    case Star(Some(t))      => F.col(s"${t.toLowerCase}.*")
    case NumLit(t) =>
      if (t.matches("[0-9]+") && t.length < 19) F.lit(t.toLong)
      else F.lit(t.toDouble)
    case NullLit()  => F.lit(null)
    case StrLit(v)  => F.lit(v)
    case BoolLit(v) => F.lit(v)
    case NowLit()   => F.current_timestamp()
    case TodayLit() => F.current_date()
    case TimestampLit(d, t) => F.to_timestamp(F.lit(s"$d $t"))
    case DateLit(v) => F.to_date(F.lit(v))
    case Arith(op @ ("+" | "-"), l, i: IntervalLit) =>
      shiftByInterval(exprToCol(l, in), i, negate = op == "-")
    case Arith("+", i: IntervalLit, r) =>
      shiftByInterval(exprToCol(r, in), i, negate = false)
    case Arith("-", _: IntervalLit, _) =>
      fail("cannot subtract a date/timestamp from an INTERVAL")
    case _: IntervalLit =>
      fail("INTERVAL literal is only valid as a +/- operand of a date/timestamp")
    case Arith(op, l, r) => arith(op, exprToCol(l, in), exprToCol(r, in))
    case Neg(x) => -exprToCol(x, in)
    case CaseWhen(bs, o) =>
      bs.tail.foldLeft(
        F.when(exprToCol(bs.head._1, in), exprToCol(bs.head._2, in))) {
        case (acc, (c, v)) => acc.when(exprToCol(c, in), exprToCol(v, in))
      }.otherwise(exprToCol(o, in))
    case Cast(x, t, sf) => castCol(exprToCol(x, in), t, sf)
    case Coalesce(args) => F.coalesce(args.map(exprToCol(_, in)): _*)
    case a: AggExpr if a.window.isDefined =>
      if (a.func == "string_agg" || a.func == "array_agg")
        orderedSetWindowed(a, exprToCol(_, None))
      else {
        // static arg type for the DISTINCT sum/avg typed fold —
        // analysis-only (df.select(...).schema runs no job)
        val at = (a.arg, resolveFrame) match {
          case _ if !((a.distinct && (a.func == "sum" || a.func == "avg")) ||
              a.window.exists(_.exclude != "no others")) => None
          case (Star(_), _) | (_, None) => None
          case (e, Some(df)) =>
            scala.util.Try(df.select(exprToCol(e, None)).schema.head.dataType).toOption
        }
        windowedAgg(a, exprToCol(_, None), at)
      }
    case a: AggExpr => aggColumn(a)
    case RankExpr(dense, w) =>
      (if (dense) F.dense_rank() else F.rank()).over(windowSpec(w))
    case WinFunc(name, args, w, ign) =>
      winFunc(name, args, exprToCol(_, in), ign).over(windowSpec(w))
    case And(l, r) => exprToCol(l, in) && exprToCol(r, in)
    case Or(l, r)  => exprToCol(l, in) || exprToCol(r, in)
    case Not(x)    => !exprToCol(x, in)
    // row-value comparisons (r9): desugar to the standard's
    // element-wise form — `=` is the AND chain (3VL exact), `<` is
    // lexicographic — then translate the scalar expression
    case Cmp(op, l: RowTuple, r) => exprToCol(rowCmpExpr(op, l, r), in)
    case Cmp(op, l, r: RowTuple) => exprToCol(rowCmpExpr(op, l, r), in)
    case Cmp(op, l, r) => cmp(op, exprToCol(l, in), exprToCol(r, in))
    case Between(x, lo, hi) =>
      exprToCol(x, in).between(exprToCol(lo, in), exprToCol(hi, in))
    case InList(x: RowTuple, vs, neg) =>
      // `(a,b) IN ((1,2),(3,4))` → OR of row equalities; NOT IN via
      // the negation (3VL rides the And/Or/Not lowering)
      val m = vs.map(v => rowCmpExpr("=", x, v)).reduce(Or)
      exprToCol(if (neg) Not(m) else m, in)
    case InList(x, vs, neg) =>
      val c = inListCol(exprToCol(x, in), vs, v => exprToCol(v, in))
      if (neg) !c else c
    case IsNull(x, neg) =>
      if (neg) exprToCol(x, in).isNotNull else exprToCol(x, in).isNull
    case Like(x, p, esc) => likeCol(exprToCol(x, in), p, esc, ci = false)
    case ILike(x, p, esc) => likeCol(exprToCol(x, in), p, esc, ci = true)
    // `e[i]` subscript (r11): try_element_at — 1-based like DuckDB's
    // list subscript, NULL (not an ANSI error) when out of range,
    // and the same call works on maps (absent key reads NULL)
    case Subscript(x, i) => subscriptCol(x, i, exprToCol(_, in))
    // `e[lo:hi]` list slice (r11b) — DuckDB slicing semantics
    case ArraySlice(x, lo, hi) => sliceCol(x, lo, hi, exprToCol(_, in))
    // chained struct-field access (r11): the base resolves first
    // (alias-qualified ColRef for `a.b`), then fields extract off it
    case FieldAccess(x, f0) => exprToCol(x, in).getField(f0)
    case FuncCall(name, args) if args.exists(_.isInstanceOf[Lambda]) =>
      hofCall(name, args, exprToCol(_, in))
    case FuncCall(name, args) =>
      scalarFunc(name, args.map(exprToCol(_, in)), args)
    case _: Lambda =>
      fail("a lambda is only valid as a direct argument of " +
        "transform/filter/aggregate (and their list_* spellings)")
    case _: RowTuple =>
      fail("a row-value constructor is only valid as a comparison " +
        "operand or an IN probe/list element")
    case _: InSubquery => fail("IN (subquery) not supported in this position")
    case _: QuantCmp =>
      fail("quantified comparison (ANY/ALL) not supported in this position")
    case _: StarMod =>
      fail("* EXCLUDE/REPLACE is only valid as a plain select item")
    case _: ScalarSubquery => fail("scalar subquery not supported in this position")
    case _: ExistsSubquery =>
      fail("EXISTS is not supported in this position")
    case Ast.Hole => fail("internal error: traversal placeholder escaped")
  }

  /** Subscript lowering shared by every expression context (r11).
    * Dispatch on the CONTAINER's resolved type when a frame is
    * available: map subscripts cast the key to the MAP'S key type
    * (computed string keys work — `m[lower(k)]`); arrays cast the
    * index to INT with an index-0 NULL guard (DuckDB's `l[0]` is
    * NULL; bare try_element_at throws INVALID_INDEX_OF_ZERO). When
    * the container cannot be resolved (lambda variables, post-agg
    * refs), string LITERALS stay map keys and everything else gets
    * the int cast WITHOUT the 0-guard — an integer-keyed map's
    * `m[0]` must read the key (review r11: the unconditional guard
    * forced it NULL); an array subscripted with a 0-reaching index
    * in those narrow contexts throws the ANSI error instead of the
    * NULL (documented trade — the guard needs the container type). */
  private def subscriptCol(x: Expr, i: Expr,
                           lower: Expr => Column): Column = {
    import org.apache.spark.sql.types._
    val base = lower(x)
    val containerT = resolveFrame.flatMap(df =>
      scala.util.Try(df.select(base).schema.head.dataType).toOption)
    containerT match {
      case Some(MapType(kt, _, _)) =>
        F.try_element_at(base, lower(i).cast(kt))
      case Some(_: ArrayType) =>
        val idx = lower(i).cast("int")
        F.when(idx === 0, F.lit(null))
          .otherwise(F.try_element_at(base, idx))
      case _ =>
        i match {
          case StrLit(_) => F.try_element_at(base, lower(i))
          case _ => F.try_element_at(base, lower(i).cast("int"))
        }
    }
  }

  /** List-slice lowering `e[lo:hi]` shared by every expression
    * context (r11b; DuckDB semantics — see [[Ast.ArraySlice]]):
    * negative bounds normalize as len+b+1, lo clamps up to 1, hi
    * clamps down to len, inverted/past-end ranges read EMPTY, a NULL
    * list or NULL bound reads NULL. Clamps are explicit WHENs, not
    * greatest/least — those SKIP nulls and would turn a NULL bound
    * into a real range. */
  private def sliceCol(x: Expr, lo: Option[Expr], hi: Option[Expr],
                       lower: Expr => Column): Column = {
    val arr = lower(x)
    val len = F.size(arr)
    def norm(b: Expr): Column = {
      val c = lower(b).cast("int")
      F.when(c < 0, len + c + F.lit(1)).otherwise(c)
    }
    val nlo = lo.map { b =>
      val c = norm(b); F.when(c < 1, F.lit(1)).otherwise(c)
    }.getOrElse(F.lit(1))
    val nhi = hi.map { b =>
      val c = norm(b); F.when(c > len, len).otherwise(c)
    }.getOrElse(len)
    val cnt0 = nhi - nlo + F.lit(1)
    val cnt = F.when(cnt0 < 0, F.lit(0)).otherwise(cnt0)
    F.slice(arr, nlo, cnt)
  }

  /** Desugars a row-value comparison (r9). `=` → element-wise AND
    * (exactly the standard's 3VL: TRUE iff all pairs true, FALSE iff
    * any pair false, else NULL); `<>` → NOT of the equality; ordering
    * ops → the standard's lexicographic recursion
    * `(a,b) < (c,d) ⇔ a < c OR (a = c AND b < d)`. */
  private def rowCmpExpr(op: String, l: Expr, r: Expr): Expr = {
    val pairs = (l, r) match {
      case (RowTuple(as), RowTuple(bs)) =>
        if (as.length != bs.length)
          fail(s"row-value comparison arity mismatch " +
            s"(${as.length} vs ${bs.length})")
        as.zip(bs)
      case _ => fail("a row-value constructor can only compare with " +
        "another row value of the same arity")
    }
    op match {
      case "=" =>
        pairs.map { case (a, b) => Cmp("=", a, b): Expr }.reduce(And)
      case "<>" | "!=" =>
        Not(pairs.map { case (a, b) => Cmp("=", a, b): Expr }.reduce(And))
      case "<" | "<=" | ">" | ">=" =>
        val strict = op.stripSuffix("=")
        def rec(ps: Seq[(Expr, Expr)]): Expr = ps match {
          case Seq((a, b)) => Cmp(op, a, b)
          case (a, b) +: rest =>
            Or(Cmp(strict, a, b), And(Cmp("=", a, b), rec(rest)))
        }
        rec(pairs)
      case other => fail(s"row-value comparison does not support '$other'")
    }
  }

  /** date/timestamp ± INTERVAL: the operand casts to TIMESTAMP_NTZ
    * (matching the DuckDB/standard session-zone-free TIMESTAMP, so the
    * result never depends on the Spark session timezone) and shifts by
    * calendar months first, then days/seconds — the SQL interval
    * triple order; month arithmetic clamps to month ends (Jan 31 + 1
    * month = Feb 28), identical in Spark and DuckDB. */
  private def shiftByInterval(c: Column, i: IntervalLit,
                              negate: Boolean): Column = {
    val sgn = if (negate) -1L else 1L
    var out = c.cast(TimestampNTZType)
    if (i.months != 0)
      out = out + F.call_function("make_ym_interval",
        F.lit(0), F.lit((sgn * i.months).toInt))
    if (i.days != 0 || i.seconds != 0)
      out = out + F.call_function("make_dt_interval",
        F.lit((sgn * i.days).toInt), F.lit(0), F.lit(0),
        F.lit((sgn * i.seconds).toDouble))
    out
  }

  /** LIKE / ILIKE with an optional ESCAPE character. Escape-free
    * patterns use the native (codegen'd, pushdown-friendly) operators;
    * escaped patterns lower through an anchored regex — `(?s)` so `%`
    * crosses newlines like LIKE does, `(?i)` for ILIKE — since
    * Column.like exposes no escape parameter. */
  private def likeCol(c: Column, pattern: String, esc: Option[Char],
                      ci: Boolean): Column = esc match {
    case None => if (ci) c.ilike(pattern) else c.like(pattern)
    case Some(e) =>
      val sb = new StringBuilder(if (ci) "(?is)^" else "(?s)^")
      var i = 0
      while (i < pattern.length) {
        val ch = pattern.charAt(i)
        if (ch == e) {
          if (i + 1 >= pattern.length)
            fail("LIKE pattern ends with a dangling escape character")
          sb ++= java.util.regex.Pattern.quote(pattern.charAt(i + 1).toString)
          i += 2
        } else if (ch == '%') { sb ++= ".*"; i += 1 }
        else if (ch == '_') { sb ++= "."; i += 1 }
        else { sb ++= java.util.regex.Pattern.quote(ch.toString); i += 1 }
      }
      sb += '$'
      c.rlike(sb.toString)
  }

  private def arith(op: String, l: Column, r: Column): Column = op match {
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    case "/" => l / r
    case "%" => l % r
    case o   => fail(s"unknown arithmetic op $o")
  }

  private def cmp(op: String, l: Column, r: Column): Column = op match {
    case "="  => l === r
    case "<>" => l =!= r
    case "<=>" => l <=> r // null-safe equality (IS NOT DISTINCT FROM)
    case ">"  => l > r
    case "<"  => l < r
    case ">=" => l >= r
    case "<=" => l <= r
    case o    => fail(s"unknown comparison $o")
  }

  private def litValue(e: Expr): Any = e match {
    case NumLit(t) =>
      if (t.matches("[0-9]+") && t.length < 19) t.toLong else t.toDouble
    case StrLit(v)  => v
    case BoolLit(v) => v
    case Neg(NumLit(t)) =>
      if (t.matches("[0-9]+") && t.length < 19) -t.toLong else -t.toDouble
    case other => fail(s"expected a literal, got $other")
  }

  private def isLiteral(e: Expr): Boolean = e match {
    case NumLit(_) | StrLit(_) | BoolLit(_) | Neg(NumLit(_)) => true
    case _ => false
  }

  /** IN-list lowering: all-literal lists use `isin` (an `In` Catalyst
    * expression — pushdown/InSet-friendly at the scan); lists with
    * computed elements (reference sql.lark:129 allows any
    * expression_math) lower to an OR chain of equalities, which has
    * identical three-valued semantics. */
  private def inListCol(x: Column, vs: Seq[Expr], lower: Expr => Column): Column =
    if (vs.forall(isLiteral)) x.isin(vs.map(litValue): _*)
    else vs.map(v => x === lower(v)).reduce(_ || _)

  /** Aggregate → Spark Column (without window). */
  private def aggColumn(a: AggExpr): Column = aggColumnBase(a)

  private def aggColumnBase(a: AggExpr,
                            lower: Expr => Column =
                              exprToCol(_, None)): Column = {
    val arg: Column = a.arg match {
      case Star(_) => F.lit(1)
      case e       => lower(e)
    }
    a.func match {
      case "count" if a.distinct =>
        a.arg match {
          case Star(_) => fail("COUNT(DISTINCT *) unsupported")
          case e       => F.countDistinct(lower(e))
        }
      // DISTINCT variants: sum has a native form; avg/stddev/variance
      // DISTINCT lower through the native aggregates (GraftFn bridges
      // Column.fn), so result types match the engine's own forms for
      // every input — the former sum_distinct/countDistinct avg
      // quotient changed decimal precision/scale, and dispersion
      // DISTINCT used to be rejected; min/max are distinct-insensitive
      case "sum" if a.distinct => F.sum_distinct(arg)
      case "avg" if a.distinct =>
        org.apache.spark.sql.GraftFn.distinctAgg("avg", arg)
      case "stddev" if a.distinct =>
        org.apache.spark.sql.GraftFn.distinctAgg("stddev_samp", arg)
      case "variance" if a.distinct =>
        org.apache.spark.sql.GraftFn.distinctAgg("var_samp", arg)
      case "count"    => F.count(arg)
      case "sum"      => F.sum(arg)
      case "avg"      => F.avg(arg)
      case "min"      => F.min(arg)
      case "max"      => F.max(arg)
      case "stddev"   => F.stddev_samp(arg)
      case "variance" => F.var_samp(arg)
      // ---- r5 aggregate catalog ----------------------------------
      case f @ ("bool_and" | "bool_or" | "count_if" | "median") =>
        if (a.distinct) fail(s"DISTINCT $f is not supported")
        F.call_function(f, arg)
      // bitwise aggregates (r11b) — same names in DuckDB and Spark.
      // DISTINCT is loud: bit_and/bit_or are distinct-insensitive and
      // bit_xor(DISTINCT) has no Column-API spelling
      case f @ ("bit_and" | "bit_or" | "bit_xor") =>
        if (a.distinct) fail(s"DISTINCT $f is not supported")
        F.call_function(f, arg)
      case "grouping" =>
        // valid only under ROLLUP/CUBE/GROUPING SETS — Spark's
        // analyzer raises the (clear) error otherwise
        F.grouping(arg)
      case f @ ("corr" | "covar_pop" | "covar_samp" | "max_by" | "min_by") =>
        if (a.extraArgs.length != 1)
          fail(s"$f takes exactly two arguments")
        if (a.distinct) fail(s"DISTINCT $f is not supported")
        F.call_function(f, arg, lower(a.extraArgs.head))
      case f @ ("string_agg" | "array_agg") =>
        orderedSetAgg(a, arg, lower)
      // WITHIN GROUP percentiles (r5): arg is the ORDER BY column,
      // extraArgs.head the fraction. percentile_cont ≡ Spark's exact
      // interpolating `percentile` (≡ DuckDB quantile_cont, already
      // oracle-pinned by q_text_stats); percentile_disc is Spark's
      // own PercentileDisc. Descending or multi-key WITHIN GROUP
      // has no Spark lowering — loud.
      case f @ ("percentile_cont" | "percentile_disc") =>
        if (a.aggOrder.length != 1 || !a.aggOrder.head.asc ||
            a.aggOrder.head.nullsFirst.isDefined)
          fail(s"$f supports WITHIN GROUP (ORDER BY x) with a single " +
            "ascending key only")
        val frac = lower(a.extraArgs.head)
        if (f == "percentile_cont") F.call_function("percentile", arg, frac)
        else org.apache.spark.sql.GraftFn.percentileDisc(arg, frac)
      case other      => fail(s"unknown aggregate $other")
    }
  }

  /** Ordered-set aggregates (r5): string_agg(x, sep ORDER BY keys) /
    * array_agg(x ORDER BY keys). The ORDER BY is REQUIRED — without
    * it the element order depends on partitioning and the result is
    * irreproducible (same contract as DISTINCT ON); ties on the keys
    * are likewise engine-defined, so callers should order by a
    * per-group-unique key. Lowering: collect (keys..., value) structs,
    * sort with a comparator honoring per-key ASC/DESC and NULLS
    * FIRST/LAST (Spark defaults: nulls first ascending, last
    * descending), project the value back out. One ordinary hash
    * aggregation — per-group state is the group's values (inherent to
    * the result), never the corpus. */
  /** Shared head of the ordered-set collects: validations, the
    * (__k0.., __v) struct fields, and the string_agg separator. */
  private def orderedSetParts(a: AggExpr, value: Column,
                              lower: Expr => Column)
      : (Seq[Column], Option[String]) = {
    val f = a.func
    // DISTINCT ordered-set (r5b, PostgreSQL rule): legal only when
    // the ORDER BY is the argument itself — any other key would make
    // "which duplicate's key wins" undefined
    if (a.distinct &&
        (a.aggOrder.length != 1 || !sameExpr(a.aggOrder.head.e, a.arg)))
      fail(s"DISTINCT $f requires ORDER BY to be the aggregated " +
        "expression itself")
    if (a.aggOrder.isEmpty)
      fail(s"$f requires ORDER BY inside the call " +
        "(deterministic element order)")
    // array_join's delimiter parameter is a String, not a Column —
    // the separator must be a string literal
    val sep: Option[String] = f match {
      case "string_agg" =>
        if (a.extraArgs.length != 1)
          fail("string_agg takes (value, separator)")
        a.extraArgs.head match {
          case StrLit(v) => Some(v)
          case other =>
            fail(s"string_agg separator must be a string literal, got $other")
        }
      case _ =>
        if (a.extraArgs.nonEmpty) fail(s"$f takes one argument")
        None
    }
    val keys = a.aggOrder.map(oi => lower(oi.e))
    val fields = keys.zipWithIndex.map { case (k, i) => k.as(s"__k$i") } :+
      value.as("__v")
    (fields, sep)
  }

  private def orderedSetAgg(a: AggExpr, value: Column,
                            lower: Expr => Column,
                            over: Option[SparkWindow] = None): Column = {
    if (a.window.isDefined && over.isEmpty)
      fail(s"${a.func} OVER a window takes PARTITION BY only " +
        "(element order comes from the ORDER BY inside the call)")
    val (fields, sep) = orderedSetParts(a, value, lower)
    // windowed form (r5b): the collect is the ONLY aggregate part —
    // it runs over the (whole-partition) window; the sort/project
    // post-processing wraps the windowed array per row
    val collected = over match {
      case Some(w) => F.collect_list(F.struct(fields: _*)).over(w)
      case None    => F.collect_list(F.struct(fields: _*))
    }
    orderedSetPost(a, collected, sep)
  }

  /** The ordered-set collects' post-processing over an array of
    * (__k0.., __v) structs: comparator sort on the call-level ORDER
    * BY keys, value projection, DISTINCT dedup, string join. Shared
    * by [[orderedSetAgg]] and the EXCLUDE path (r9), which feeds the
    * post-exclusion frame from ExcludeAgg's collect mode. */
  private def orderedSetPost(a: AggExpr, collected: Column,
                             sep: Option[String]): Column = {
    val n = a.aggOrder.length
    def cmp(l: Column, r: Column, i: Int): Column =
      if (i == n) F.lit(0)
      else {
        val oi = a.aggOrder(i)
        val lk = l.getField(s"__k$i"); val rk = r.getField(s"__k$i")
        val less = if (oi.asc) -1 else 1
        val nullsFirst = oi.nullsFirst.getOrElse(oi.asc)
        val nf = if (nullsFirst) -1 else 1
        F.when(lk.isNull && rk.isNull, cmp(l, r, i + 1))
          .when(lk.isNull, F.lit(nf))
          .when(rk.isNull, F.lit(-nf))
          .when(lk < rk, F.lit(less))
          .when(lk > rk, F.lit(-less))
          .otherwise(cmp(l, r, i + 1))
      }
    // comparator dispatch (r11): the interpreted HOF comparator pays
    // a lambda call per COMPARISON (O(m log m) dispatches per row,
    // each a nested-CaseWhen evaluation); the native SortStructs
    // TimSort is one JVM sort per row. The r11 A/B measured native
    // faster at EVERY probed frame size — 8 (1.0 vs 1.4 s), 16, 32,
    // 100 (5.2 vs 14.5 s), 1000 (2.0 vs 4.2 s), and the real suite
    // entries (q_agg_string_exclude 1.03 vs 2.92 s warm solo) — so
    // native is the default; the r9 "HOF wins small frames" result
    // belonged to a different design (sorting inside the collect
    // aggregate), superseded. Both sorts are stable and bit-for-bit
    // equal (FunctionsSpec pin); env-overridable for probes.
    val sorted =
      if (n == 0) collected // stable no-op either way
      else sys.env.getOrElse("SPARK_GRAFT_EXCLUDE_SORT", "native") match {
        case "hof" => F.array_sort(collected, (l, r) => cmp(l, r, 0))
        case _ =>
          org.apache.spark.sql.GraftFn.sortStructs(collected,
            a.aggOrder.map(_.asc),
            a.aggOrder.map(oi => oi.nullsFirst.getOrElse(oi.asc)))
      }
    val vals0 = F.transform(sorted, s => s.getField("__v"))
    // DISTINCT: dedup AFTER the sort — array_distinct keeps first
    // occurrences, so a sorted input stays sorted
    val vals = if (a.distinct) F.array_distinct(vals0) else vals0
    sep match {
      // string_agg: NULL values are invisible (which is what makes
      // FILTER's CASE-wrap valid), and an empty / all-NULL selection
      // yields NULL, not '' — the standard string_agg contract
      case Some(s) =>
        val nn = F.filter(vals, v => v.isNotNull)
        F.when(F.size(nn) === 0, F.lit(null).cast("string"))
          .otherwise(F.array_join(nn, s))
      case None    => vals
    }
  }

  /** string_agg/array_agg OVER (PARTITION BY ... [ORDER BY ...
    * [frame]]) (r5b; r7 closes the OVER-level ORDER BY/frame wall):
    * the WINDOW's order/frame select WHICH rows each output row
    * aggregates (running/sliding semantics, Spark's collect_list
    * honors any frame), while the call's own ORDER BY orders the
    * ELEMENTS within that selection — the two clauses are
    * independent, exactly the standard's reading. Without OVER
    * ORDER BY the frame defaults to the whole partition; with it,
    * Spark's default RANGE UNBOUNDED PRECEDING..CURRENT ROW
    * (peers included) matches DuckDB's windowed-aggregate default.
    * Same single window exchange either way — the sort/projection
    * post-processing wraps each row's collected array. */
  private def orderedSetWindowed(a: AggExpr,
                                 lower: Expr => Column): Column = {
    val w = a.window.get
    val arg = a.arg match {
      case Star(_) => fail(s"${a.func} takes a value argument")
      case e       => lower(e)
    }
    if (w.exclude == "no others")
      return orderedSetAgg(a, arg, lower, Some(windowSpec(w, lower)))
    // EXCLUDE on windowed ordered-set collects (r9, 36ar's last
    // wall): ExcludeAgg's array-returning mode filters the collected
    // frame — same element identity rules as the scalar folds
    // (first-rid-match for CURRENT ROW, null-safe order-key peers
    // for GROUP, peers minus one copy for TIES) — and the standard
    // comparator-sort projection runs on the survivors. Same single
    // window exchange/sort as the plain collect.
    val mode = w.exclude
    val f = w.frame.get // the parser ties EXCLUDE to a frame extent
    val startOk = f.start match {
      case UnboundedPreceding | CurrentRow => true
      case Preceding(n) => n >= 0
      case Following(_) => false
    }
    val endOk = f.end match {
      case UnboundedFollowing | CurrentRow => true
      case Following(n) => n >= 0
      case Preceding(_) => false
    }
    if (!startOk || !endOk)
      fail("EXCLUDE requires a frame that contains the current row")
    if ((mode == "group" || mode == "ties") && w.orderBy.isEmpty)
      fail("EXCLUDE GROUP/TIES requires ORDER BY (peers are order ties)")
    val (fields, sep) = orderedSetParts(a, arg, lower)
    val elemVal = F.struct(fields: _*)
    val okCols = w.orderBy.map(oi => lower(oi.e))
    val okS = if (okCols.isEmpty) F.lit(0) else F.struct(okCols: _*)
    // element identity hashes (over-order keys, element struct):
    // rows equal in both are interchangeable under the collect
    val rid = F.xxhash64(okS, elemVal)
    val elem = F.struct(okS.as("__xok"), rid.as("__xrid"),
      elemVal.as("__xv"))
    val frameW = windowSpec(w.copy(exclude = "no others"), lower)
    val lst = F.collect_list(elem).over(frameW)
    val included = org.apache.spark.sql.GraftFn.excludeAgg(
      lst, elem, mode, "collect", distinct = false)
    val out = orderedSetPost(a, included, sep)
    sep match {
      case Some(_) => out // string_agg owns its empty-set → NULL rule
      case None    => // aggregate over an empty survivor set is NULL
        F.when(F.size(included) === 0, F.lit(null)).otherwise(out)
    }
  }

  /** Windowed-aggregate dispatch, including the standard frame
    * EXCLUSION clause (r5c) — Spark has no native frame exclusion, so
    * sum/count/avg lower as same-window aggregate algebra:
    *
    *   agg OVER (w EXCLUDE CURRENT ROW) = frameAgg − currentContribution
    *   agg OVER (w EXCLUDE GROUP)       = frameAgg − peerGroupAgg
    *   agg OVER (w EXCLUDE TIES)        = frameAgg − peerGroupAgg + current
    *
    * Sound when (a) the frame provably contains the current row
    * (every bound pair except frames strictly before/after it), and
    * (b) the peer-group term matches what the frame can see: for
    * RANGE frames the whole peer group (peers sit at value-distance
    * 0); for ROWS frames (r7) the INTERSECTION of the peer group with
    * the frame, computed by replaying the same ROWS bounds inside the
    * peer-group partition under a shared deterministic tiebreak (see
    * inline). The peer-group aggregate is the same aggregate over
    * PARTITION BY (partition keys ++ order keys): the SAME window
    * exchange and sort, one more window function, zero extra shuffle
    * — the
    * leave-one-out encoding shape (`sum(y) over (partition by g rows
    * between unbounded preceding and unbounded following exclude
    * current row)`) at any scale. SUM/AVG track the remaining
    * non-null count so an empty remaining set reads NULL exactly as
    * a native exclusion does. Float caveat: frameSum − excludedSum
    * is subtraction, not re-summation — exact for integer/decimal
    * inputs, last-ulp different from a re-summing engine for floats.
    * min/max (r6) take a different rewrite — the frame SPLITS around
    * the excluded current row (see inline) — sound for ROWS frames
    * with EXCLUDE CURRENT ROW. Other window functions have no
    * decomposition and fail loudly (see [[windowSpec]]). */
  private def windowedAgg(a: AggExpr, lower: Expr => Column,
                          argType: Option[org.apache.spark.sql.types.DataType] = None): Column = {
    val w = a.window.get
    // DISTINCT window aggregates (r7b; Spark rejects the native form
    // "Distinct window functions are not supported"): the frame's
    // distinct non-null values are exactly collect_set over the same
    // window — count = its size, sum/avg fold it (a single HOF over
    // the per-row set, the fine kind), min/max are distinct-invariant
    // and drop the flag. Same window exchange/sort as the plain
    // aggregate; per-row state is the distinct set (bounded by the
    // frame's distinct values, the inherent cost of the semantics —
    // DuckDB's native evaluator pays the same). Sum/avg fold in the
    // ARGUMENT'S own widened type when it resolves statically (r8,
    // r7 ADVICE): integral → long accumulator (Spark's native
    // sum(integral) result type — exact, no silent double past 2^53),
    // decimal(p,s) → decimal(38,s); float/double and statically
    // unresolvable args (the post-GROUP-BY lowering path carries no
    // frame to resolve against) keep the double fold. avg divides
    // the typed sum by the set size — integral/double → double,
    // decimal → decimal division, the same coercions the native avg
    // applies. Empty sets read NULL like the native aggregates.
    // EXCLUDE stays loud above.
    if (a.distinct && w.exclude == "no others" &&
        Set("count", "sum", "avg", "min", "max").contains(a.func)) {
      val arg = a.arg match {
        case Star(_) => fail(s"${a.func}(DISTINCT *) is not meaningful")
        case e       => lower(e)
      }
      if (a.func == "min" || a.func == "max")
        return aggColumnBase(a.copy(distinct = false), lower)
          .over(windowSpec(w, lower))
      val cs = F.collect_set(arg).over(windowSpec(w, lower))
      return a.func match {
        case "count" => F.size(cs).cast("long")
        case "sum" | "avg" =>
          import org.apache.spark.sql.types._
          val sum = argType match {
            case Some(ByteType | ShortType | IntegerType | LongType) =>
              F.aggregate(cs, F.lit(0L), (acc, x) => acc + x.cast("long"))
            case Some(d: DecimalType) =>
              val to = DecimalType(38, d.scale)
              F.aggregate(cs, F.lit(java.math.BigDecimal.ZERO).cast(to),
                (acc, x) => acc + x.cast(to))
            case _ =>
              F.aggregate(cs, F.lit(0.0), (acc, x) => acc + x.cast("double"))
          }
          val guarded = F.when(F.size(cs) > 0, sum)
          if (a.func == "sum") guarded else guarded / F.size(cs)
      }
    }
    if (w.exclude == "no others")
      return aggColumnBase(a, lower).over(windowSpec(w, lower))
    if (a.func != "sum" && a.func != "count" && a.func != "avg" &&
        a.func != "min" && a.func != "max")
      fail("EXCLUDE applies to sum/count/avg/min/max window aggregates " +
        "only (no decomposition exists for other window functions)")
    val mode = w.exclude
    val f = w.frame.get // the parser ties EXCLUDE to a frame extent
    val startOk = f.start match {
      case UnboundedPreceding | CurrentRow => true
      case Preceding(n) => n >= 0
      case Following(_) => false
    }
    val endOk = f.end match {
      case UnboundedFollowing | CurrentRow => true
      case Following(n) => n >= 0
      case Preceding(_) => false
    }
    if (!startOk || !endOk)
      fail("EXCLUDE requires a frame that contains the current row")
    if ((mode == "group" || mode == "ties") && w.orderBy.isEmpty)
      fail("EXCLUDE GROUP/TIES requires ORDER BY (peers are order ties)")
    // Generic collect-over-frame fallback (r8, closing the r6/r7b
    // walls): DISTINCT + EXCLUDE, and min/max EXCLUDE beyond
    // ROWS/CURRENT ROW (RANGE frames cannot address "one row away";
    // GROUP/TIES need per-row split points — no decomposition
    // exists). The frame materializes per row as an array of
    // (order-key tuple, row id, value); the excluded rows filter
    // ELEMENT-WISE — one occurrence of the current row's id for
    // CURRENT ROW (identical rows are interchangeable under any
    // aggregate, and distinct rows colliding in xxhash64 is a 2^-64
    // event), all null-safe order-key peers for GROUP, peers minus
    // one current copy for TIES — then the survivors fold. Per-row
    // state is the frame itself: the inherent cost of semantics no
    // subtraction rewrite covers, same exchange/sort as the plain
    // window.
    val needGeneric = a.distinct ||
      ((a.func == "min" || a.func == "max") &&
        !(mode == "current row" && f.isRows))
    if (needGeneric) {
      val argE = a.arg match {
        case Star(_) if a.func == "count" && !a.distinct => F.lit(1)
        case Star(_) => fail(s"${a.func}(${if (a.distinct) "DISTINCT " else ""}*) " +
          "is not meaningful")
        case e => lower(e)
      }
      // reserved struct-field names: a field aliased like an input
      // column trips Spark's lateral-column-alias resolution inside
      // window expressions
      val okCols = w.orderBy.map(oi => lower(oi.e))
      val okS = if (okCols.isEmpty) F.lit(0) else F.struct(okCols: _*)
      // the removal id hashes (order keys, value) only: rows equal in
      // both are interchangeable under any aggregate, so removing the
      // first id match removes exactly one multiset occurrence.
      // (A struct(*) row hash would be tighter but star expansion
      // inside a window projection trips lateral-column-alias
      // analysis on some sources.)
      val rid = F.xxhash64(okS, argE)
      val elem = F.struct(okS.as("__xok"), rid.as("__xrid"), argE.as("__xv"))
      val frameW = windowSpec(w.copy(exclude = "no others"), lower)
      val lst = F.collect_list(elem).over(frameW)
      // native one-pass fold (r8 perf): when the argument's type
      // resolved statically and the func supports it, ExcludeAgg
      // replaces the whole filter→transform→distinct→fold HOF chain
      // — per-ROW interpreted dispatch instead of per-element
      // (6 HOF columns over lineitem measured 5.4 s; native ~3×
      // less). Unresolved or exotic types keep the HOF chain below.
      import org.apache.spark.sql.types._
      val hashable: DataType => Boolean = {
        case StringType | BooleanType | DateType | TimestampType |
             TimestampNTZType | ByteType | ShortType | IntegerType |
             LongType | FloatType | DoubleType | _: DecimalType => true
        case _ => false
      }
      val numericT: DataType => Boolean = {
        case ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType | _: DecimalType => true
        case _ => false
      }
      val nativeOk = argType.exists { dt =>
        a.func match {
          case "count"       => !a.distinct || hashable(dt)
          case "min" | "max" =>
            scala.util.Try(
              org.apache.spark.sql.catalyst.util.TypeUtils
                .getInterpretedOrdering(dt)).isSuccess &&
              (!a.distinct || hashable(dt))
          case _             => numericT(dt) // sum / avg
        }
      } && !a.arg.isInstanceOf[Star]
      if (nativeOk) {
        import org.apache.spark.sql.GraftFn
        return a.func match {
          case "count" =>
            GraftFn.excludeAgg(lst, elem, mode, "count", a.distinct)
          case "min" | "max" =>
            GraftFn.excludeAgg(lst, elem, mode, a.func, a.distinct)
          case "sum" =>
            GraftFn.excludeAgg(lst, elem, mode, "sum", a.distinct)
          case "avg" =>
            // the same division typing as the HOF chain (long/int →
            // double, decimal/int → decimal)
            GraftFn.excludeAgg(lst, elem, mode, "sum", a.distinct) /
              GraftFn.excludeAgg(lst, elem, mode, "count", a.distinct)
                .cast("int")
        }
      }
      val kept: Column = mode match {
        case "current row" =>
          // remove the FIRST element carrying the current row's id —
          // via slice/concat, NOT a lambda: a lambda body capturing a
          // window-derived value fails window resolution (analysis
          // falls through to lateral-column-alias and errors)
          val idx = F.array_position(
            F.transform(lst, x => x.getField("__xrid")), rid).cast("int")
          F.concat(
            F.slice(lst, F.lit(1), idx - 1),
            F.slice(lst, idx + 1, F.size(lst) - idx))
        case "group" =>
          F.filter(lst, x => !(x.getField("__xok") <=> okS))
        case "ties" =>
          // drop every peer, put ONE copy of the current row back
          F.concat(
            F.filter(lst, x => !(x.getField("__xok") <=> okS)),
            F.array(elem))
      }
      val vals0 = F.filter(
        F.transform(kept, x => x.getField("__xv")), v => v.isNotNull)
      val vals = if (a.distinct) F.array_distinct(vals0) else vals0
      import org.apache.spark.sql.types._
      return a.func match {
        case "count" => F.size(vals).cast("long")
        case "min"   => F.array_min(vals)
        case "max"   => F.array_max(vals)
        case "sum" | "avg" =>
          val sum = argType match {
            case Some(ByteType | ShortType | IntegerType | LongType) =>
              F.aggregate(vals, F.lit(0L), (acc, x) => acc + x.cast("long"))
            case Some(d: DecimalType) =>
              val to = DecimalType(38, d.scale)
              F.aggregate(vals, F.lit(java.math.BigDecimal.ZERO).cast(to),
                (acc, x) => acc + x.cast(to))
            case _ =>
              F.aggregate(vals, F.lit(0.0), (acc, x) => acc + x.cast("double"))
          }
          val guarded = F.when(F.size(vals) > 0, sum)
          if (a.func == "sum") guarded else guarded / F.size(vals)
      }
    }
    // min/max (r6): no subtraction decomposition exists for extrema —
    // instead the frame SPLITS around the excluded row into its
    // preceding part [start, -1] and following part [+1, end], and
    // the answer is least/greatest of the two partial aggregates
    // (least/greatest skip NULLs, so an empty side contributes
    // nothing and both-empty reads NULL — native semantics). Row
    // offsets address exactly one excluded row, so this is sound
    // precisely for ROWS frames with EXCLUDE CURRENT ROW; RANGE
    // frames cannot address "one row away" (peers sit at distance 0)
    // and GROUP/TIES would need variable per-row split points — both
    // stay loud. Same partition exchange and sort, two window
    // functions instead of one.
    if (a.func == "min" || a.func == "max") {
      if (mode != "current row" || !f.isRows)
        fail("EXCLUDE for min/max supports ROWS frames with EXCLUDE " +
          "CURRENT ROW only (split-frame rewrite; extrema have no " +
          "subtraction decomposition for range/group exclusion)")
      val arg = a.arg match {
        case Star(_) => fail(s"${a.func} takes a value argument")
        case e       => lower(e)
      }
      val base = windowSpec(
        WindowSpec(w.partitionBy, w.orderBy, None), lower)
      def rowBound(b: FrameBound): Long = b match {
        case UnboundedPreceding => Window.unboundedPreceding
        case UnboundedFollowing => Window.unboundedFollowing
        case CurrentRow         => 0L
        case Preceding(n)       => -n
        case Following(n)       => n
      }
      val aggF: Column => Column =
        if (a.func == "min") F.min else F.max
      val lo = rowBound(f.start); val hi = rowBound(f.end)
      val parts = Seq(
        if (lo <= -1) Some(aggF(arg).over(base.rowsBetween(lo, -1L)))
        else None,
        if (hi >= 1) Some(aggF(arg).over(base.rowsBetween(1L, hi)))
        else None).flatten
      return parts match {
        case Nil => F.when(F.lit(false), arg) // frame was only the row
        case Seq(one) => one
        case Seq(p, q) =>
          if (a.func == "min") F.least(p, q) else F.greatest(p, q)
      }
    }
    if ((mode == "group" || mode == "ties") && w.orderBy.isEmpty)
      fail("EXCLUDE GROUP/TIES requires ORDER BY (peers are order ties)")
    // GROUP/TIES with a ROWS frame (r7, closing the r6 loud wall): a
    // ROWS frame may CUT the peer group, so the excluded set is
    // (peer group ∩ frame). Peers are CONTIGUOUS in the partition
    // sort, which makes relative row offsets inside the peer-group
    // partition equal to global offsets — so the SAME ROWS bounds
    // over a window partitioned by (partition ++ order keys), clipped
    // at the peer-partition edges by Spark's native frame clipping,
    // select exactly that intersection. The tie order must be
    // CONSISTENT between the frame window and the peer window (they
    // are separate WindowExecs with different partitionings): a
    // deterministic whole-row-hash tiebreak appended to both sorts
    // pins it. Any consistent tie order is a valid answer for a ROWS
    // frame under the standard (tie order is implementation-defined);
    // identical rows commute under any aggregate, and distinct rows
    // colliding in xxhash64 is a 2^-64 event. Same two exchanges as
    // the RANGE path — zero extra shuffle.
    val rowsGroupTies = (mode == "group" || mode == "ties") && f.isRows
    val (frameSpec, peersSpec) =
      if (rowsGroupTies) {
        def rowBound(b: FrameBound): Long = b match {
          case UnboundedPreceding => Window.unboundedPreceding
          case UnboundedFollowing => Window.unboundedFollowing
          case CurrentRow         => 0L
          case Preceding(n)       => -n
          case Following(n)       => n
        }
        val tb = F.expr("xxhash64(struct(*))")
        val lo = rowBound(f.start); val hi = rowBound(f.end)
        val pCols = w.partitionBy.map(lower)
        val fs = Window.partitionBy(pCols: _*)
          .orderBy(w.orderBy.map(oi => orderedCol(lower(oi.e), oi)) :+
            tb.asc: _*)
          .rowsBetween(lo, hi)
        val ps = Window
          .partitionBy(pCols ++ w.orderBy.map(oi => lower(oi.e)): _*)
          .orderBy(tb.asc)
          .rowsBetween(lo, hi)
        (fs, ps)
      } else
        (windowSpec(w.copy(exclude = "no others"), lower),
         windowSpec(
           WindowSpec(w.partitionBy ++ w.orderBy.map(_.e), Nil, None), lower))
    val isStar = a.arg match { case Star(_) => true; case _ => false }
    val arg: Column = a.arg match {
      case Star(_) => F.lit(1)
      case e       => lower(e)
    }
    val curNN: Column =
      if (isStar) F.lit(1L)
      else F.when(arg.isNotNull, F.lit(1L)).otherwise(F.lit(0L))
    def cnt(spec: SparkWindow): Column = F.count(arg).over(spec)
    val exclNN: Column = mode match {
      case "current row" => curNN
      case "group"       => cnt(peersSpec)
      case "ties"        => cnt(peersSpec) - curNN
    }
    if (a.func == "count") cnt(frameSpec) - exclNN
    else {
      val s = F.sum(arg).over(frameSpec)
      val p = F.sum(arg).over(peersSpec)
      val exclSum: Column = mode match {
        case "current row" => F.coalesce(arg, F.lit(0))
        case "group"       => F.coalesce(p, F.lit(0))
        case "ties" => F.coalesce(p, F.lit(0)) - F.coalesce(arg, F.lit(0))
      }
      val remaining = cnt(frameSpec) - exclNN
      val adj = F.when(remaining > 0, s - exclSum)
      if (a.func == "sum") adj else adj / remaining
    }
  }

  /** True when the expression carries a window with a GROUPS frame
    * anywhere (the pre-pass trigger). */
  private def containsGroupsFrame(e: Expr): Boolean = {
    def inSpec(w: WindowSpec): Boolean = w.frame.exists(_.isGroups)
    e match {
      case a: AggExpr if a.window.exists(inSpec) => true
      case RankExpr(_, w) if inSpec(w) => true
      case wf: WinFunc if inSpec(wf.window) => true
      case other => Ast.children(other).exists(containsGroupsFrame)
    }
  }

  /** GROUPS frame mode (r7b, standard SQL:2011; Spark has NO GROUPS
    * frame type): dense_rank over the window's own sort is a
    * CONSECUTIVE peer-group ordinal, so `GROUPS BETWEEN a PRECEDING
    * AND b FOLLOWING` is exactly `RANGE BETWEEN a PRECEDING AND b
    * FOLLOWING` over that ordinal — n preceding ordinals are the n
    * preceding peer groups (no gaps), CURRENT ROW spans the whole
    * current group (distance 0 = all peers), UNBOUNDED passes through.
    * Each distinct (partition, order) pair materializes ONE hidden
    * ordinal column and every GROUPS spec retargets its ORDER BY to
    * it; the ordinal's window has the same partitioning and sort as
    * the frame it serves, so both compute in the same WindowExec
    * pipeline — zero extra shuffle. EXCLUDE composes through the
    * existing range-frame aggregate algebra unchanged (peers by the
    * ordinal ARE the order peers). Order-INSENSITIVE aggregates only:
    * first_value/last_value/nth_value read frame order, which the
    * ordinal sort does not preserve among peers — loud; ordered-set
    * aggregates must carry their own internal ORDER BY. */
  private final class GroupsFrameRewriter(lower: Expr => Column) {
    /** hidden ordinal columns to materialize, in creation order */
    val pending = scala.collection.mutable.LinkedHashMap.empty[String, Column]
    private val cache = scala.collection.mutable.Map.empty[String, String]
    private def ordinal(w: WindowSpec): String = {
      val key = w.partitionBy.mkString("") + "|" +
        w.orderBy.mkString("")
      cache.getOrElseUpdate(key, {
        val n = s"__grps_${cache.size}"
        var s: SparkWindow =
          if (w.partitionBy.nonEmpty)
            Window.partitionBy(w.partitionBy.map(lower): _*)
          else Window.partitionBy()
        s = s.orderBy(w.orderBy.map(oi => orderedCol(lower(oi.e), oi)): _*)
        pending(n) = F.dense_rank().over(s).cast("long")
        n
      })
    }
    private def fixSpec(w: WindowSpec): WindowSpec = {
      if (w.orderBy.isEmpty)
        fail("GROUPS frame requires ORDER BY (peer groups are order ties)")
      val n = ordinal(w)
      w.copy(orderBy = Seq(OrderItem(ColRef(None, n), asc = true)),
        frame = w.frame.map(f => f.copy(isRows = false, isGroups = false)))
    }
    def rewrite(e: Expr): Expr = Ast.transformUp(e) {
      case a: AggExpr if a.window.exists(_.frame.exists(_.isGroups)) =>
        if ((a.func == "string_agg" || a.func == "array_agg") &&
            a.aggOrder.isEmpty)
          fail(s"${a.func} over a GROUPS frame requires an internal " +
            "ORDER BY (frame order over the group ordinal is undefined " +
            "among peers)")
        a.copy(window = a.window.map(fixSpec))
      case RankExpr(_, w) if w.frame.exists(_.isGroups) =>
        fail("rank()/dense_rank() take no frame clause")
      case wf: WinFunc if wf.window.frame.exists(_.isGroups) =>
        fail(s"GROUPS frames support order-insensitive aggregates only " +
          s"(${wf.name} reads frame order, which the group-ordinal sort " +
          "does not preserve among peers)")
    }
  }

  private def windowSpec(w: WindowSpec,
                         lower: Expr => Column =
                           exprToCol(_, None)): SparkWindow = {
    if (w.frame.exists(_.isGroups))
      fail("GROUPS frames are supported on windowed aggregates in the " +
        "SELECT list (including QUALIFY/ORDER BY hoisted items) only")
    if (w.ref.isDefined)
      fail(s"named window '${w.ref.get}' is only valid in the SELECT/" +
        "HAVING/QUALIFY of the query whose WINDOW clause defines it")
    if (w.exclude != "no others")
      fail("EXCLUDE applies to sum/count/avg/min/max window aggregates " +
        "only (no decomposition exists for other window functions)")
    var spec: SparkWindow =
      if (w.partitionBy.nonEmpty)
        Window.partitionBy(w.partitionBy.map(lower): _*)
      else Window.partitionBy()
    if (w.orderBy.nonEmpty)
      spec = spec.orderBy(w.orderBy.map { oi =>
        val c = lower(oi.e)
        orderedCol(c, oi)
      }: _*)
    w.frame.foreach { f =>
      def bound(b: FrameBound): Long = b match {
        case UnboundedPreceding => Window.unboundedPreceding
        case UnboundedFollowing => Window.unboundedFollowing
        case CurrentRow         => Window.currentRow
        case Preceding(n)       => -n
        case Following(n)       => n
      }
      spec =
        if (f.isRows) spec.rowsBetween(bound(f.start), bound(f.end))
        else spec.rangeBetween(bound(f.start), bound(f.end))
    }
    spec
  }

  /** CAST / TRY_CAST (r7b): try_cast returns NULL on conversion
    * failure — same semantics as DuckDB's TRY_CAST, lowered through
    * [[graft.functions.SafeCast]] so failure-heavy string→number
    * columns skip Spark's per-row caught exception (regex pre-guard;
    * measured 1.45 s → ~0.1 s on q_try_cast). */
  private def castCol(c: Column, t: String, safe: Boolean): Column =
    if (safe) org.apache.spark.sql.GraftFn.safeCast(c, sparkType(t))
    else c.cast(sparkType(t))

  /** Type names accepted by the reference (sql.lark:87-106) → Spark. */
  private def sparkType(t: String): DataType = t.toLowerCase match {
    case "object" | "string" | "varchar" | "category" => StringType
    case "int" | "integer" | "int32"                  => IntegerType
    case "int16" | "smallint"                         => ShortType
    case "int64" | "bigint"                           => LongType
    case "float16" | "float32" | "float"              => FloatType
    case "float64" | "double"                         => DoubleType
    case "bool" | "boolean"                           => BooleanType
    case "timestamp" | "datetime64"                   => TimestampType
    case "date"                                       => DateType
    case "time"                                       => StringType
    // parameterized types (r6): decimal/numeric carry (precision,
    // scale) for EXACT arithmetic — the cross-engine-deterministic
    // money type; varchar(n) ignores its length (Spark strings are
    // unbounded, matching DuckDB comparison semantics)
    case dec if dec.startsWith("decimal(") || dec.startsWith("numeric(") =>
      val ps = dec.substring(dec.indexOf('(') + 1, dec.length - 1)
        .split(',').map(_.trim.toInt)
      if (ps.length == 1) DecimalType(ps(0), 0) else DecimalType(ps(0), ps(1))
    case "decimal" | "numeric"                        => DecimalType(18, 3)
    case vc if vc.startsWith("varchar(") || vc.startsWith("char(") => StringType
    case other => fail(s"unknown type name $other")
  }

  /** Window functions beyond the reference grammar's RANK/DENSE_RANK:
    * lead/lag (with optional offset and default), first_value /
    * last_value, row_number, ntile. */
  private def winFunc(name: String, args: Seq[Expr],
                      lower: Expr => Column,
                      ignoreNulls: Boolean = false): Column = {
    def c(i: Int): Column = lower(args(i))
    def n(i: Int): Int = args(i) match {
      case NumLit(t)      => t.toDouble.toInt
      case Neg(NumLit(t)) => -t.toDouble.toInt
      case other          => fail(s"expected integer literal, got $other")
    }
    // IGNORE NULLS (r5, standard <null treatment>): supported exactly
    // where Spark supports it — the offset/value window functions
    if (ignoreNulls)
      (name, args.length) match {
        case ("lead", 1) => return F.lead(c(0), 1, null, ignoreNulls = true)
        case ("lead", 2) => return F.lead(c(0), n(1), null, ignoreNulls = true)
        case ("lead", 3) =>
          return F.lead(c(0), n(1), litValue(args(2)), ignoreNulls = true)
        case ("lag", 1)  => return F.lag(c(0), 1, null, ignoreNulls = true)
        case ("lag", 2)  => return F.lag(c(0), n(1), null, ignoreNulls = true)
        case ("lag", 3)  =>
          return F.lag(c(0), n(1), litValue(args(2)), ignoreNulls = true)
        case ("first_value", 1) => return F.first(c(0), ignoreNulls = true)
        case ("last_value", 1)  => return F.last(c(0), ignoreNulls = true)
        case ("nth_value", 2)   =>
          return F.nth_value(c(0), n(1), ignoreNulls = true)
        case _ => fail(s"IGNORE NULLS is not supported on $name")
      }
    (name, args.length) match {
      case ("lead", 1) => F.lead(c(0), 1)
      case ("lead", 2) => F.lead(c(0), n(1))
      case ("lead", 3) => F.lead(c(0), n(1), litValue(args(2)))
      case ("lag", 1)  => F.lag(c(0), 1)
      case ("lag", 2)  => F.lag(c(0), n(1))
      case ("lag", 3)  => F.lag(c(0), n(1), litValue(args(2)))
      case ("first_value", 1) => F.first(c(0))
      case ("last_value", 1)  => F.last(c(0))
      case ("row_number", 0)  => F.row_number()
      case ("ntile", 1)       => F.ntile(n(0))
      case ("percent_rank", 0) => F.percent_rank()
      case ("cume_dist", 0)    => F.cume_dist()
      case ("nth_value", 2)    => F.nth_value(c(0), n(1))
      case _ => fail(s"unknown window function $name/${args.length}")
    }
  }

  /** Scalar function extension surface (graft addition; all map to
    * codegen'd Spark functions — no UDFs). */
  /** Higher-order functions with lambda arguments (r7b, DuckDB/Spark
    * dialect): transform/filter (element or (element, index) lambdas)
    * and aggregate/reduce (init + merge [+ finish]), plus DuckDB's
    * list_transform/list_filter spellings. Lambda bodies lower with
    * their params bound in [[lambdaEnv]] (params shadow columns;
    * save/restore nests correctly). Spark's HOF expressions are
    * interpreted (CodegenFallback) — fine per-element on short
    * arrays, the documented HOF rule. */
  private def hofCall(name: String, args: Seq[Expr],
                      lower: Expr => Column): Column = {
    def body(l: Lambda, bound: Seq[Column]): Column = {
      if (l.params.length != bound.length)
        fail(s"$name lambda takes ${bound.length} parameter(s), " +
          s"got ${l.params.length}")
      val saved = lambdaEnv
      lambdaEnv = lambdaEnv ++ l.params.map(_.toLowerCase).zip(bound)
      try lower(l.body) finally lambdaEnv = saved
    }
    def lam(e: Expr): Lambda = e match {
      case l: Lambda => l
      case other => fail(s"$name expects a lambda, got $other")
    }
    name.toLowerCase match {
      case "transform" | "list_transform" | "array_transform" =>
        if (args.length != 2) fail(s"$name takes (array, lambda)")
        val arr = lower(args.head); val l = lam(args(1))
        if (l.params.length == 2)
          F.transform(arr, (x, i) => body(l, Seq(x, i)))
        else F.transform(arr, x => body(l, Seq(x)))
      case "filter" | "list_filter" | "array_filter" =>
        if (args.length != 2) fail(s"$name takes (array, lambda)")
        val arr = lower(args.head); val l = lam(args(1))
        if (l.params.length == 2)
          F.filter(arr, (x, i) => body(l, Seq(x, i)))
        else F.filter(arr, x => body(l, Seq(x)))
      case "aggregate" | "reduce" =>
        if (args.length != 3 && args.length != 4)
          fail(s"$name takes (array, init, mergeLambda[, finishLambda])")
        val arr = lower(args.head); val init = lower(args(1))
        val merge = lam(args(2))
        args.lift(3) match {
          case Some(fin) =>
            F.aggregate(arr, init, (acc, x) => body(merge, Seq(acc, x)),
              acc => body(lam(fin), Seq(acc)))
          case None =>
            F.aggregate(arr, init, (acc, x) => body(merge, Seq(acc, x)))
        }
      case other =>
        fail(s"$other does not take lambda arguments (supported: " +
          "transform/filter/aggregate and their list_* spellings)")
    }
  }

  /** C-style strftime directives → Java DateTimeFormatter pattern
    * (the subset both engines render identically; unknown directives
    * are loud, literal text is quote-escaped so pattern letters in
    * the input never leak into the format). */
  private def strftimeToJava(fmt: String): String = {
    val sb = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      val s = lit.toString; lit.clear()
      // quote any run carrying letters, quotes, or the characters
      // DateTimeFormatterBuilder.appendPattern RESERVES ('#', '{',
      // '}' throw "reserved character" at runtime if unquoted)
      if (s.exists(ch => ch.isLetter || ch == '\'' || ch == '#' ||
          ch == '{' || ch == '}'))
        sb ++= "'" + s.replace("'", "''") + "'"
      else sb ++= s
    }
    var i = 0
    while (i < fmt.length) {
      val ch = fmt.charAt(i)
      if (ch == '%' && i + 1 < fmt.length) {
        val d = fmt.charAt(i + 1)
        val rep = d match {
          case 'Y' => "yyyy"
          case 'y' => "yy"
          case 'm' => "MM"
          case 'd' => "dd"
          case 'H' => "HH"
          case 'I' => "hh"
          case 'M' => "mm"
          case 'S' => "ss"
          case 'f' => "SSSSSS"
          case 'g' => "SSS"
          case 'j' => "DDD"
          case 'a' => "EEE"
          case 'A' => "EEEE"
          case 'b' | 'h' => "MMM"
          case 'B' => "MMMM"
          case 'p' => "a"
          // %V/%G (ISO week) are NOT mapped: Java's w/Y are
          // locale-week-based (Sunday-start under en), silently
          // diverging from the ISO numbers DuckDB prints
          case '%' => null   // literal percent
          case other =>
            fail(s"strftime directive %$other is not supported " +
              "(supported: %Y %y %m %d %H %I %M %S %f %g %j %a %A " +
              "%b %B %p %%)")
        }
        if (rep == null) lit += '%' else { flushLit(); sb ++= rep }
        i += 2
      } else { lit += ch; i += 1 }
    }
    flushLit()
    sb.toString
  }

  private def scalarFunc(name: String, cols: Seq[Column],
                         raw: Seq[Expr]): Column = {
    def c(i: Int): Column = cols(i)
    def isIntLit(i: Int): Boolean = raw(i) match {
      case NumLit(_) | Neg(NumLit(_)) => true
      case _ => false
    }
    def n(i: Int): Int = raw(i) match {
      case NumLit(t)      => t.toDouble.toInt
      case Neg(NumLit(t)) => -t.toDouble.toInt
      case other          => fail(s"expected integer literal, got $other")
    }
    def isStrLit(i: Int): Boolean = raw(i).isInstanceOf[StrLit]
    def strLit(i: Int): String = raw(i) match {
      case StrLit(v) => v
      case other     => fail(s"expected string literal, got $other")
    }
    // typed functions whose Scala API takes Int parameters only apply
    // to literal arguments; computed arguments (substring(x, k, 3)
    // with a column k) fall through to the registry call, which binds
    // column expressions fine
    (name, cols.length) match {
      case ("lower", 1)     => F.lower(c(0))
      case ("upper", 1)     => F.upper(c(0))
      case ("length", 1)    => F.length(c(0))
      case ("trim", 1)      => F.trim(c(0))
      // 2-arg trims take (string, chars) — graft order, matching the
      // TRIM(LEADING 'c' FROM x) sugar and the Scala API (Spark's SQL
      // registry confusingly reverses them); non-literal char sets
      // fall through to the registry with the operands swapped back
      case ("trim", 2) if isStrLit(1)  => F.trim(c(0), strLit(1))
      case ("ltrim", 2) if isStrLit(1) => F.ltrim(c(0), strLit(1))
      case ("rtrim", 2) if isStrLit(1) => F.rtrim(c(0), strLit(1))
      case ("trim" | "ltrim" | "rtrim", 2) =>
        F.call_function(name, cols(1), cols(0))
      case ("abs", 1)       => F.abs(c(0))
      case ("round", 1)     => F.round(c(0))
      case ("round", 2) if isIntLit(1) => F.round(c(0), n(1))
      case ("floor", 1)     => F.floor(c(0))
      case ("ceil", 1)      => F.ceil(c(0))
      case ("sqrt", 1)      => F.sqrt(c(0))
      case ("concat", _)    => F.concat(cols: _*)
      case ("substring", 3) if isIntLit(1) && isIntLit(2) =>
        F.substring(c(0), n(1), n(2))
      case ("unnest", _) =>
        fail("unnest(...) is only supported as a top-level select item " +
          "of a non-aggregating SELECT")
      // string_split(x, 'sep') — DuckDB name, LITERAL separator:
      // Spark's split() takes a regex, so the separator is
      // regex-quoted. Computed separators would need runtime quoting
      // — loud instead.
      case ("string_split", 2) =>
        if (!isStrLit(1))
          fail("string_split separator must be a string literal")
        F.split(c(0), java.util.regex.Pattern.quote(strLit(1)))
      // array_to_string(arr, 'sep') — DuckDB name; Spark's array_join
      // takes array<string> only, so non-string elements cast first
      // (both engines render integers identically, so the oracle can
      // hash array-valued results through this scalar form)
      case ("array_to_string", 2) =>
        if (!isStrLit(1))
          fail("array_to_string separator must be a string literal")
        F.array_join(c(0).cast("array<string>"), strLit(1))
      case ("year", 1)      => F.year(c(0))
      case ("month", 1)     => F.month(c(0))
      case ("day", 1)       => F.dayofmonth(c(0))
      // strftime(ts, '%Y-%m-%d') — DuckDB name/arg-order, C-style
      // directives converted to a Java DateTimeFormatter pattern
      // (LITERAL formats only: runtime format strings would need a
      // per-row converter — loud instead). date_trunc/date_part need
      // no case: Spark's registry shares DuckDB's signatures.
      case ("strftime", 2) =>
        if (!isStrLit(1))
          fail("strftime format must be a string literal")
        F.date_format(c(0), strftimeToJava(strLit(1)))
      // strptime(str, fmt) — the parse inverse, same converter
      case ("strptime", 2) =>
        if (!isStrLit(1))
          fail("strptime format must be a string literal")
        F.to_timestamp(c(0), strftimeToJava(strLit(1)))
      // date_diff('part', start, end) — DuckDB counts PART-BOUNDARY
      // crossings (day: 23:00 -> next 01:00 is 1), not elapsed full
      // units, so a plain timestampdiff would diverge; lower as the
      // difference of boundary ordinals
      case ("date_diff" | "datediff", 3) =>
        if (!isStrLit(0)) fail("date_diff part must be a string literal")
        val (a, b) = (c(1), c(2))
        def ep(col: Column, part: String, unit: Long): Column =
          F.unix_timestamp(F.date_trunc(part, col)) / unit
        (strLit(0).toLowerCase match {
          case "year" => F.year(b) - F.year(a)
          case "quarter" =>
            (F.year(b) * 4 + F.quarter(b)) - (F.year(a) * 4 + F.quarter(a))
          case "month" =>
            (F.year(b) * 12 + F.month(b)) - (F.year(a) * 12 + F.month(a))
          case "week" =>
            F.datediff(F.date_trunc("week", b).cast("date"),
              F.date_trunc("week", a).cast("date")) / 7
          case "day" => F.datediff(b.cast("date"), a.cast("date"))
          case "hour" => ep(b, "hour", 3600L) - ep(a, "hour", 3600L)
          case "minute" => ep(b, "minute", 60L) - ep(a, "minute", 60L)
          case "second" => ep(b, "second", 1L) - ep(a, "second", 1L)
          case other => fail(s"date_diff part '$other' is not supported " +
            "(year quarter month week day hour minute second)")
        }).cast("bigint")
      // date_part('field', x) — literal fields route through the
      // EXTRACT conversions (DuckDB dow is Sunday=0 vs Spark's
      // Sunday=1; isodow Monday=1; week is ISO week) instead of
      // Spark's registry date_part, whose DOW convention differs
      case ("date_part" | "datepart", 2) if isStrLit(0) =>
        strLit(0).toLowerCase match {
          case f @ ("year" | "month" | "quarter" | "hour" | "minute" |
               "second" | "day") => F.call_function(f, c(1))
          case "week" | "isoweek"  => F.weekofyear(c(1))
          case "doy" | "dayofyear" => F.dayofyear(c(1))
          case "dow" | "dayofweek" => F.dayofweek(c(1)) - F.lit(1)
          case "isodow"            => F.weekday(c(1)) + F.lit(1)
          // DuckDB epoch is DOUBLE seconds incl. the fraction
          case "epoch" =>
            F.unix_micros(c(1).cast("timestamp")) / F.lit(1e6)
          case other => fail(s"unsupported date_part field '$other'")
        }
      // DuckDB list_*/string aliases (r12): the everyday names a
      // porting user hits first, mapped onto codegen'd Spark
      // functions with matching semantics (probed: 1-based
      // list_position with 0-miss, nulls-LAST list_sort both
      // directions, null-ignoring list_has_all/list_unique)
      case ("list_contains" | "array_has", 2) => F.array_contains(c(0), c(1))
      case ("list_position" | "list_indexof", 2) =>
        F.array_position(c(0), c(1))
      case ("list_sort", 1) => F.array_sort(c(0))
      case ("list_reverse_sort", 1) => F.sort_array(c(0), asc = false)
      case ("list_has_any", 2) => F.arrays_overlap(c(0), c(1))
      case ("list_has_all", 2) =>
        F.forall(F.filter(c(1), e => e.isNotNull),
          e => F.coalesce(F.array_contains(c(0), e), F.lit(false)))
      case ("list_unique", 1) =>
        F.size(F.array_distinct(F.filter(c(0), e => e.isNotNull)))
      case ("starts_with" | "prefix", 2) => F.startswith(c(0), c(1))
      case ("ends_with" | "suffix", 2) => F.endswith(c(0), c(1))
      // regexp_matches is a PARTIAL match in DuckDB; regexp_full_match
      // anchors the whole string
      case ("regexp_matches", 2) => F.regexp_like(c(0), c(1))
      case ("regexp_full_match", 2) =>
        F.regexp_like(c(0), F.concat(F.lit("^(?:"), c(1), F.lit(")$")))
      // anything else resolves against Spark's FunctionRegistry —
      // the full built-in surface (md5, split, concat_ws, ...) plus
      // session-registered natives like graft_dot; unknown names
      // still fail at analysis with a clear message
      case _ => F.call_function(name, cols: _*)
    }
  }
}
