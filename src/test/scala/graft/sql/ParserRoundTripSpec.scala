package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import Ast._

/** Property tests: render random ASTs to SQL text, parse them back,
  * and require the same AST — precedence, associativity and keyword
  * handling can't silently drift. */
class ParserRoundTripSpec extends AnyFunSuite {

  private val genName: Gen[String] =
    Gen.oneOf("a", "b2", "col_x", "T1", "weird_name")

  private val genLiteral: Gen[Expr] = Gen.oneOf(
    Gen.choose(0, 9999).map(n => NumLit(n.toString)),
    Gen.choose(0.0, 100.0).map(d => NumLit(f"$d%.3f")),
    Gen.oneOf("x", "hello world", "O''Brien").map(StrLit),
    Gen.oneOf(true, false).map(BoolLit))

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) Gen.oneOf(genLiteral, genName.map(ColRef(None, _)))
    else Gen.frequency(
      3 -> genLiteral,
      3 -> genName.map(ColRef(None, _)),
      2 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/", "%")
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield Arith(op, l, r)),
      1 -> (for {
        op <- Gen.oneOf("=", "<>", ">", "<", ">=", "<=")
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield Cmp(op, l, r)),
      1 -> (for { l <- genExpr(depth - 1); r <- genExpr(depth - 1) }
        yield And(l, r)),
      1 -> (for { l <- genExpr(depth - 1); r <- genExpr(depth - 1) }
        yield Or(l, r)),
      1 -> genExpr(depth - 1).map(e => Coalesce(Seq(e, NumLit("0")))),
      1 -> (for { e <- genExpr(depth - 1); t <- Gen.oneOf("int", "float64", "string") }
        yield Cast(e, t)))

  /** Renders with explicit parentheses everywhere — parsing must
    * reproduce the tree exactly. */
  private def render(e: Expr): String = e match {
    case ColRef(None, n) => n
    case ColRef(Some(q), n) => s"$q.$n"
    case NumLit(t) => t
    case StrLit(v) => "'" + v.replace("'", "''") + "'"
    case BoolLit(b) => b.toString
    case Arith(op, l, r) => s"(${render(l)} $op ${render(r)})"
    case Cmp(op, l, r) => s"(${render(l)} $op ${render(r)})"
    case And(l, r) => s"(${render(l)} and ${render(r)})"
    case Or(l, r) => s"(${render(l)} or ${render(r)})"
    case Coalesce(args) => s"coalesce(${args.map(render).mkString(", ")})"
    case Cast(x, t, sf) =>
      s"${if (sf) "try_cast" else "cast"}(${render(x)} as $t)"
    case other => throw new IllegalArgumentException(other.toString)
  }

  /** Strips the parens-only distinction: parsing "(a)" yields `a`. */
  private def parseBack(sql: String): Expr =
    new Parser(Lexer.tokenize(sql)).parseExpr()

  test("expression round-trip: parse(render(ast)) == ast (500 samples)") {
    val samples = Gen.listOfN(500, genExpr(4))
      .pureApply(Gen.Parameters.default, Seed(42L))
    samples.foreach { e =>
      val sql = render(e)
      assert(parseBack(sql) == e, s"\nsql: $sql")
    }
  }

  test("escaped quotes in string literals round-trip") {
    assert(parseBack("'O''Brien'") == StrLit("O'Brien"))
  }

  test("r7b syntax parses to the expected shapes") {
    // GROUPS frame mode
    val q = Parser.parse(
      """select sum(b) over (partition by a order by b
           groups between 2 preceding and 1 following exclude ties) as s
         from t""")
    val w = q.asInstanceOf[Leaf].q.sel.items.head.e
      .asInstanceOf[AggExpr].window.get
    assert(w.frame == Some(Frame(isRows = false, Preceding(2),
      Following(1), isGroups = true)), w.toString)
    assert(w.exclude == "ties")
    // lambdas: element, indexed, multi-param; only in argument position
    val q2 = Parser.parse(
      "select transform(xs, x -> x + 1) as t, " +
        "aggregate(xs, 0, (acc, v) -> acc + v) as s from t")
    val items = q2.asInstanceOf[Leaf].q.sel.items
    assert(items.head.e == FuncCall("transform", Seq(ColRef(None, "xs"),
      Lambda(Seq("x"), Arith("+", ColRef(None, "x"), NumLit("1"))))))
    assert(items(1).e.asInstanceOf[FuncCall].args(2) ==
      Lambda(Seq("acc", "v"), Arith("+", ColRef(None, "acc"),
        ColRef(None, "v"))))
    // a parenthesized expression is NOT a lambda
    val q3 = Parser.parse("select coalesce((a), b) as c from t")
    assert(q3.asInstanceOf[Leaf].q.sel.items.head.e ==
      Coalesce(Seq(ColRef(None, "a"), ColRef(None, "b"))))
    // ASOF [LEFT] JOIN
    val q4 = Parser.parse(
      "select 1 as one from a asof left join b on a.k = b.k and a.t >= b.t")
    val rel = q4.asInstanceOf[Leaf].q.sel.from.asInstanceOf[AsofJoinRel]
    assert(rel.leftOuter)
    assert(rel.on == And(Cmp("=", ColRef(Some("a"), "k"), ColRef(Some("b"), "k")),
      Cmp(">=", ColRef(Some("a"), "t"), ColRef(Some("b"), "t"))))
  }

  test("round-2 syntax parses to the expected shapes") {
    // CTE + USING + rollup + ilike + not-like + scalar subquery
    val q = Parser.parse(
      """with c as (select a from t1)
         select a, (select max(b2) from t2) as m
         from c join t2 using (a)
         where a not like 'x%' and b2 ilike 'Y%'
         group by rollup(a, b2)""")
    val WithQuery(ctes, Leaf(body), _, _) = q: @unchecked
    assert(ctes.map(_._1) == Seq("c"))
    assert(body.sel.groupMode == "rollup" && body.sel.groupBy.length == 2)
    assert(body.sel.from.isInstanceOf[UsingJoinRel])
    assert(body.sel.items.exists(_.e.isInstanceOf[ScalarSubquery]))
    val w = body.sel.where.get
    assert(w == And(Not(Like(ColRef(None, "a"), "x%")),
                    ILike(ColRef(None, "b2"), "Y%")))
  }

  test("round-4 syntax parses to the expected shapes") {
    // named WINDOW definitions + OVER name references
    val q = Parser.parse(
      """select a, rank() over w as rk, sum(b) over w2 as sb
         from t
         window w as (partition by a order by b desc nulls last),
                w2 as (partition by a order by b rows 2 preceding)""")
    val sel = q.asInstanceOf[Leaf].q.sel
    assert(sel.windows.map(_._1) == Seq("w", "w2"), sel.windows.toString)
    val w1 = sel.windows.head._2
    assert(w1.partitionBy == Seq(ColRef(None, "a")) &&
      w1.orderBy == Seq(OrderItem(ColRef(None, "b"), asc = false,
        nullsFirst = Some(false))), w1.toString)
    // bare "2 preceding" frame: start bound + implicit CURRENT ROW end
    assert(sel.windows(1)._2.frame ==
      Some(Frame(isRows = true, Preceding(2), CurrentRow)))
    sel.items.collect { case SelectItem(RankExpr(_, w), _) =>
      assert(w.ref.contains("w"))
    }
    // empty reference-parity definition
    val q2 = Parser.parse("select a from t window w as ()")
    assert(q2.asInstanceOf[Leaf].q.sel.windows ==
      Seq("w" -> WindowSpec(Nil, Nil, None)))
    // grouping sets dedup the flattened union case-insensitively
    val q3 = Parser.parse(
      "select a, b, count(*) as n from t group by grouping sets ((a, b), (A))")
    assert(q3.asInstanceOf[Leaf].q.sel.groupBy ==
      Seq(ColRef(None, "a"), ColRef(None, "b")), q3.toString)
  }

  test("full query round-trip for a representative query") {
    val sql = """select a, (b2 + 3) as c from t1
                 where (a > 1 and b2 < 2) or a = 5
                 group by a, b2 having count(a) > 1
                 order by a desc limit 7 offset 2"""
    val q = Parser.parse(sql)
    val Leaf(query) = q: @unchecked
    assert(query.limit.contains(7L) && query.offset.contains(2L))
    assert(query.sel.groupBy.length == 2)
    assert(query.orderBy.head.asc == false)
  }
}
