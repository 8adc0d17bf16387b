package graft.filter

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import OptimadeFilter._

/** Property test: render a random AST to filter text, parse it back, and
  * require the identical AST (500 seeded iterations). Catches precedence,
  * quoting, and keyword-boundary bugs the example corpus can't.
  */
class OptimadeRoundTripSpec extends AnyFunSuite {

  private def renderValue(v: Value): String = v match {
    case StringVal(s) =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case NumberVal(n) =>
      if (n == math.rint(n) && math.abs(n) < 1e15) n.toLong.toString else n.toString
    case PropertyVal(p) => p
  }

  private def renderOp(op: CompOp): String = op match {
    case Eq => "=" ; case Ne => "!=" ; case Lt => "<"
    case Le => "<=" ; case Gt => ">" ; case Ge => ">="
  }

  /** Render with explicit parens everywhere except around leaves, so the
    * parse must reproduce the exact tree. */
  private def render(e: Expr): String = e match {
    case And(l, r) => s"(${render(l)} AND ${render(r)})"
    case Or(l, r)  => s"(${render(l)} OR ${render(r)})"
    case Not(x)    => s"NOT (${render(x)})"
    case Comparison(p, op, v) => s"$p ${renderOp(op)} ${renderValue(v)}"
    case StringMatch(p, Contains, s)   => s"$p CONTAINS ${renderValue(StringVal(s))}"
    case StringMatch(p, StartsWith, s) => s"$p STARTS WITH ${renderValue(StringVal(s))}"
    case StringMatch(p, EndsWith, s)   => s"$p ENDS WITH ${renderValue(StringVal(s))}"
    case Has(p, HasAll, vs)  => s"$p HAS ALL ${vs.map(renderValue).mkString(", ")}"
    case Has(p, HasAny, vs)  => s"$p HAS ANY ${vs.map(renderValue).mkString(", ")}"
    case Has(p, HasOnly, vs) => s"$p HAS ONLY ${vs.map(renderValue).mkString(", ")}"
    case HasMatch(p, op, v)  => s"$p HAS ${renderOp(op)} ${renderValue(v)}"
    case Length(p, op, v)    => s"$p LENGTH ${renderOp(op)} ${renderValue(v)}"
    case IsKnown(p, true)    => s"$p IS KNOWN"
    case IsKnown(p, false)   => s"$p IS UNKNOWN"
    case ZipHas(props, mode, tuples) =>
      val m = mode match {
        case HasAll => "ALL "; case HasAny => "ANY "; case HasOnly => "ONLY "
      }
      val ts = tuples.map(_.map(t =>
        s"${renderOp(t.op)} ${renderValue(t.value)}").mkString(" : ")).mkString(", ")
      s"${props.mkString(":")} HAS $m$ts"
  }

  private def genIdent(rnd: Random): String = {
    val base = Seq("elements", "nelements", "band_gap", "chemical_formula_reduced",
      "_alexandria_band_gap", "x", "prop_a")(rnd.nextInt(7))
    base
  }

  private def genValue(rnd: Random): Value = rnd.nextInt(3) match {
    case 0 =>
      val chars = Seq("Si", "O2Si", "a b", "x\"y", "p\\q", "NaCl", "")(rnd.nextInt(7))
      StringVal(chars)
    case 1 => NumberVal(Seq(0.0, 1.0, -2.0, 3.5, 1.5e-3, 42.0)(rnd.nextInt(6)))
    case _ => PropertyVal(genIdent(rnd))
  }

  private def genOp(rnd: Random): CompOp =
    Seq(Eq, Ne, Lt, Le, Gt, Ge)(rnd.nextInt(6))

  private def genLeaf(rnd: Random): Expr = rnd.nextInt(7) match {
    case 0 => Comparison(genIdent(rnd), genOp(rnd), genValue(rnd))
    case 1 => StringMatch(genIdent(rnd),
      Seq(Contains, StartsWith, EndsWith)(rnd.nextInt(3)), "H2O")
    case 2 => Has(genIdent(rnd), Seq(HasAll, HasAny, HasOnly)(rnd.nextInt(3)),
      Seq.fill(1 + rnd.nextInt(3))(StringVal(Seq("Si", "O", "Fe")(rnd.nextInt(3)))))
    case 3 => HasMatch(genIdent(rnd), genOp(rnd), NumberVal(rnd.nextInt(10).toDouble))
    case 4 => Length(genIdent(rnd), genOp(rnd), NumberVal(rnd.nextInt(10).toDouble))
    case 5 =>
      val k = 2 + rnd.nextInt(2) // 2- or 3-way zip
      ZipHas(Seq.fill(k)(genIdent(rnd)),
        Seq(HasAll, HasAny, HasOnly)(rnd.nextInt(3)),
        Seq.fill(1 + rnd.nextInt(2))(
          Seq.fill(k)(ZipTerm(genOp(rnd), genValue(rnd)))))
    case _ => IsKnown(genIdent(rnd), rnd.nextBoolean())
  }

  private def genExpr(rnd: Random, depth: Int): Expr =
    if (depth == 0) genLeaf(rnd)
    else rnd.nextInt(4) match {
      case 0 => And(genExpr(rnd, depth - 1), genExpr(rnd, depth - 1))
      case 1 => Or(genExpr(rnd, depth - 1), genExpr(rnd, depth - 1))
      case 2 => Not(genExpr(rnd, depth - 1))
      case _ => genLeaf(rnd)
    }

  test("render → parse round-trips 500 random ASTs exactly") {
    val rnd = new Random(20260812L)
    (1 to 500).foreach { i =>
      val ast = genExpr(rnd, 1 + rnd.nextInt(3))
      // normalize: formula-equality nodes get canonicalized by the
      // COMPILER, not the parser, so the parsed AST must equal the input
      val text = render(ast)
      OptimadeFilter.parse(text) match {
        case Right(parsed) => assert(parsed == ast, s"[$i] $text")
        case Left(err) => fail(s"[$i] failed to parse rendered filter: $text — $err")
      }
    }
  }
}
