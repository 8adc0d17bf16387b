package graft.filter

import org.scalatest.funsuite.AnyFunSuite
import OptimadeFilter._

class OptimadeFilterSpec extends AnyFunSuite {

  private def p(s: String): Expr =
    OptimadeFilter.parse(s).fold(m => fail(s"parse failed: $m"), identity)

  test("reference corpus parses (Optimade_Agent/agent.py:115-150)") {
    val corpus = Seq(
      """elements HAS ALL "Si","O" AND nelements=4 AND NOT (elements HAS ALL "Fe","Al")""",
      """chemical_formula_anonymous="A2B3C4" AND NOT (elements HAS ANY "Fe","F","Cl","H") AND (elements HAS ANY "Al","Mg","Na")""",
      """chemical_formula_reduced="OZr"""",
      """chemical_formula_descriptive CONTAINS "H2O"""",
      """nelements>=2 AND nelements<=7""",
      """elements HAS ALL "Al","O","Mg" AND nelements=3""",
      """_alexandria_band_gap>=1.0 AND _alexandria_band_gap<=3.0""",
      """_tcod_sg="P m -3 m"""",
      """elements HAS ONLY "Si","O"""",
      """elements LENGTH 3""",
      """chemical_formula_descriptive STARTS WITH "H2" AND chemical_formula_descriptive ENDS WITH "O"""")
    corpus.foreach(f => p(f))
  }

  test("precedence: AND binds tighter than OR; NOT tightest") {
    assert(p("""a=1 OR b=2 AND c=3""") ==
      Or(Comparison("a", Eq, NumberVal(1)),
         And(Comparison("b", Eq, NumberVal(2)), Comparison("c", Eq, NumberVal(3)))))
    assert(p("""NOT a=1 AND b=2""") ==
      And(Not(Comparison("a", Eq, NumberVal(1))), Comparison("b", Eq, NumberVal(2))))
    assert(p("""(a=1 OR b=2) AND c=3""") ==
      And(Or(Comparison("a", Eq, NumberVal(1)), Comparison("b", Eq, NumberVal(2))),
          Comparison("c", Eq, NumberVal(3))))
  }

  test("operators, constant-first, property-property") {
    assert(p("""nelements != 3""") == Comparison("nelements", Ne, NumberVal(3)))
    // constant-first is normalized by flipping the operator
    assert(p("""3 < nelements""") == Comparison("nelements", Gt, NumberVal(3)))
    assert(p(""""Si" = chemical_formula_reduced""") ==
      Comparison("chemical_formula_reduced", Eq, StringVal("Si")))
    assert(p("""nelements = nsites""") ==
      Comparison("nelements", Eq, PropertyVal("nsites")))
  }

  test("HAS forms") {
    assert(p("""elements HAS "Si"""") == Has("elements", HasAll, Seq(StringVal("Si"))))
    assert(p("""numbers HAS < 3""") == HasMatch("numbers", Lt, NumberVal(3)))
    assert(p("""elements LENGTH >= 2""") == Length("elements", Ge, NumberVal(2)))
  }

  test("IS KNOWN / UNKNOWN, STARTS/ENDS with optional WITH") {
    assert(p("""band_gap IS KNOWN""") == IsKnown("band_gap", known = true))
    assert(p("""band_gap IS UNKNOWN""") == IsKnown("band_gap", known = false))
    assert(p("""name STARTS "ab"""") == StringMatch("name", StartsWith, "ab"))
    assert(p("""name ENDS "yz"""") == StringMatch("name", EndsWith, "yz"))
  }

  test("strings: escapes; numbers: floats, exponents, signs") {
    assert(p("""name = "a\"b\\c"""") == Comparison("name", Eq, StringVal("a\"b\\c")))
    assert(p("""x = 1.5e-3""") == Comparison("x", Eq, NumberVal(1.5e-3)))
    assert(p("""x = -2""") == Comparison("x", Eq, NumberVal(-2)))
    assert(p("""x = .5""") == Comparison("x", Eq, NumberVal(0.5)))
  }

  test("malformed filters rejected") {
    assert(OptimadeFilter.parse("").isLeft)
    assert(OptimadeFilter.parse("AND x=1").isLeft)
    assert(OptimadeFilter.parse("x = ").isLeft)
    assert(OptimadeFilter.parse("(x=1").isLeft)
    assert(OptimadeFilter.parse("""x HAS BOGUS "a"""").isLeft)
    assert(OptimadeFilter.parse("""Elements HAS "Si"""").isLeft) // uppercase property
  }
}
