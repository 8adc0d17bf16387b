package graft.filter

import scala.util.parsing.combinator.RegexParsers

/** OPTIMADE filter-language AST and parser (OPTIMADE API spec v1.0 §"The
  * Filter Language Syntax" — a published grammar).
  *
  * This is the one component the reference outsources entirely: it ships
  * filter strings to remote providers which parse and evaluate them
  * (optimade_database/Optimade_Server/server.py:106-120). The Spark rebuild
  * evaluates them locally, so the grammar is implemented here and compiled
  * to Catalyst expressions in [[OptimadeCompiler]].
  *
  * Supported surface = the full v1.0 expression grammar exercised by the
  * reference corpus (Optimade_Agent/agent.py:115-150, optimade_test dir):
  * comparisons = != < <= > >=, CONTAINS / STARTS [WITH] / ENDS [WITH],
  * HAS [ALL|ANY|ONLY], HAS <op> value, LENGTH [op] value, IS KNOWN/UNKNOWN,
  * AND/OR/NOT with parentheses, string/number/property values,
  * constant-first comparisons, and correlated (zipped) set membership
  * over parallel list properties — `a:b HAS "Si":&gt;0.3`, including the
  * HAS ALL/ANY/ONLY tuple-list forms.
  */
object OptimadeFilter {

  sealed trait Value
  final case class StringVal(v: String) extends Value
  final case class NumberVal(v: Double) extends Value
  final case class PropertyVal(name: String) extends Value

  sealed trait CompOp { def flip: CompOp }
  case object Eq extends CompOp { def flip = Eq }
  case object Ne extends CompOp { def flip = Ne }
  case object Lt extends CompOp { def flip = Gt }
  case object Le extends CompOp { def flip = Ge }
  case object Gt extends CompOp { def flip = Lt }
  case object Ge extends CompOp { def flip = Le }

  sealed trait SetMode
  case object HasAll extends SetMode
  case object HasAny extends SetMode
  case object HasOnly extends SetMode

  sealed trait StrMode
  case object Contains extends StrMode
  case object StartsWith extends StrMode
  case object EndsWith extends StrMode

  sealed trait Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class Comparison(prop: String, op: CompOp, value: Value) extends Expr
  final case class StringMatch(prop: String, mode: StrMode, value: String) extends Expr
  final case class Has(prop: String, mode: SetMode, values: Seq[Value]) extends Expr
  /** `prop HAS < 3` — an element matching the operator exists. */
  final case class HasMatch(prop: String, op: CompOp, value: Value) extends Expr
  final case class Length(prop: String, op: CompOp, value: Value) extends Expr
  final case class IsKnown(prop: String, known: Boolean) extends Expr

  /** One component of a correlated-set tuple: optional operator (defaults
    * to =) + value, e.g. the `>0.3` in `"Si":>0.3`. */
  final case class ZipTerm(op: CompOp, value: Value)
  /** Correlated (zipped) set membership over parallel list properties —
    * `elements:elements_ratios HAS "Si":>0.3` asks for an INDEX where
    * both component predicates hold simultaneously (OPTIMADE v1.0
    * "correlated values" HAS forms). `tuples` are the comma-separated
    * tuple list for ALL/ANY/ONLY; the bare HAS form is ALL of one. */
  final case class ZipHas(props: Seq[String], mode: SetMode,
                          tuples: Seq[Seq[ZipTerm]]) extends Expr

  private object P extends RegexParsers {
    override val skipWhitespace = true

    // identifiers: lowercase start per spec; we additionally allow dots for
    // nested-field access (an engine extension, e.g. structure.nsites)
    val ident: Parser[String] = """[a-z_][a-z_0-9]*(\.[a-z_][a-z_0-9]*)*""".r

    val number: Parser[Double] =
      """[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?""".r ^^ (_.toDouble)

    val string: Parser[String] =
      """"(\\.|[^"\\])*"""".r ^^ { raw =>
        val body = raw.substring(1, raw.length - 1)
        val sb = new StringBuilder
        var i = 0
        while (i < body.length) {
          val c = body.charAt(i)
          if (c == '\\' && i + 1 < body.length) { sb.append(body.charAt(i + 1)); i += 2 }
          else { sb.append(c); i += 1 }
        }
        sb.toString
      }

    val value: Parser[Value] =
      string ^^ StringVal.apply |
      number ^^ NumberVal.apply |
      ident ^^ PropertyVal.apply

    val op: Parser[CompOp] =
      "<=" ^^^ Le | ">=" ^^^ Ge | "!=" ^^^ Ne |
      "<" ^^^ Lt | ">" ^^^ Gt | "=" ^^^ Eq

    val valueList: Parser[Seq[Value]] = rep1sep(value, ",")

    // property-first comparison RHS forms
    def rhs(prop: String): Parser[Expr] =
      ("IS" ~> ("KNOWN" ^^^ true | "UNKNOWN" ^^^ false)) ^^ (k => IsKnown(prop, k)) |
      ("CONTAINS" ~> string) ^^ (s => StringMatch(prop, Contains, s)) |
      ("STARTS" ~> opt("WITH") ~> string) ^^ (s => StringMatch(prop, StartsWith, s)) |
      ("ENDS" ~> opt("WITH") ~> string) ^^ (s => StringMatch(prop, EndsWith, s)) |
      ("HAS" ~> "ALL" ~> valueList) ^^ (vs => Has(prop, HasAll, vs)) |
      ("HAS" ~> "ANY" ~> valueList) ^^ (vs => Has(prop, HasAny, vs)) |
      ("HAS" ~> "ONLY" ~> valueList) ^^ (vs => Has(prop, HasOnly, vs)) |
      ("HAS" ~> op ~ value) ^^ { case o ~ v => HasMatch(prop, o, v) } |
      ("HAS" ~> value) ^^ (v => Has(prop, HasAll, Seq(v))) |
      ("LENGTH" ~> op ~ value) ^^ { case o ~ v => Length(prop, o, v) } |
      ("LENGTH" ~> value) ^^ (v => Length(prop, Eq, v)) |
      (op ~ value) ^^ { case o ~ v => Comparison(prop, o, v) }

    // constant-first: "value op property" (spec) — normalized by flipping
    val constFirst: Parser[Expr] =
      (string ^^ StringVal.apply | number ^^ NumberVal.apply) ~ op ~ ident ^^ {
        case v ~ o ~ p => Comparison(p, o.flip, v)
      }

    // correlated sets: `a:b HAS "Si":>0.3`, `a:b HAS ALL t1, t2`, ...
    val zipProps: Parser[Seq[String]] =
      ident ~ rep1(":" ~> ident) ^^ { case h ~ t => h +: t }
    val zipTerm: Parser[ZipTerm] =
      opt(op) ~ value ^^ { case o ~ v => ZipTerm(o.getOrElse(Eq), v) }
    def zipTuple(n: Int): Parser[Seq[ZipTerm]] =
      rep1sep(zipTerm, ":") ^? (
        { case ts if ts.size == n => ts },
        ts => s"zip tuple arity ${ts.size} != $n zipped properties")
    def zipRhs(props: Seq[String]): Parser[Expr] = {
      val n = props.size
      ("HAS" ~> "ALL" ~> rep1sep(zipTuple(n), ",")) ^^ (ts => ZipHas(props, HasAll, ts)) |
      ("HAS" ~> "ANY" ~> rep1sep(zipTuple(n), ",")) ^^ (ts => ZipHas(props, HasAny, ts)) |
      ("HAS" ~> "ONLY" ~> rep1sep(zipTuple(n), ",")) ^^ (ts => ZipHas(props, HasOnly, ts)) |
      ("HAS" ~> zipTuple(n)) ^^ (t => ZipHas(props, HasAll, Seq(t)))
    }

    val comparison: Parser[Expr] =
      constFirst | (zipProps into (ps => zipRhs(ps))) | (ident into (p => rhs(p)))

    lazy val phrase: Parser[Expr] =
      ("NOT" ~> phrase) ^^ Not.apply |
      ("(" ~> expr <~ ")") |
      comparison

    lazy val conj: Parser[Expr] =
      rep1sep(phrase, "AND") ^^ (_.reduceLeft(And.apply))

    lazy val expr: Parser[Expr] =
      rep1sep(conj, "OR") ^^ (_.reduceLeft(Or.apply))

    def parseFilter(s: String): Either[String, Expr] =
      parseAll(expr, s) match {
        case Success(e, _)   => Right(e)
        case NoSuccess(m, in) => Left(s"parse error at ${in.pos}: $m")
        case _               => Left("parse error")
      }
  }

  /** Parse an OPTIMADE filter string into an AST. */
  def parse(filter: String): Either[String, Expr] =
    if (filter == null || filter.trim.isEmpty) Left("empty filter")
    else P.parseFilter(filter.trim)
}
