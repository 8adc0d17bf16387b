package graft.filter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Formulas
import OptimadeFilter._

/** Compiles an OPTIMADE filter AST to a Catalyst [[Column]] predicate.
  *
  * This replaces the reference's provider delegation
  * (optimade_database/Optimade_Server/server.py:106-120): instead of
  * serializing the filter string to 12+ REST providers, the predicate is
  * evaluated by Spark against each source DataFrame, which means predicate
  * pushdown to the parquet scan, codegen, and partition pruning all apply.
  *
  * Semantics notes:
  *  - `chemical_formula_reduced = "SiO2"` literals are Hill-canonicalized
  *    at compile time (reference utils.py:164-175 — an analyzer-style
  *    rewrite done here at constant cost, SURVEY §4).
  *  - HAS ALL  → conjunction of array_contains
  *    HAS ANY  → arrays_overlap
  *    HAS ONLY → array_except(col, values) empty (subset semantics per
  *    the OPTIMADE spec; an empty list property passes).
  *  - IS KNOWN → isNotNull; string ops map to contains/startswith/endswith.
  */
object OptimadeCompiler {

  /** Resolve a property name to a Column. Override `resolve` to mediate
    * provider-specific names (SURVEY F5) or computed columns. */
  final case class Context(resolve: String => Column = col,
                           canonicalizeFormulas: Boolean = true)

  def compile(filter: String, ctx: Context = Context()): Either[String, Column] =
    OptimadeFilter.parse(filter).map(e => compileExpr(e, ctx))

  /** Compile or throw — for call sites that want an exception. */
  def compileOrThrow(filter: String, ctx: Context = Context()): Column =
    compile(filter, ctx).fold(m => throw new IllegalArgumentException(m), identity)

  /** Apply a filter string to a DataFrame (columns resolved by name). */
  def where(df: DataFrame, filter: String): DataFrame =
    df.filter(compileOrThrow(filter, Context(resolve = df.col)))

  private def lit_(v: Value, ctx: Context): Column = v match {
    case StringVal(s)   => lit(s)
    case NumberVal(n)   => if (n == math.rint(n) && !n.isInfinite) lit(n.toLong) else lit(n)
    case PropertyVal(p) => ctx.resolve(p)
  }

  private def cmp(c: Column, op: CompOp, v: Column): Column = op match {
    case Eq => c === v
    case Ne => c =!= v
    case Lt => c < v
    case Le => c <= v
    case Gt => c > v
    case Ge => c >= v
  }

  private def compileExpr(e: Expr, ctx: Context): Column = e match {
    case And(l, r) => compileExpr(l, ctx) && compileExpr(r, ctx)
    case Or(l, r)  => compileExpr(l, ctx) || compileExpr(r, ctx)
    case Not(x)    => !compileExpr(x, ctx)

    case Comparison(prop, Eq, StringVal(s))
        if ctx.canonicalizeFormulas && prop == "chemical_formula_reduced" =>
      ctx.resolve(prop) === lit(Formulas.hillFormula(s))

    case Comparison(prop, op, v) =>
      cmp(ctx.resolve(prop), op, lit_(v, ctx))

    case StringMatch(prop, mode, s) =>
      val c = ctx.resolve(prop)
      mode match {
        case Contains   => c.contains(s)
        case StartsWith => c.startsWith(s)
        case EndsWith   => c.endsWith(s)
      }

    case Has(prop, HasAll, vs) =>
      vs.map(v => array_contains(ctx.resolve(prop), lit_(v, ctx))).reduceLeft(_ && _)

    case Has(prop, HasAny, vs) =>
      arrays_overlap(ctx.resolve(prop), array(vs.map(lit_(_, ctx)): _*))

    case Has(prop, HasOnly, vs) =>
      size(array_except(ctx.resolve(prop), array(vs.map(lit_(_, ctx)): _*))) === 0

    case HasMatch(prop, op, v) =>
      exists(ctx.resolve(prop), x => cmp(x, op, lit_(v, ctx)))

    case Length(prop, op, v) =>
      cmp(size(ctx.resolve(prop)), op, lit_(v, ctx))

    case IsKnown(prop, known) =>
      if (known) ctx.resolve(prop).isNotNull else ctx.resolve(prop).isNull

    // Correlated sets: per zipped property, transform the list into a
    // per-index boolean match array, AND the arrays positionally
    // (zip_with), then quantify. The HOF operands are evaluated once
    // each (arrays, not re-captured expressions), so this stays one pass
    // over the lists — no all-pairs blowup, arity is unbounded.
    case ZipHas(props, mode, tuples) =>
      def tupleHits(t: Seq[ZipTerm]): Column =
        props.zip(t).map { case (p, term) =>
          transform(ctx.resolve(p), x => cmp(x, term.op, lit_(term.value, ctx)))
        }.reduceLeft((l, r) => zip_with(l, r, (x, y) => x && y))
      mode match {
        case HasAll =>
          tuples.map(t => exists(tupleHits(t), p => p)).reduceLeft(_ && _)
        case HasAny =>
          tuples.map(t => exists(tupleHits(t), p => p)).reduceLeft(_ || _)
        case HasOnly =>
          // every index matches at least one of the listed tuples
          forall(
            tuples.map(tupleHits).reduceLeft((l, r) => zip_with(l, r, (x, y) => x || y)),
            p => p)
      }
  }
}
