package graft.functions

import scala.collection.mutable

/** Chemical-formula functions (pure Scala; Column wrappers in
  * [[GraftFunctions]]).
  *
  * Reference semantics (file:line in /root/reference):
  *  - unicode digit normalization: optimade_database/Optimade_Server/utils.py:129-155
  *    (same table duplicated in bohriumpublic/openlam utils)
  *  - Hill canonicalization: optimade_database/Optimade_Server/utils.py:157-161
  *    delegates to pymatgen `Composition(f).hill_formula` with spaces removed;
  *    demos at optimade_test/hill_formula.py:1-5 (TiO2→O2Ti) and
  *    Optimade_Server/utils.py:662-682 (SiO2→O2Si, NaCl→ClNa, Al2O3→Al2O3).
  *    NOTE: Hill ordering does NOT reduce amounts (SiO2→O2Si keeps the 2);
  *    C first then H then alphabetical when carbon present, otherwise all
  *    alphabetical (H sorts normally).
  */
object Formulas {

  /** Sub/superscript + full-width digits → ASCII. Exposed as two parallel
    * strings so the Spark side can use the codegen'd `translate` built-in. */
  val TranslateFrom: String = "₀₁₂₃₄₅₆₇₈₉" + "⁰¹²³⁴⁵⁶⁷⁸⁹" + "０１２３４５６７８９"
  val TranslateTo: String   = "0123456789" * 3

  private val digitMap: Map[Char, Char] =
    TranslateFrom.zip(TranslateTo).toMap

  /** SrTiO₃ → SrTiO3; H²O → H2O; full-width digits → ASCII. */
  def normalizeFormula(formula: String): String =
    formula.map(c => digitMap.getOrElse(c, c))

  /** Parse a formula into per-element summed amounts, preserving first-seen
    * order. Supports nested groups `()`/`[]` with multipliers and fractional
    * amounts ("Ca(OH)2", "Li0.5CoO2"). Throws IllegalArgumentException on
    * malformed input.
    */
  def parseFormula(formula: String): Seq[(String, Double)] = {
    // hydrate / adduct dot notation: "CuSO4·5H2O" = CuSO4 + 5×(H2O);
    // each '·'-separated part may carry a leading multiplier
    val normalized0 = normalizeFormula(formula).trim
    if (normalized0.exists(c => c == '·' || c == '⋅' || c == '∙')) {
      val counts = mutable.LinkedHashMap.empty[String, Double]
      normalized0.split("[·⋅∙]").filter(_.nonEmpty).foreach { part0 =>
        val part = part0.trim
        val multStr = part.takeWhile(c => c.isDigit || c == '.')
        val mult = if (multStr.isEmpty) 1.0 else multStr.toDouble
        parseFormula(part.drop(multStr.length)).foreach { case (sym, n) =>
          counts.update(sym, counts.getOrElse(sym, 0.0) + n * mult)
        }
      }
      if (counts.isEmpty)
        throw new IllegalArgumentException(s"invalid formula '$formula': no elements")
      return counts.toSeq
    }
    val s = normalized0
    val counts = mutable.LinkedHashMap.empty[String, Double]
    var i = 0

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"invalid formula '$formula': $msg at index $i")

    def number(default: Double): Double = {
      val start = i
      while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
      if (i == start) default
      else try s.substring(start, i).toDouble
      catch { case _: NumberFormatException => fail(s"bad amount '${s.substring(start, i)}'") }
    }

    // returns the (element -> amount) multiset of one group body
    def group(closer: Option[Char]): Seq[(String, Double)] = {
      val local = mutable.LinkedHashMap.empty[String, Double]
      def add(sym: String, n: Double): Unit =
        local.update(sym, local.getOrElse(sym, 0.0) + n)
      var done = false
      while (i < s.length && !done) {
        val c = s(i)
        if (closer.contains(c)) { i += 1; done = true }
        else if (c == '(' || c == '[') {
          i += 1
          val inner = group(Some(if (c == '(') ')' else ']'))
          val mult = number(1.0)
          inner.foreach { case (sym, n) => add(sym, n * mult) }
        } else if (c.isUpper) {
          val start = i
          i += 1
          while (i < s.length && s(i).isLower) i += 1
          val sym = s.substring(start, i)
          add(sym, number(1.0))
        } else if (c == ' ') i += 1
        else fail(s"unexpected character '$c'")
      }
      if (!done && closer.isDefined) fail(s"unclosed '${closer.get}'")
      local.toSeq
    }

    group(None).foreach { case (sym, n) =>
      counts.update(sym, counts.getOrElse(sym, 0.0) + n)
    }
    if (counts.isEmpty) fail("no elements")
    counts.toSeq
  }

  private def formatAmount(n: Double): String =
    if (math.abs(n - 1.0) < 1e-8) ""
    else if (n == math.rint(n)) n.toLong.toString
    else BigDecimal(n).underlying.stripTrailingZeros.toPlainString

  /** Hill-order a formula: TiO2→O2Ti, NaCl→ClNa, CH4N2O→CH4N2O (C/H first
    * when carbon present), Ca(OH)2→CaH2O2. Amounts are NOT reduced. */
  def hillFormula(formula: String): String = {
    val counts = parseFormula(formula).toMap
    val symbols = counts.keys.toSeq
    val ordered =
      if (symbols.contains("C"))
        Seq("C") ++ (if (symbols.contains("H")) Seq("H") else Nil) ++
          symbols.filterNot(e => e == "C" || e == "H").sorted
      else symbols.sorted
    ordered.map(e => e + formatAmount(counts(e))).mkString
  }

  /** Lenient variant for Column use: null/garbage in → null out. */
  def hillFormulaOrNull(formula: String): String =
    if (formula == null) null
    else try hillFormula(formula)
    catch { case _: IllegalArgumentException => null }

  /** `chemical_formula_reduced="O2Ti"` clause builder
    * (reference utils.py:157-161). */
  def hillFormulaFilter(formula: String): String =
    "chemical_formula_reduced=\"" + hillFormula(formula) + "\""

  private val CfrEq =
    """(?i)\bchemical_formula_reduced\b\s*=\s*(['"])(.+?)\1""".r

  /** Rewrite every chemical_formula_reduced literal in a filter string to
    * Hill form (0..n occurrences) — reference utils.py:164-175. */
  def normalizeCfrInFilter(filterStr: String): String =
    if (filterStr == null || filterStr.isEmpty) filterStr
    else CfrEq.replaceAllIn(filterStr, m =>
      scala.util.matching.Regex.quoteReplacement(hillFormulaFilter(m.group(2))))
}
