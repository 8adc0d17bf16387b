package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class FormulasSpec extends AnyFunSuite {

  test("normalize_formula: sub/superscript and full-width digits") {
    assert(Formulas.normalizeFormula("SrTiO₃") == "SrTiO3")
    assert(Formulas.normalizeFormula("H₂O") == "H2O")
    assert(Formulas.normalizeFormula("Fe₂O₃") == "Fe2O3")
    assert(Formulas.normalizeFormula("H²O") == "H2O")
    assert(Formulas.normalizeFormula("Ｆｅ２Ｏ３") == "Ｆｅ2Ｏ3") // only digits translated
    assert(Formulas.normalizeFormula("NaCl") == "NaCl")
    assert(Formulas.normalizeFormula("") == "")
  }

  test("parseFormula: basic, multi-digit, fractional, groups") {
    assert(Formulas.parseFormula("H2O") == Seq("H" -> 2.0, "O" -> 1.0))
    assert(Formulas.parseFormula("C60") == Seq("C" -> 60.0))
    assert(Formulas.parseFormula("Li0.5CoO2") ==
      Seq("Li" -> 0.5, "Co" -> 1.0, "O" -> 2.0))
    assert(Formulas.parseFormula("Ca(OH)2") ==
      Seq("Ca" -> 1.0, "O" -> 2.0, "H" -> 2.0))
    assert(Formulas.parseFormula("Mg3(Si2O5)2(OH)2") ==
      Seq("Mg" -> 3.0, "Si" -> 4.0, "O" -> 12.0, "H" -> 2.0))
    assert(Formulas.parseFormula("K4[Fe(CN)6]") ==
      Seq("K" -> 4.0, "Fe" -> 1.0, "C" -> 6.0, "N" -> 6.0))
    // duplicate element mentions are summed
    assert(Formulas.parseFormula("CH3COOH") ==
      Seq("C" -> 2.0, "H" -> 4.0, "O" -> 2.0))
  }

  test("parseFormula: malformed input throws") {
    assertThrows[IllegalArgumentException](Formulas.parseFormula(""))
    assertThrows[IllegalArgumentException](Formulas.parseFormula("2H"))
    assertThrows[IllegalArgumentException](Formulas.parseFormula("h2o"))
    assertThrows[IllegalArgumentException](Formulas.parseFormula("Ca(OH"))
    assertThrows[IllegalArgumentException](Formulas.parseFormula("Na+Cl"))
  }

  test("hillFormula: reference corpus examples") {
    // optimade_test/hill_formula.py, Optimade_Server/utils.py demo block
    assert(Formulas.hillFormula("TiO2") == "O2Ti")
    assert(Formulas.hillFormula("SiO2") == "O2Si")
    assert(Formulas.hillFormula("Al2O3") == "Al2O3")
    assert(Formulas.hillFormula("MgO") == "MgO")
    assert(Formulas.hillFormula("NaCl") == "ClNa")
    assert(Formulas.hillFormula("ZrO") == "OZr") // Optimade_Agent/agent.py:146-147
  }

  test("hillFormula: carbon rule — C first, then H, rest alphabetical") {
    assert(Formulas.hillFormula("CH4N2O") == "CH4N2O")
    assert(Formulas.hillFormula("CH4") == "CH4")
    assert(Formulas.hillFormula("C2H5OH") == "C2H6O")
    assert(Formulas.hillFormula("HCN") == "CHN")
    // no carbon → H sorts alphabetically with the rest
    assert(Formulas.hillFormula("H2O") == "H2O")
    assert(Formulas.hillFormula("NH3") == "H3N")
    assert(Formulas.hillFormula("Ca(OH)2") == "CaH2O2")
  }

  test("hillFormula: amounts preserved (no reduction), unicode input") {
    assert(Formulas.hillFormula("Zr2O2") == "O2Zr2") // hill does NOT reduce
    assert(Formulas.hillFormula("SrTiO₃") == "O3SrTi")
    assert(Formulas.hillFormula("Fe₂O₃") == "Fe2O3")
    assert(Formulas.hillFormula("Li0.5CoO2") == "CoLi0.5O2")
  }

  test("hydrate dot notation: parts summed with multipliers") {
    assert(Formulas.parseFormula("CuSO4·5H2O") ==
      Seq("Cu" -> 1.0, "S" -> 1.0, "O" -> 9.0, "H" -> 10.0))
    assert(Formulas.hillFormula("CuSO4·5H2O") == "CuH10O9S") // no C → alphabetical
    assert(Formulas.parseFormula("CaCl2⋅2H2O") ==
      Seq("Ca" -> 1.0, "Cl" -> 2.0, "H" -> 4.0, "O" -> 2.0))
    assertThrows[IllegalArgumentException](Formulas.parseFormula("·"))
  }

  test("hillFormulaOrNull lenient") {
    assert(Formulas.hillFormulaOrNull(null) == null)
    assert(Formulas.hillFormulaOrNull("!!") == null)
    assert(Formulas.hillFormulaOrNull("TiO2") == "O2Ti")
  }

  test("normalizeCfrInFilter: 0, 1, many occurrences (utils.py:662-682)") {
    val f0 = """elements HAS ANY "Si","O""""
    assert(Formulas.normalizeCfrInFilter(f0) == f0)
    assert(Formulas.normalizeCfrInFilter("""chemical_formula_reduced="SiO2"""") ==
      """chemical_formula_reduced="O2Si"""")
    assert(Formulas.normalizeCfrInFilter(
      """(chemical_formula_reduced="SiO2" OR chemical_formula_reduced="Al2O3")""") ==
      """(chemical_formula_reduced="O2Si" OR chemical_formula_reduced="Al2O3")""")
    assert(Formulas.normalizeCfrInFilter(
      """(chemical_formula_reduced="SiO2" OR chemical_formula_reduced="Al2O3") AND (chemical_formula_reduced="MgO" OR chemical_formula_reduced="NaCl")""") ==
      """(chemical_formula_reduced="O2Si" OR chemical_formula_reduced="Al2O3") AND (chemical_formula_reduced="MgO" OR chemical_formula_reduced="ClNa")""")
    // single quotes + case-insensitive property name
    assert(Formulas.normalizeCfrInFilter("CHEMICAL_FORMULA_REDUCED='TiO2'") ==
      """chemical_formula_reduced="O2Ti"""")
    assert(Formulas.normalizeCfrInFilter("") == "")
    assert(Formulas.normalizeCfrInFilter(null) == null)
  }
}
