package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class DomainFunctionsSpec extends AnyFunSuite {

  test("formation energy per atom (openlam utils.py:107-115)") {
    // e_form = (E - Σ ref[site]) / natoms over per-site symbols
    val sites = Seq("Fe", "Fe", "O", "O", "O")
    val ref = -8.47 * 2 + -4.9467 * 3
    val got = DomainFunctions.eFormPerAtom(sites, -40.0).get
    assert(math.abs(got - (-40.0 - ref) / 5) < 1e-12)
    assert(DomainFunctions.eFormPerAtom(Seq("Xx"), -1.0).isEmpty)
    assert(DomainFunctions.eFormPerAtom(Nil, -1.0).isEmpty)
  }

  test("photon pricing sweeps (reference quota_test.py:55-90)") {
    // optimade family: 0.088 + n*0.0088
    assert(DomainFunctions.photonCost("fetch_structures_with_filter", 1) ==
      Right((0.088 + 0.0088, 10L)))
    val Right((c10, p10)) = DomainFunctions.photonCost("fetch_structures_with_spg", 10)
    assert(math.abs(c10 - 0.176) < 1e-12 && p10 == 18L)
    val Right((cb, pb)) = DomainFunctions.photonCost("fetch_bohrium_crystals", 10)
    assert(math.abs(cb - 0.136) < 1e-12 && pb == 14L)
    val Right((co, po)) = DomainFunctions.photonCost("fetch_openlam_structures", 100)
    assert(math.abs(co - 0.638) < 1e-12 && po == 64L)
    assert(DomainFunctions.photonCost("nope", 1).isLeft)
  }

  test("filterToTag (Optimade_Server/utils.py:488-518)") {
    assert(DomainFunctions.filterToTag("""elements HAS ALL "Si","O"""") ==
      "elements_HAS_ALL_Si-O")
    assert(DomainFunctions.filterToTag("""chemical_formula_reduced="O2Si"""") ==
      "chemical_formula_reducedO2Si")
    assert(DomainFunctions.filterToTag("a" * 50).length == 30)
    assert(DomainFunctions.filterToTag("???") == "filter")
  }

  test("shortenId (utils.py:208-226)") {
    assert(DomainFunctions.shortenId("abcdefghijklmnop") == "abcdef...nop")
    assert(DomainFunctions.shortenId("short") == "short")
    assert(DomainFunctions.shortenId("") == "")
  }

  test("providerNameFromUrl") {
    assert(DomainFunctions.providerNameFromUrl("https://optimade.materialsproject.org") ==
      "optimade_materialsproject_org")
    assert(DomainFunctions.providerNameFromUrl("https://example.com/v1/optimade") ==
      "example_com_v1_optimade")
  }

  test("unit validation (mofdb_client/main.py:8-31)") {
    assert(DomainFunctions.validatePressureUnit("bar").isRight)
    assert(DomainFunctions.validatePressureUnit("parsec").isLeft)
    assert(DomainFunctions.validateLoadingUnit("mmol/g").isRight)
    assert(DomainFunctions.validateLoadingUnit("stone/acre").isLeft)
  }
}
