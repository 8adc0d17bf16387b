package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class SpaceGroupsSpec extends AnyFunSuite {

  test("230 entries, both tables") {
    assert(SpaceGroups.shortHM.length == 230)
    assert(SpaceGroups.unicodeSymbol.size == 230)
  }

  test("known symbols") {
    val known = Map(
      1 -> "P1", 2 -> "P-1", 14 -> "P21/c", 19 -> "P212121", 62 -> "Pnma",
      81 -> "P-4", 90 -> "P4212", 113 -> "P-421m", 123 -> "P4/mmm",
      148 -> "R-3", 166 -> "R-3m", 186 -> "P63mc", 194 -> "P63/mmc",
      198 -> "P213", 205 -> "Pa-3", 216 -> "F-43m", 221 -> "Pm-3m",
      225 -> "Fm-3m", 227 -> "Fd-3m", 229 -> "Im-3m", 230 -> "Ia-3d")
    known.foreach { case (n, hm) =>
      assert(SpaceGroups.fromNumber(n).contains(hm), s"spg $n")
    }
  }

  test("unicode symbols: subscripts and overbars") {
    assert(SpaceGroups.unicodeSymbol(4) == "P2₁")
    assert(SpaceGroups.unicodeSymbol(14) == "P2₁/c")
    assert(SpaceGroups.unicodeSymbol(2) == "P1̅")
    assert(SpaceGroups.unicodeSymbol(90) == "P42₁2")  // screw on the 2, not the 4
    assert(SpaceGroups.unicodeSymbol(93) == "P4₂2₂")  // screw on the 4
    assert(SpaceGroups.unicodeSymbol(194) == "P6₃/mmc")
    assert(SpaceGroups.unicodeSymbol(225) == "Fm3̅m")
  }

  test("number lookup inverse") {
    assert(SpaceGroups.numberOfShortHM("Pm-3m") == 221)
    assert(SpaceGroups.numberOfShortHM("P1") == 1)
    assert(SpaceGroups.fromNumber(0).isEmpty)
    assert(SpaceGroups.fromNumber(231).isEmpty)
  }

  test("TCOD spacing (reference utils.py:530-548 examples)") {
    assert(SpaceGroups.toTcodFormat("Pm-3m") == "P m -3 m")
    assert(SpaceGroups.toTcodFormat("P4/mmm") == "P 4/m m m")
    assert(SpaceGroups.toTcodFormat("Fd-3m") == "F d -3 m")
    assert(SpaceGroups.toTcodFormat("P1") == "P 1")
    assert(SpaceGroups.toTcodFormat("P21/c") == "P 21/c") // digit pairs stay joined
    assert(SpaceGroups.toTcodFormat("Ia-3d") == "I a -3 d")
  }

  test("spg provider clause map (reference utils.py:550-573)") {
    val m = SpaceGroups.spgFilterMap(221,
      Seq("alexandria", "oqmd", "tcod", "odbx", "nope"))
    assert(m("alexandria") == "_alexandria_space_group=221")
    assert(m("oqmd") == "_oqmd_spacegroup=\"Pm-3m\"")
    assert(m("tcod") == "_tcod_sg=\"P m -3 m\"")
    assert(m("odbx") == "_gnome_space_group_it_number=221")
    assert(!m.contains("nope"))
  }

  test("bandgap provider clause map + range clause (utils.py:576-613)") {
    val m = SpaceGroups.bandgapFilterMap(Some(1.0), Some(3.0),
      Seq("alexandria", "oqmd", "unknown"))
    assert(m("alexandria") == "_alexandria_band_gap>=1.0 AND _alexandria_band_gap<=3.0")
    assert(m("oqmd") == "_oqmd_band_gap>=1.0 AND _oqmd_band_gap<=3.0")
    assert(!m.contains("unknown"))
    assert(SpaceGroups.rangeClause("x", Some(1.0), None) == "x>=1.0")
    assert(SpaceGroups.rangeClause("x", None, Some(2.0)) == "x<=2.0")
    assert(SpaceGroups.rangeClause("x", None, None) == "")
  }
}
