package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Domain scalar functions (SURVEY §2.7) run through Catalyst and pinned
  * against hand-verified golden values in the DuckDB oracle (literal VALUES
  * tables). This makes the function library part of the graded correctness
  * surface, not just unit-tested code.
  *
  * The queries ignore the sf dir on purpose — inputs are fixed golden
  * corpora (reference examples from optimade_test/hill_formula.py,
  * Optimade_Server/utils.py:662-682, Optimade_Agent/agent.py:146-147).
  */
object FunctionQueries {

  private val hillCases = Seq(
    // (input, expected hill) — expectations live in the oracle SQL below
    "TiO2", "SiO2", "Al2O3", "MgO", "NaCl", "ZrO", "Zr2O2", "CH4N2O",
    "C2H5OH", "HCN", "H2O", "NH3", "Ca(OH)2", "K4[Fe(CN)6]", "SrTiO₃",
    "Fe₂O₃", "Li0.5CoO2", "CH3COOH", "C60", "Mg3(Si2O5)2(OH)2")

  private val spgCases = Seq(1, 2, 4, 14, 19, 62, 81, 90, 93, 113, 123,
    148, 166, 186, 194, 198, 205, 216, 221, 225, 227, 229, 230)

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql("q21_fn_hill",
      """SELECT * FROM (VALUES
        |  ('TiO2','O2Ti'), ('SiO2','O2Si'), ('Al2O3','Al2O3'), ('MgO','MgO'),
        |  ('NaCl','ClNa'), ('ZrO','OZr'), ('Zr2O2','O2Zr2'), ('CH4N2O','CH4N2O'),
        |  ('C2H5OH','C2H6O'), ('HCN','CHN'), ('H2O','H2O'), ('NH3','H3N'),
        |  ('Ca(OH)2','CaH2O2'), ('K4[Fe(CN)6]','C6FeK4N6'),
        |  ('SrTiO₃','O3SrTi'), ('Fe₂O₃','Fe2O3'), ('Li0.5CoO2','CoLi0.5O2'),
        |  ('CH3COOH','C2H4O2'), ('C60','C60'), ('Mg3(Si2O5)2(OH)2','H2Mg3O12Si4')
        |) AS t(formula, hill) ORDER BY formula""".stripMargin) { (s, _) =>
      import s.implicits._
      hillCases.toDF("formula")
        .withColumn("hill", hill_formula(col("formula")))
        .orderBy("formula")
    },

    QueryDef.sql("q22_fn_spg",
      """SELECT * FROM (VALUES
        |  (1,'P1','P 1'), (2,'P-1','P -1'), (4,'P21','P 21'), (14,'P21/c','P 21/c'),
        |  (19,'P212121','P 212121'), (62,'Pnma','P n m a'), (81,'P-4','P -4'),
        |  (90,'P4212','P 4212'), (93,'P4222','P 4222'), (113,'P-421m','P -421 m'),
        |  (123,'P4/mmm','P 4/m m m'), (148,'R-3','R -3'), (166,'R-3m','R -3 m'),
        |  (186,'P63mc','P 63 m c'), (194,'P63/mmc','P 63/m m c'),
        |  (198,'P213','P 213'), (205,'Pa-3','P a -3'), (216,'F-43m','F -43 m'),
        |  (221,'Pm-3m','P m -3 m'), (225,'Fm-3m','F m -3 m'),
        |  (227,'Fd-3m','F d -3 m'), (229,'Im-3m','I m -3 m'), (230,'Ia-3d','I a -3 d')
        |) AS t(spg, hm, tcod) ORDER BY spg""".stripMargin) { (s, _) =>
      import s.implicits._
      spgCases.toDF("spg")
        .withColumn("hm", spg_short_hm(col("spg")))
        .withColumn("tcod", spg_tcod(spg_short_hm(col("spg"))))
        .orderBy("spg")
    },

    QueryDef.sql("q23_fn_eform",
      // identical IEEE arithmetic on both sides — the oracle mirrors the
      // engine's left-fold add order over sites; unknown element → NULL
      // CAST(0.0 AS DOUBLE) seeds the fold so every add is IEEE double
      // (bare literals are DECIMAL in DuckDB and would aggregate exactly)
      """SELECT * FROM (VALUES
        |  ('fe2o3', (CAST(-40.0 AS DOUBLE) - (((((CAST(0.0 AS DOUBLE) + -8.47) + -8.47) + -4.9467) + -4.9467) + -4.9467)) / 5),
        |  ('nacl',  (CAST(-7.5 AS DOUBLE)  - ((CAST(0.0 AS DOUBLE) + -1.3225) + -1.8485)) / 2),
        |  ('srtio3',(CAST(-38.2 AS DOUBLE) - (((((CAST(0.0 AS DOUBLE) + -1.6895) + -7.8955) + -4.9467) + -4.9467) + -4.9467)) / 5),
        |  ('unknown', CAST(NULL AS DOUBLE))
        |) AS t(name, e_form) ORDER BY name""".stripMargin) { (s, _) =>
      import s.implicits._
      Seq(
        ("fe2o3", Seq("Fe", "Fe", "O", "O", "O"), -40.0),
        ("nacl", Seq("Na", "Cl"), -7.5),
        ("srtio3", Seq("Sr", "Ti", "O", "O", "O"), -38.2),
        ("unknown", Seq("Xx", "O"), -5.0))
        .toDF("name", "species", "energy")
        .select(col("name"), e_form_per_atom(col("species"), col("energy")).as("e_form"))
        .orderBy("name")
    },

    QueryDef.sql("q24_fn_normalize",
      """SELECT * FROM (VALUES
        |  ('SrTiO₃','SrTiO3'), ('H₂O','H2O'), ('Fe₂O₃','Fe2O3'),
        |  ('H²O','H2O'), ('NaCl','NaCl'), ('Ｌｉ２Ｏ','Ｌｉ2Ｏ')
        |) AS t(raw, norm) ORDER BY raw""".stripMargin) { (s, _) =>
      import s.implicits._
      Seq("SrTiO₃", "H₂O", "Fe₂O₃", "H²O", "NaCl", "Ｌｉ２Ｏ").toDF("raw")
        .withColumn("norm", normalize_formula(col("raw")))
        .orderBy("raw")
    }
  )
}
