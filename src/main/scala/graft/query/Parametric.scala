package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed parametric query layer — the generic form of the reference's three
  * parametric tool surfaces (SURVEY §3.3):
  *  - fetch_mofs          (mofdb_database/Mofdb_Server/server.py:58-76)
  *  - fetch_bohrium_crystals (bohriumpublic_database/Bohriumpublic_Server/server.py:61-72)
  *  - fetch_openlam_structures (openlam_database/Openlam_Server/server.py:60-69)
  *
  * Each tool is a conjunction of optional predicates (numeric ranges,
  * equality, fuzzy/exact keyword, time window) plus an optional sort and a
  * limit. One ADT covers all three vocabularies; the predicates become
  * Column expressions that Catalyst pushes to the scan.
  */
object Parametric {

  sealed trait Pred { def toColumn: Column }

  /** P2: inclusive numeric range with open ends. */
  final case class NumRange(column: String, min: Option[Double], max: Option[Double]) extends Pred {
    def toColumn: Column =
      and(min.map(col(column) >= _), max.map(col(column) <= _))
  }

  /** P10: ISO-8601 time window (bounds parsed in session TZ / UTC). */
  final case class TimeRange(column: String, min: Option[String], max: Option[String]) extends Pred {
    def toColumn: Column =
      and(min.map(v => col(column) >= to_timestamp(lit(v))),
          max.map(v => col(column) <= to_timestamp(lit(v))))
  }

  /** P4: exact equality. */
  final case class Equals(column: String, value: Any) extends Pred {
    def toColumn: Column = col(column) === lit(value)
  }

  /** P5: keyword match — match_mode 0 = fuzzy (substring), 1 = exact
    * (Bohriumpublic_Server/server.py:65,89,158). */
  final case class Keyword(column: String, value: String, fuzzy: Boolean) extends Pred {
    def toColumn: Column =
      if (fuzzy) col(column).contains(value) else col(column) === lit(value)
  }

  /** P9: null guard. */
  final case class NotNull(column: String) extends Pred {
    def toColumn: Column = col(column).isNotNull
  }

  /** S5: keyset cursor — strictly after `key`, the reference's `startId`
    * page predicate (openlam db.py:44-58 `params["startId"] = offset`). */
  final case class After(column: String, key: Long) extends Pred {
    def toColumn: Column = col(column) > key
  }

  private def and(parts: Option[Column]*): Column =
    parts.flatten.reduceOption(_ && _).getOrElse(lit(true))

  /** P3: Bohrium range auto-completion
    * (Bohriumpublic_Server/server.py:126-142): ranges arrive as string
    * pairs; `["x"]` → [x, defaultMax]; `["","y"]` → [defaultMin, y].
    * Unparseable numbers are treated as open ends. */
  def completeRange(range: Seq[String], defaultMin: Double = 0.0,
                    defaultMax: Double = 100.0): (Option[Double], Option[Double]) = {
    def num(s: String): Option[Double] =
      Option(s).map(_.trim).filter(_.nonEmpty).flatMap(t => t.toDoubleOption)
    range match {
      case Seq()     => (None, None)
      case Seq(a)    => (num(a).orElse(Some(defaultMin)), Some(defaultMax))
      case a +: b +: _ =>
        (num(a).orElse(Some(defaultMin)), num(b).orElse(Some(defaultMax)))
    }
  }

  final case class SortSpec(column: String, ascending: Boolean = true)

  /** A full parametric query: conjunctive predicates + sort + limit. */
  final case class Query(
      preds: Seq[Pred] = Nil,
      sort: Seq[SortSpec] = Nil,
      limit: Option[Int] = None) {

    def where: Column = and(preds.map(p => Some(p.toColumn)): _*)

    def run(df: DataFrame): DataFrame = {
      val filtered = if (preds.isEmpty) df else df.filter(where)
      val sorted =
        if (sort.isEmpty) filtered
        else filtered.orderBy(sort.map(s =>
          if (s.ascending) col(s.column).asc else col(s.column).desc): _*)
      limit.fold(sorted)(sorted.limit)
    }
  }

  /** fetch_openlam_structures-shaped query (Openlam_Server/server.py:60-69):
    * formula equality (normalized), energy range, submission-time window.
    * The reference serves results as keyset pages ordered by id
    * (openlam db.py:44-104: `startId` in, `nextStartId` out) — so one call
    * here IS one `query_by_offset` page: rows with id strictly after
    * `startId`, in id order, limited. Plans as TakeOrderedAndProject with
    * the cursor predicate pushed to the scan. */
  def openlamQuery(formula: Option[String] = None,
                   minEnergy: Option[Double] = None, maxEnergy: Option[Double] = None,
                   minSubmissionTime: Option[String] = None,
                   maxSubmissionTime: Option[String] = None,
                   startId: Option[Long] = None,
                   idCol: String = "id",
                   nResults: Int = 10): Query =
    Query(
      preds =
        formula.map(f => Equals("formula", graft.functions.Formulas.normalizeFormula(f))).toSeq ++
        startId.map(After(idCol, _)).toSeq ++
        Seq(NumRange("energy", minEnergy, maxEnergy),
            TimeRange("submission_time", minSubmissionTime, maxSubmissionTime)),
      sort = Seq(SortSpec(idCol)),
      limit = Some(nResults))

  /** fetch_bohrium_crystals-shaped query (Bohriumpublic_Server/server.py:61-72,
    * 113-145): formula/elements keyword with match_mode, space-group equality
    * via the unicode symbol, string ranges with auto-completion, implicit
    * formation-energy ascending sort. */
  def bohriumQuery(formula: Option[String] = None,
                   matchMode: Int = 1,
                   spacegroupNumber: Option[Int] = None,
                   atomCountRange: Seq[String] = Nil,
                   formationEnergyRange: Seq[String] = Nil,
                   bandGapRange: Seq[String] = Nil,
                   nResults: Int = 10): Query = {
    def rangePred(c: String, r: Seq[String], dMin: Double, dMax: Double): Option[Pred] =
      if (r.isEmpty) None
      else { val (mn, mx) = completeRange(r, dMin, dMax); Some(NumRange(c, mn, mx)) }
    Query(
      preds =
        formula.map(f => Keyword("formula",
          graft.functions.Formulas.normalizeFormula(f), fuzzy = matchMode == 0)).toSeq ++
        spacegroupNumber.flatMap(n =>
          graft.functions.SpaceGroups.unicodeSymbol.get(n).map(Equals("space_symbol", _))).toSeq ++
        rangePred("atom_count", atomCountRange, 0, 1000).toSeq ++
        rangePred("predicted_formation_energy", formationEnergyRange, -100, 100).toSeq ++
        rangePred("band_gap", bandGapRange, 0, 100).toSeq,
      sort = Seq(SortSpec("predicted_formation_energy", ascending = true)),
      limit = Some(nResults))
  }

  /** fetch_mofs-shaped query (Mofdb_Server/server.py:58-76): id/key/name/
    * database equality + the six property ranges. */
  def mofQuery(mofid: Option[String] = None, mofkey: Option[String] = None,
               name: Option[String] = None, database: Option[String] = None,
               vf: (Option[Double], Option[Double]) = (None, None),
               lcd: (Option[Double], Option[Double]) = (None, None),
               pld: (Option[Double], Option[Double]) = (None, None),
               saM2g: (Option[Double], Option[Double]) = (None, None),
               saM2cm3: (Option[Double], Option[Double]) = (None, None),
               nResults: Int = 10): Query =
    Query(
      preds =
        mofid.map(Equals("mofid", _)).toSeq ++
        mofkey.map(Equals("mofkey", _)).toSeq ++
        name.map(Equals("name", _)).toSeq ++
        database.map(Equals("database", _)).toSeq ++
        Seq(NumRange("void_fraction", vf._1, vf._2),
            NumRange("lcd", lcd._1, lcd._2),
            NumRange("pld", pld._1, pld._2),
            NumRange("surface_area_m2g", saM2g._1, saM2g._2),
            NumRange("surface_area_m2cm3", saM2cm3._1, saM2cm3._2)),
      limit = Some(nResults))
}
