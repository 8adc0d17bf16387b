package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MOF data model in both reference representations (SURVEY §1.1c):
  * the 4-level nested object graph the API client streams
  * (mofdb_database/mofdb_client/mof.py:8-36, isotherm.py:9-27,
  * temperature_point.py:19-27) and the 10-table normalized star schema of
  * the SQL server (mofdbsql_database/Mofdb_Agent/agent.py:60-71).
  *
  * [[shred]] converts nested → star via posexplode (the only
  * generator/UDTF need in the reference, SURVEY §2.8) with deterministic
  * surrogate keys derived from (parent id × stride + position) — ingestion
  * is reproducible and parallel (no driver sequence, no
  * monotonically_increasing_id nondeterminism across reruns).
  */
object MofSchema {

  /** Nested document row types (the S4 ingestion format). */
  final case class GasAtTemp(adsorbate_name: String, adsorption: Double,
                             composition: Double)
  final case class TempPoint(pressure: Double, total_adsorption: Double,
                             species_data: Seq[GasAtTemp])
  final case class IsoDoc(doi: String, temperature: Option[Double],
                          pressure_units: String, adsorption_units: String,
                          isotherm_data: Seq[TempPoint])
  final case class ElemCount(element_symbol: String, n_atom: Long)
  final case class MofDoc(
      id: Long, name: String, database: String, n_atom: Long,
      lcd: Option[Double], pld: Option[Double],
      void_fraction: Option[Double],
      surface_area_m2g: Option[Double], surface_area_m2cm3: Option[Double],
      cif_path: Option[String], mofid: Option[String], mofkey: Option[String],
      elements: Seq[ElemCount],
      isotherms: Seq[IsoDoc], heats: Seq[IsoDoc])

  /** Star tables produced by [[shred]]. */
  val TableNames: Seq[String] = Seq(
    "mofs", "elements", "adsorbates", "isotherms", "isotherm_data",
    "isotherm_species_data", "mof_adsorbates", "heats", "heat_data",
    "heat_species_data")

  private val Stride = 10000L

  /** Shred one family (isotherms or heats) into its 3 star tables. */
  private def shredCurves(nested: DataFrame, family: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val curves = nested
      .select(col("id").as("mof_id"), posexplode(col(family)).as(Seq("pos", "c")))
      .withColumn("curve_id", col("mof_id") * Stride + col("pos"))
    val curveTable = curves.select(
      col("curve_id").as("id"), col("mof_id"),
      col("c.doi").as("doi"), col("c.temperature").as("temperature"),
      col("c.pressure_units").as("pressure_units"),
      col("c.adsorption_units").as("adsorption_units"))
    val points = curves
      .select(col("curve_id"), posexplode(col("c.isotherm_data")).as(Seq("ppos", "p")))
      .withColumn("point_id", col("curve_id") * Stride + col("ppos"))
    val pointTable = points.select(
      col("point_id").as("id"), col("curve_id").as(s"${family.dropRight(1)}_id"),
      col("p.pressure").as("pressure"),
      col("p.total_adsorption").as("total_adsorption"))
    val species = points
      .select(col("point_id"), posexplode(col("p.species_data")).as(Seq("spos", "s")))
      .withColumn("species_id", col("point_id") * 100 + col("spos"))
      .select(col("species_id").as("id"),
        col("point_id").as(s"${family.dropRight(1)}_data_id"),
        col("s.adsorbate_name").as("adsorbate_name"),
        col("s.adsorption").as("adsorption"),
        col("s.composition").as("composition"))
    (curveTable, pointTable, species)
  }

  /** Nested MOF documents → the 10-table star schema. The adsorbates
    * dimension is extracted from the species rows (dense ids by name
    * order) and species rows are rekeyed to it — the classic
    * dim-extraction ingestion step. */
  def shred(nested: DataFrame): Map[String, DataFrame] = {
    val spark = nested.sparkSession

    val mofs = nested.select(
      col("id"), col("name"), col("database"), col("n_atom"),
      col("lcd"), col("pld"), col("void_fraction"),
      col("surface_area_m2g"), col("surface_area_m2cm3"),
      col("cif_path"), col("mofid"), col("mofkey"))

    val elements = nested
      .select(col("id").as("mof_id"), posexplode(col("elements")).as(Seq("pos", "e")))
      .select((col("mof_id") * Stride + col("pos")).as("id"), col("mof_id"),
        col("e.element_symbol").as("element_symbol"), col("e.n_atom").as("n_atom"))

    val (isotherms, isothermData, isoSpeciesRaw) = shredCurves(nested, "isotherms")
    val (heats, heatData, heatSpeciesRaw) = shredCurves(nested, "heats")

    // adsorbates dim: dense ids in name order (deterministic).
    // DELIBERATE global window, bounded by the domain: the input is the
    // DISTINCT adsorbate-species vocabulary (gas names — dozens of rows at
    // ANY corpus scale; reference mofdb carries ~10 species), aggregated
    // BEFORE the window, so the single partition holds the dim, never the
    // fact rows. Ingestion-only; audited by PlanAuditSpec ("MofSchema.shred
    // ingestion plans"). Fact-scale orderings elsewhere use partitioned
    // windows or the PrefixSum block decomposition.
    import org.apache.spark.sql.expressions.Window
    val adsorbates = isoSpeciesRaw.select("adsorbate_name")
      .union(heatSpeciesRaw.select("adsorbate_name"))
      .distinct()
      .withColumn("id", row_number().over(Window.orderBy("adsorbate_name")).cast("long"))
      .select(col("id"), col("adsorbate_name").as("name"))

    def rekey(raw: DataFrame, fk: String): DataFrame =
      raw.join(broadcast(adsorbates), raw("adsorbate_name") === adsorbates("name"))
        .select(raw("id"), raw(fk), adsorbates("id").as("adsorbate_id"),
          raw("adsorption"), raw("composition"))

    val isoSpecies = rekey(isoSpeciesRaw, "isotherm_data_id")
    val heatSpecies = rekey(heatSpeciesRaw, "heat_data_id")

    val mofAdsorbates = isoSpecies
      .join(isothermData.select(col("id").as("isotherm_data_id"),
        col("isotherm_id")), Seq("isotherm_data_id"))
      .join(isotherms.select(col("id").as("isotherm_id"), col("mof_id")), Seq("isotherm_id"))
      .select("mof_id", "adsorbate_id").distinct()

    Map(
      "mofs" -> mofs, "elements" -> elements, "adsorbates" -> adsorbates,
      "isotherms" -> isotherms, "isotherm_data" -> isothermData,
      "isotherm_species_data" -> isoSpecies, "mof_adsorbates" -> mofAdsorbates,
      "heats" -> heats, "heat_data" -> heatData,
      "heat_species_data" -> heatSpecies)
  }

  /** Register the star tables as temp views (the S1 SQL surface). */
  def registerStar(spark: SparkSession, nested: DataFrame): Unit =
    shred(nested).foreach { case (name, df) => df.createOrReplaceTempView(name) }
}
