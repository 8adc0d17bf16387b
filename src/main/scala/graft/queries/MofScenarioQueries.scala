package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.MofFixtures
import graft.sql.SqlGuard

/** The reference's six complex-SQL scenarios
  * (mofdbsql_database/mofdb_test/test.py:98-352) replayed through the full
  * §3.1 surface — fixture star schema → temp views → read-only guard →
  * LIMIT injection → Spark SQL. Fully oracle-gated: the star tables are
  * materialized to stable parquet ([[MofFixtures.StarDir]]) and [[duckOracle]]
  * re-dialects each scenario so DuckDB replays it over the same files;
  * planted-result assertions additionally live in MofScenarioSpec.
  *
  * Cross-engine float rule (CLAUDE.md): q49 and q51 aggregate adsorption
  * as DECIMAL(18,6) and cast to double only after the exact SUM — plain
  * AVG(double) differs in the last bit between engines (accumulation
  * order), which was round 2's one red oracle row. q51 additionally
  * formats the rounded average through DECIMAL(18,2) before string
  * concatenation so both engines render identical fixed-2dp text.
  *
  * Dialect deltas from the SQLite originals (SURVEY §7 hard parts, all
  * deliberate):
  *  - GROUP_CONCAT → array_join(sort_array(collect_list(...)), ',') —
  *    SQLite's concat order is unspecified; the sorted form makes the
  *    scenario-3 composition equality join deterministic;
  *  - `database` backtick-quoted (function name in Spark SQL);
  *  - integer division like (a+b)/2 keeps Spark's double semantics
  *    (SQLite truncates; documented, not replicated).
  */
object MofScenarioQueries {

  val scenarioSql: Map[String, String] = Map(
    "q46_mof_selectivity" ->
      """WITH co2_adsorption AS (
        |  SELECT m.id, m.name, m.`database`, AVG(isd.adsorption) AS co2_avg
        |  FROM mofs m
        |  JOIN isotherms i ON m.id = i.mof_id
        |  JOIN isotherm_data pd ON i.id = pd.isotherm_id
        |  JOIN isotherm_species_data isd ON pd.id = isd.isotherm_data_id
        |  JOIN adsorbates a ON isd.adsorbate_id = a.id
        |  WHERE a.name = 'CarbonDioxide'
        |  GROUP BY m.id, m.name, m.`database`),
        |h2_adsorption AS (
        |  SELECT m.id, AVG(isd.adsorption) AS h2_avg
        |  FROM mofs m
        |  JOIN isotherms i ON m.id = i.mof_id
        |  JOIN isotherm_data pd ON i.id = pd.isotherm_id
        |  JOIN isotherm_species_data isd ON pd.id = isd.isotherm_data_id
        |  JOIN adsorbates a ON isd.adsorbate_id = a.id
        |  WHERE a.name = 'Hydrogen'
        |  GROUP BY m.id)
        |SELECT c.name, c.`database`, c.co2_avg, h.h2_avg,
        |  (c.co2_avg / h.h2_avg) AS selectivity_ratio
        |FROM co2_adsorption c
        |JOIN h2_adsorption h ON c.id = h.id
        |WHERE h.h2_avg > 0
        |ORDER BY selectivity_ratio DESC, c.name""".stripMargin,

    "q47_mof_top_percentile" ->
      """WITH ranked_mofs AS (
        |  SELECT name, `database`, surface_area_m2g, void_fraction, n_atom,
        |    ROW_NUMBER() OVER (PARTITION BY `database`
        |      ORDER BY surface_area_m2g DESC, name) AS sa_rank,
        |    COUNT(*) OVER (PARTITION BY `database`) AS total_count,
        |    (surface_area_m2g * void_fraction / n_atom) AS efficiency_score
        |  FROM mofs
        |  WHERE surface_area_m2g IS NOT NULL AND void_fraction IS NOT NULL
        |    AND n_atom > 0)
        |SELECT name, `database`, surface_area_m2g, void_fraction,
        |  efficiency_score, sa_rank, total_count,
        |  (CAST(sa_rank AS DOUBLE) * 100.0 / total_count) AS percentile
        |FROM ranked_mofs
        |WHERE sa_rank <= total_count * 0.05 AND void_fraction > 0.5
        |ORDER BY efficiency_score DESC, name""".stripMargin,

    "q48_mof_twins" ->
      """WITH element_compositions AS (
        |  SELECT m.id, m.name, m.`database`, m.n_atom, m.surface_area_m2g,
        |    array_join(sort_array(collect_list(e.element_symbol || ':' || e.n_atom)), ',')
        |      AS composition
        |  FROM mofs m
        |  JOIN elements e ON m.id = e.mof_id
        |  GROUP BY m.id, m.name, m.`database`, m.n_atom, m.surface_area_m2g)
        |SELECT m1.name AS mof1_name, m1.`database` AS mof1_db,
        |  m1.n_atom AS mof1_atoms, m1.surface_area_m2g AS mof1_sa,
        |  m2.name AS mof2_name, m2.`database` AS mof2_db,
        |  m2.n_atom AS mof2_atoms, m2.surface_area_m2g AS mof2_sa,
        |  ABS(m1.n_atom - m2.n_atom) * 100.0 / ((m1.n_atom + m2.n_atom) / 2)
        |    AS atom_diff_percent,
        |  ABS(m1.surface_area_m2g - m2.surface_area_m2g) * 100.0
        |    / ((m1.surface_area_m2g + m2.surface_area_m2g) / 2) AS sa_diff_percent
        |FROM element_compositions m1
        |JOIN element_compositions m2 ON m1.id < m2.id
        |WHERE m1.composition = m2.composition
        |  AND ABS(m1.n_atom - m2.n_atom) * 100.0 / ((m1.n_atom + m2.n_atom) / 2) < 10
        |  AND ABS(m1.surface_area_m2g - m2.surface_area_m2g) * 100.0
        |      / ((m1.surface_area_m2g + m2.surface_area_m2g) / 2) > 50
        |ORDER BY sa_diff_percent DESC, mof1_name, mof2_name""".stripMargin,

    "q49_mof_temp_sensitivity" ->
      """WITH temperature_data AS (
        |  SELECT m.id, m.name, m.`database`, i.temperature,
        |    CAST(SUM(CAST(isd.adsorption AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
        |      AS avg_adsorption
        |  FROM mofs m
        |  JOIN isotherms i ON m.id = i.mof_id
        |  JOIN isotherm_data pd ON i.id = pd.isotherm_id
        |  JOIN isotherm_species_data isd ON pd.id = isd.isotherm_data_id
        |  JOIN adsorbates a ON isd.adsorbate_id = a.id
        |  WHERE i.temperature IS NOT NULL
        |  GROUP BY m.id, m.name, m.`database`, i.temperature),
        |temp_stats AS (
        |  SELECT id, name, `database`, COUNT(*) AS temp_count,
        |    MIN(temperature) AS min_temp, MAX(temperature) AS max_temp,
        |    MIN(avg_adsorption) AS min_adsorption,
        |    MAX(avg_adsorption) AS max_adsorption
        |  FROM temperature_data
        |  GROUP BY id, name, `database`
        |  HAVING COUNT(*) >= 2)
        |SELECT name, `database`, temp_count, min_temp, max_temp,
        |  min_adsorption, max_adsorption,
        |  (max_adsorption - min_adsorption) / (max_temp - min_temp) AS temp_coefficient,
        |  (max_adsorption - min_adsorption) / min_adsorption * 100 AS sensitivity_percent
        |FROM temp_stats
        |WHERE max_temp > min_temp AND min_adsorption > 0
        |ORDER BY sensitivity_percent DESC, name""".stripMargin,

    "q50_mof_heat_outliers" ->
      """WITH heat_analysis AS (
        |  SELECT m.id, m.name, m.`database`, m.surface_area_m2g,
        |    AVG(hd.total_adsorption) AS avg_heat_adsorption,
        |    COUNT(hd.id) AS heat_data_points
        |  FROM mofs m
        |  JOIN heats h ON m.id = h.mof_id
        |  JOIN heat_data hd ON h.id = hd.heat_id
        |  WHERE m.surface_area_m2g IS NOT NULL
        |  GROUP BY m.id, m.name, m.`database`, m.surface_area_m2g
        |  HAVING COUNT(hd.id) >= 5),
        |correlation_stats AS (
        |  SELECT AVG(surface_area_m2g) AS avg_sa,
        |    AVG(avg_heat_adsorption) AS avg_heat,
        |    MIN(surface_area_m2g) AS min_sa, MAX(surface_area_m2g) AS max_sa,
        |    MIN(avg_heat_adsorption) AS min_heat, MAX(avg_heat_adsorption) AS max_heat
        |  FROM heat_analysis)
        |SELECT h.name, h.`database`, h.surface_area_m2g, h.avg_heat_adsorption,
        |  h.heat_data_points,
        |  ABS(h.surface_area_m2g - c.avg_sa) / (c.max_sa - c.min_sa) AS sa_normalized_diff,
        |  ABS(h.avg_heat_adsorption - c.avg_heat) / (c.max_heat - c.min_heat)
        |    AS heat_normalized_diff
        |FROM heat_analysis h
        |CROSS JOIN correlation_stats c
        |WHERE ABS(h.surface_area_m2g - c.avg_sa) / (c.max_sa - c.min_sa) > 0.5
        |   OR ABS(h.avg_heat_adsorption - c.avg_heat) / (c.max_heat - c.min_heat) > 0.5
        |ORDER BY (ABS(h.surface_area_m2g - c.avg_sa) / (c.max_sa - c.min_sa)
        |        + ABS(h.avg_heat_adsorption - c.avg_heat) / (c.max_heat - c.min_heat))
        |  DESC, name""".stripMargin,

    "q51_mof_selectivity_matrix" ->
      """WITH adsorbate_performance AS (
        |  SELECT m.id, m.name, m.`database`, a.name AS adsorbate_name,
        |    CAST(SUM(CAST(isd.adsorption AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
        |      AS avg_adsorption, COUNT(*) AS data_points
        |  FROM mofs m
        |  JOIN isotherms i ON m.id = i.mof_id
        |  JOIN isotherm_data pd ON i.id = pd.isotherm_id
        |  JOIN isotherm_species_data isd ON pd.id = isd.isotherm_data_id
        |  JOIN adsorbates a ON isd.adsorbate_id = a.id
        |  WHERE i.temperature = 298
        |  GROUP BY m.id, m.name, m.`database`, a.name
        |  HAVING COUNT(*) >= 3),
        |multi_adsorbate_mofs AS (
        |  SELECT id, name, `database`, COUNT(*) AS adsorbate_count
        |  FROM adsorbate_performance
        |  GROUP BY id, name, `database`
        |  HAVING COUNT(*) >= 2),
        |selectivity_matrix AS (
        |  SELECT m.id, m.name, m.`database`, m.adsorbate_count,
        |    array_join(sort_array(collect_list(
        |      a.adsorbate_name || ':' ||
        |        CAST(CAST(ROUND(a.avg_adsorption, 2) AS DECIMAL(18,2)) AS STRING))), ',')
        |      AS adsorption_profile,
        |    MAX(a.avg_adsorption) AS max_adsorption,
        |    MIN(a.avg_adsorption) AS min_adsorption,
        |    (MAX(a.avg_adsorption) - MIN(a.avg_adsorption)) AS adsorption_range,
        |    (MAX(a.avg_adsorption) / MIN(a.avg_adsorption)) AS selectivity_ratio
        |  FROM multi_adsorbate_mofs m
        |  JOIN adsorbate_performance a ON m.id = a.id
        |  GROUP BY m.id, m.name, m.`database`, m.adsorbate_count)
        |SELECT name, `database`, adsorbate_count, adsorption_profile,
        |  max_adsorption, min_adsorption, adsorption_range, selectivity_ratio
        |FROM selectivity_matrix
        |WHERE min_adsorption > 0
        |ORDER BY selectivity_ratio DESC, name""".stripMargin)

  def run(spark: SparkSession, name: String, nResults: Int = 10): DataFrame = {
    MofFixtures.registerStar(spark)
    SqlGuard.fetchSql(spark, scenarioSql(name), nResults)
  }

  /** DuckDB oracle for a scenario: the same SQL text over the very same
    * star parquet (MofFixtures.StarDir), re-dialected:
    *  - table names become read_parquet CTE views;
    *  - backtick quoting → double quotes;
    *  - array_join(sort_array(collect_list(X)), ',') → string_agg(X, ','
    *    ORDER BY X) (same binary string collation both engines);
    *  - float literals in double arithmetic are CAST(... AS DOUBLE) so
    *    DuckDB doesn't evaluate them as exact DECIMAL (CLAUDE.md rule);
    *  - LIMIT 10 appended, mirroring SqlGuard's injection on the Spark
    *    side (every scenario ends in a total ORDER BY, so the cut is
    *    deterministic).
    */
  private val duckViews: String = {
    val tables = Seq("mofs", "elements", "adsorbates", "isotherms",
      "isotherm_data", "isotherm_species_data", "heats", "heat_data")
    tables.map(t =>
      s"$t AS (SELECT * FROM read_parquet('${MofFixtures.StarDir}/$t/*.parquet'))")
      .mkString("WITH ", ",\n", ",\n")
  }

  private val GroupConcatRe =
    """(?s)array_join\(sort_array\(collect_list\((.+?)\)\), ','\)""".r

  private def duckOracle(sparkSql: String): String = {
    require(sparkSql.startsWith("WITH "),
      "duckOracle splices the view CTEs onto a WITH-shaped scenario; " +
        "wrap a plain SELECT scenario in WITH q AS (...) SELECT * FROM q")
    val body = GroupConcatRe.replaceAllIn(
        sparkSql.replace("`", "\""),
        m => java.util.regex.Matcher.quoteReplacement(
          s"string_agg(${m.group(1)}, ',' ORDER BY ${m.group(1)})"))
      .replace(" 100.0", " CAST(100.0 AS DOUBLE)")
      .replace(" 0.05", " CAST(0.05 AS DOUBLE)")
    duckViews + body.stripPrefix("WITH ") + "\nLIMIT 10"
  }

  val defs: Seq[QueryDef] =
    scenarioSql.keys.toSeq.sorted.map { name =>
      QueryDef.sql(name, duckOracle(scenarioSql(name)))((s, _) => run(s, name))
    }
}
