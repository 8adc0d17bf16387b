package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import MofSchema._

/** Deterministic MOF fixture corpus (FIXTURES.md §A1 content
  * requirements): every one of the six reference SQL scenarios
  * (mofdbsql_database/mofdb_test/test.py:98-352) returns non-empty,
  * verifiable results on it.
  */
object MofFixtures {

  val Databases: Seq[String] = Seq("CoREMOF 2014", "CoREMOF 2019", "CSD",
    "hMOF", "IZA", "PCOD-syn", "Tobacco")

  private def curve(doi: String, temp: Option[Double], gas: String,
                    points: Seq[(Double, Double)]): IsoDoc =
    IsoDoc(doi, temp, "bar", "mmol/g",
      points.map { case (p, ads) =>
        TempPoint(p, ads, Seq(GasAtTemp(gas, ads, 1.0)))
      })

  /** ~20 MOFs engineered so that:
    *  - m1..m6 have BOTH CarbonDioxide and Hydrogen isotherms at 298 K
    *    with ≥3 points (scenarios 1 and 6);
    *  - m1..m4 additionally have a second temperature 313 K (scenario 4);
    *  - m7/m8 share the identical element composition with n_atom within
    *    10% and surface areas differing >50% (scenario 3);
    *  - m9..m14 have heats with ≥5 points (scenario 5);
    *  - m15/m16 carry NULL void_fraction / surface_area (NULL guards);
    *  - surface areas spread so per-database top-5% ranks exist
    *    (scenario 2 — every database has ≥ 20 mofs via padding m20+).
    */
  def nestedDocs: Seq[MofDoc] = {
    def elems(pairs: (String, Long)*): Seq[ElemCount] =
      pairs.map { case (s, n) => ElemCount(s, n) }

    val featured: Seq[MofDoc] = (1 to 6).map { i =>
      val co2At298 = curve(s"doi-m$i-co2", Some(298.0), "CarbonDioxide",
        Seq((1.0, 2.0 + i), (5.0, 4.0 + i), (10.0, 6.0 + i)))
      val h2At298 = curve(s"doi-m$i-h2", Some(298.0), "Hydrogen",
        Seq((1.0, 0.5 + 0.1 * i), (5.0, 0.8 + 0.1 * i), (10.0, 1.0 + 0.1 * i)))
      val co2At313 =
        if (i <= 4) Seq(curve(s"doi-m$i-co2-313", Some(313.0), "CarbonDioxide",
          Seq((1.0, 1.0 + i), (5.0, 2.0 + i), (10.0, 3.0 + i))))
        else Nil
      MofDoc(i, s"MOF-$i", Databases(i % Databases.size), 40 + i,
        Some(10.0 + i), Some(5.0 + i), Some(0.55 + 0.02 * i),
        Some(1500.0 + 100 * i), Some(600.0 + 10 * i),
        Some(s"/cif/m$i.cif"), Some(s"mofid-$i"), Some(s"mofkey-$i"),
        elems("C" -> 12, "H" -> 8, "O" -> (4 + i)),
        isotherms = Seq(co2At298, h2At298) ++ co2At313,
        heats = Nil)
    }

    // identical composition pair, close atom counts, SA differing > 50%
    val twins = Seq(
      MofDoc(7, "TWIN-A", "CSD", 48, Some(12), Some(6), Some(0.62),
        Some(1000.0), Some(500.0), None, Some("mofid-7"), None,
        elems("Zn" -> 4, "C" -> 24, "H" -> 12, "O" -> 8), Nil, Nil),
      MofDoc(8, "TWIN-B", "hMOF", 50, Some(12), Some(6), Some(0.64),
        Some(3000.0), Some(900.0), None, Some("mofid-8"), None,
        elems("Zn" -> 4, "C" -> 24, "H" -> 12, "O" -> 8), Nil, Nil))

    val withHeats = (9 to 14).map { i =>
      val heat = curve(s"doi-m$i-heat", Some(298.0), "CarbonDioxide",
        (1 to 6).map(p => (p.toDouble, 20.0 + i + (if (i == 14) 200.0 else 0.0) + p)))
      MofDoc(i, s"HEAT-$i", Databases(i % Databases.size), 60 + i,
        Some(11), Some(5.5), Some(0.55),
        Some(if (i == 14) 9000.0 else 1200.0 + 50 * i), Some(550.0),
        None, None, None,
        elems("Cu" -> 2, "C" -> 18, "H" -> 10, "O" -> 6),
        Nil, heats = Seq(heat))
    }

    val withNulls = Seq(
      MofDoc(15, "NULL-VF", "IZA", 70, Some(9), Some(4), None,
        Some(800.0), Some(400.0), None, None, None, elems("Si" -> 24, "O" -> 48), Nil, Nil),
      MofDoc(16, "NULL-SA", "IZA", 72, Some(9), Some(4), Some(0.41),
        None, None, None, None, None, elems("Si" -> 24, "O" -> 48), Nil, Nil))

    // padding: 20 mofs per database so per-database top-5% windows have
    // population (scenario 2); capped SA (<1300) and vf (<0.45) keep the
    // featured mofs as the per-database winners
    val padding = (100 until 240).map { i =>
      MofDoc(i, s"PAD-$i", Databases(i % Databases.size), 130 + (i % 40),
        Some(8.0), Some(4.0), Some(0.2 + 0.01 * (i % 25)),
        Some(500.0 + (i % 40) * 20.0), Some(300.0), None, None, None,
        elems("Al" -> 2, "O" -> 3), Nil, Nil)
    }

    featured ++ twins ++ withHeats ++ withNulls ++ padding
  }

  def nested(spark: SparkSession): DataFrame = {
    import spark.implicits._
    nestedDocs.toDF()
  }

  /** Stable on-disk star location: the fixture corpus is deterministic
    * and sf-independent, so the scenario ORACLES read the very same
    * parquet via DuckDB read_parquet — this is what upgrades q46–q51 from
    * rows-only to full hash-gated correctness rows. */
  val StarDir = s"${graft.Aux.Root}/mof_star"

  /** The 10 star tables [[MofSchema.shred]] produces, in registration
    * order — kept in sync by the registerStar require below. */
  val StarTables: Seq[String] = Seq("mofs", "elements", "adsorbates",
    "isotherms", "isotherm_data", "isotherm_species_data",
    "mof_adsorbates", "heats", "heat_data", "heat_species_data")

  /** BUMP whenever [[MofSchema.shred]]'s OUTPUT changes (new column,
    * different surrogate keys, join fix): the content stamp below hashes
    * only the fixture corpus, so without this constant a shred edit
    * would silently keep serving the stale on-disk star — and the
    * oracles read the same files, so Verify could not catch it. */
  private val ShredVersion = 1

  /** Content stamp of the fixture corpus + shred logic version:
    * case-class toString is deterministic across JVM runs (fixed Double
    * rendering), so equal stamps ⇔ equal fixture definitions. */
  private def fixtureVersion: String =
    s"v$ShredVersion-" +
      scala.util.hashing.MurmurHash3.orderedHash(nestedDocs.map(_.toString)).toString

  /** Shred the fixture corpus and materialize the star tables as
    * single-file parquet — but only when the on-disk star does not
    * already carry the current corpus' content stamp. The write-once
    * discipline matters beyond speed: the star dir is sf-independent and
    * shared by every session (Verify, Bench, the driver's DuckDB oracle
    * all read the same files), so an unconditional per-session overwrite
    * opens a window where a concurrently running job reads a
    * half-rewritten table — the only mechanism ever observed producing a
    * rows-match/hash-mismatch flake on q47 (CORRECTNESS_r03). With the
    * stamp, re-running unchanged code never touches the files; a fixture
    * edit changes the stamp and triggers exactly one rewrite. */
  def registerStar(spark: SparkSession): Unit = synchronized {
    if (!spark.catalog.tableExists("mofs")) {
      val versionFile = java.nio.file.Paths.get(StarDir, "_fixture_version")
      val want = fixtureVersion
      def upToDate = java.nio.file.Files.exists(versionFile) &&
        java.nio.file.Files.readString(versionFile).trim == want &&
        StarTables.forall(t => java.nio.file.Files.exists(
          java.nio.file.Paths.get(StarDir, t, "_SUCCESS")))
      if (!upToDate) {
        // Cross-JVM file lock: on a cold start (no stamp yet) two
        // concurrently launched sessions (Verify ∥ Bench) must not both
        // rewrite the shared star; the second waits, re-checks the stamp
        // under the lock, and skips.
        java.nio.file.Files.createDirectories(versionFile.getParent)
        val ch = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(StarDir, "_lock"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        val lock = ch.lock()
        try {
          if (!upToDate) {
            val shredded = MofSchema.shred(nested(spark))
            require(shredded.keySet == StarTables.toSet,
              s"StarTables out of sync with shred output: ${shredded.keySet}")
            shredded.foreach { case (name, df) =>
              df.coalesce(1).write.mode("overwrite").parquet(s"$StarDir/$name")
            }
            java.nio.file.Files.writeString(versionFile, want)
          }
        } finally { lock.release(); ch.close() }
      }
      StarTables.foreach { name =>
        spark.read.parquet(s"$StarDir/$name").createOrReplaceTempView(name)
      }
    }
  }
}
