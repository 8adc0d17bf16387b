package graft.result

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, Row}
import graft.federate.QuotaPlanner

/** The universal result envelope + manifest every reference server returns
  * (optimade_database/Optimade_Server/server.py:44-49,175-198 — identical
  * shape in all five modules).
  */
final case class FetchResult(
    outputDir: String,
    nFound: Long,
    cleanedStructures: Seq[Map[String, Any]],
    code: Int,
    message: String)

object FetchResult {
  /** MAX_RETURNED_STRUCTS — server.py:21, same constant in all 5 servers. */
  val MaxReturnedStructs = 30
}

/** Driver-side JSON emission (tiny payloads: manifests, plans, stats). */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def any(v: Any): String = v match {
    case null => "null"
    case s: String => str(s)
    case b: Boolean => b.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double => if (d == math.rint(d) && !d.isInfinite) d.toLong.toString else d.toString
    case m: Map[_, _] => obj(m.toSeq.map { case (k, x) => k.toString -> x })
    case xs: Seq[_] => arr(xs)
    case other => str(other.toString)
  }

  def obj(fields: Seq[(String, Any)]): String =
    fields.map { case (k, v) => s"${str(k)}: ${any(v)}" }.mkString("{", ", ", "}")

  def arr(xs: Seq[Any]): String = xs.map(any).mkString("[", ", ", "]")
}

/** Query manifest — the summary.json artifact (S8,
  * Optimade_Server/server.py:175-188): filters, per-provider stats, quota
  * plan, file list. */
object Manifest {
  def write(dir: Path, filter: String, stats: QuotaPlanner.Stats,
            plan: QuotaPlanner.Plan, files: Seq[String],
            failures: Seq[(String, String)]): Path = {
    Files.createDirectories(dir)
    val json = Json.obj(Seq(
      "filter" -> filter,
      "stats" -> stats.map { case (c, us) => c -> us.toMap.asInstanceOf[Any] }.toMap,
      "plan" -> plan.map { case (c, us) => c -> us.toMap.asInstanceOf[Any] }.toMap,
      "n_planned" -> QuotaPlanner.planTotal(plan),
      "files" -> files,
      "failures" -> failures.map { case (p, m) => Map("source" -> p, "error" -> m) }))
    val out = dir.resolve("summary.json")
    Files.writeString(out, json)
    out
  }
}

/** Structure file writers (S6/S7): one CIF and/or JSON per structure row.
  *
  * The reference reconstructs CIF via pymatgen from lattice + species +
  * cartesian positions (Optimade_Server/utils.py:439-449). Here the CIF
  * text is produced by [[CifWriter.cifText]] — minimal P1 cell with
  * fractional coordinates derived by inverting the lattice matrix.
  *
  * Writing N small files is a per-row side effect, not a relational
  * operator: rows are collected AFTER the plan has truncated to
  * MAX_RETURNED_STRUCTS (≤30), so this never pulls a large result to the
  * driver. For bulk export the relational path is `df.write.parquet/json`.
  */
object CifWriter {

  /** a,b,c,α,β,γ from 3×3 lattice row vectors. */
  def cellParams(lat: Seq[Seq[Double]]): (Double, Double, Double, Double, Double, Double) = {
    def norm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def angle(a: Seq[Double], b: Seq[Double]) =
      math.toDegrees(math.acos(dot(a, b) / (norm(a) * norm(b))))
    val Seq(va, vb, vc) = lat
    (norm(va), norm(vb), norm(vc), angle(vb, vc), angle(va, vc), angle(va, vb))
  }

  /** Invert a 3×3 matrix (for cartesian → fractional conversion). */
  def invert3(m: Seq[Seq[Double]]): Array[Array[Double]] = {
    val a = m.map(_.toArray).toArray
    val det =
      a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
      a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
      a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))
    require(math.abs(det) > 1e-12, "singular lattice")
    val inv = Array.ofDim[Double](3, 3)
    inv(0)(0) = (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) / det
    inv(0)(1) = (a(0)(2) * a(2)(1) - a(0)(1) * a(2)(2)) / det
    inv(0)(2) = (a(0)(1) * a(1)(2) - a(0)(2) * a(1)(1)) / det
    inv(1)(0) = (a(1)(2) * a(2)(0) - a(1)(0) * a(2)(2)) / det
    inv(1)(1) = (a(0)(0) * a(2)(2) - a(0)(2) * a(2)(0)) / det
    inv(1)(2) = (a(0)(2) * a(1)(0) - a(0)(0) * a(1)(2)) / det
    inv(2)(0) = (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0)) / det
    inv(2)(1) = (a(0)(1) * a(2)(0) - a(0)(0) * a(2)(1)) / det
    inv(2)(2) = (a(0)(0) * a(1)(1) - a(0)(1) * a(1)(0)) / det
    inv
  }

  /** Minimal P1 CIF from (id, lattice row vectors, per-site species,
    * cartesian positions) — the lattice+species+positions round-trip scope
    * recorded as the fidelity goal in SURVEY §7 non-goals. */
  def cifText(id: String, lattice: Seq[Seq[Double]], species: Seq[String],
              cartesian: Seq[Seq[Double]]): String = {
    val (a, b, c, al, be, ga) = cellParams(lattice)
    val inv = invert3(lattice)
    // row-vector convention: frac = cart · L⁻¹
    def frac(p: Seq[Double]): Seq[Double] =
      (0 until 3).map(j => p(0) * inv(0)(j) + p(1) * inv(1)(j) + p(2) * inv(2)(j))
    val sb = new StringBuilder
    sb.append(s"data_$id\n")
    sb.append(f"_cell_length_a $a%.6f\n_cell_length_b $b%.6f\n_cell_length_c $c%.6f\n")
    sb.append(f"_cell_angle_alpha $al%.4f\n_cell_angle_beta $be%.4f\n_cell_angle_gamma $ga%.4f\n")
    sb.append("_symmetry_space_group_name_H-M 'P 1'\n_symmetry_Int_Tables_number 1\n")
    sb.append("loop_\n _atom_site_type_symbol\n _atom_site_label\n")
    sb.append(" _atom_site_fract_x\n _atom_site_fract_y\n _atom_site_fract_z\n")
    species.zip(cartesian).zipWithIndex.foreach { case ((sp, pos), i) =>
      val f = frac(pos)
      sb.append(f" $sp $sp${i}%d ${f(0)}%.6f ${f(1)}%.6f ${f(2)}%.6f\n")
    }
    sb.toString
  }

  /** Write one CIF + one pretty JSON per row of a (small, already
    * truncated) result. Failed writes are reported, not fatal, and do not
    * claim the id (O4 retry semantics belong to the caller's dedup). */
  def writeStructures(df: DataFrame, outDir: String,
                      idCol: String = "id", latticeCol: String = "lattice_vectors",
                      speciesCol: String = "species_at_sites",
                      positionsCol: String = "cartesian_site_positions",
                      asCif: Boolean = true): (Seq[String], Seq[String]) = {
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    val files = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    val rows = df.collect() // ≤ MaxReturnedStructs rows by contract
    rows.foreach { row =>
      val id = row.getAs[Any](idCol).toString
      try {
        if (asCif) {
          // Spark hands back mutable ArraySeq; normalize to immutable
          val lat = row.getSeq[scala.collection.Seq[Double]](row.fieldIndex(latticeCol))
            .map(_.toSeq).toSeq
          val sp = row.getSeq[String](row.fieldIndex(speciesCol)).toSeq
          val pos = row.getSeq[scala.collection.Seq[Double]](row.fieldIndex(positionsCol))
            .map(_.toSeq).toSeq
          val p = dir.resolve(s"$id.cif")
          Files.writeString(p, cifText(id, lat, sp, pos))
          files += p.toString
        } else {
          val p = dir.resolve(s"$id.json")
          Files.writeString(p, rowJson(row))
          files += p.toString
        }
      } catch {
        case e: Exception => warnings += s"failed to save $id: ${e.getMessage}"
      }
    }
    (files.result(), warnings.result())
  }

  private def rowJson(row: Row): String =
    Json.obj(row.schema.fieldNames.toSeq.map { f =>
      f -> (row.getAs[Any](f) match {
        case s: collection.Seq[_] => s.toSeq
        case m: collection.Map[_, _] => m.toMap.map { case (k, v) => k.toString -> v }
        case other => other
      })
    })
}
