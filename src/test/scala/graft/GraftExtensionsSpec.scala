package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("hill_formula resolves in plain SQL on an extension-built session") {
    // Build a FRESH SparkSession so the function can only come from the
    // extension (a reused suite session might carry the lazy temp
    // registration). Clear the active/default session, build with the
    // extension (reusing any existing SparkContext is fine — extensions
    // apply per session), and restore afterwards; never stop() here, the
    // context is shared with the other suites.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = spark.sql("""SELECT hill_formula('O2Si1') AS h,
                            |       hill_formula('ClNa') AS salt,
                            |       hill_formula(NULL) AS n""".stripMargin)
        .collect().head
      assert(got.getString(0) == "O2Si")
      assert(got.getString(1) == "ClNa")
      assert(got.isNullAt(2))
      // the native expression shows up in the physical plan by name
      val plan = spark.sql("SELECT hill_formula(CAST(id AS STRING)) FROM range(10)")
        .queryExecution.executedPlan.toString
      assert(plan.contains("hill_formula"), plan)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
