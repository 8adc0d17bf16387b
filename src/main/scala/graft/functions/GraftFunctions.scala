package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level API for the domain function library (SURVEY §2.7 F1-F13).
  *
  * Spark-first design: everything expressible with built-in (codegen'd)
  * functions is — `translate` for unicode digit normalization, map literals
  * + `element_at` for space-group lookups, `aggregate`/`transform` for
  * formation energy. Only genuine string-parsing (Hill formula, TCOD
  * respacing) drops to a UDF.
  */
object GraftFunctions {

  // F1 — unicode digit normalization, pure built-in translate (codegen'd)
  def normalize_formula(c: Column): Column =
    translate(c, Formulas.TranslateFrom, Formulas.TranslateTo)

  // F2 — Hill canonicalization via the native codegen'd expression
  // (HillFormulaExpr); stays inside whole-stage codegen unlike a UDF.
  // Spark 4's Column API no longer exposes catalyst Expressions directly,
  // so the Column form resolves through the session function registry.
  def hill_formula(c: Column): Column = {
    ensureHillRegistered(SparkSession.active)
    call_function("hill_formula", c)
  }

  // Register-once-per-session guards. createOrReplaceTempFunction is
  // idempotent but each call after the first logs a "replaced a
  // previously registered function" WARN — hundreds of them per bench
  // run, polluting the only output channel the round driver tail-reads —
  // and is registry churn on the query-construction hot path. Weak keys
  // so dropped sessions (tests create many) don't accumulate.
  private val hillRegistered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
  private val vectorRegistered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  // Guards mark the session registered only AFTER registration completes,
  // under the map's monitor — a flag-before-action putIfAbsent would let a
  // concurrent query-construction thread proceed to call_function before
  // the name exists (check-then-act race; benign single-threaded, fatal
  // for a parallel harness).
  private def ensureHillRegistered(spark: SparkSession): Unit = {
    if (hillRegistered.containsKey(spark)) return
    hillRegistered.synchronized {
      if (!hillRegistered.containsKey(spark)) {
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "hill_formula", exprs => HillFormulaExpr(exprs.head), "scala_udf")
        hillRegistered.put(spark, java.lang.Boolean.TRUE)
      }
    }
  }

  // Vector kernels (similarity/ANN hot path) — native one-pass codegen'd
  // expressions; see VectorExprs scaladoc for the bit-compatibility
  // contract with the composed higher-order-function forms.
  def cosine_sim(a: Column, b: Column): Column = {
    ensureVectorRegistered(SparkSession.active)
    call_function("cosine_sim", a, b)
  }

  def sign_bucket(vec: Column, planes: Column): Column = {
    ensureVectorRegistered(SparkSession.active)
    call_function("sign_bucket", vec, planes)
  }

  def hamming_dist(a: Column, b: Column): Column = {
    ensureVectorRegistered(SparkSession.active)
    call_function("hamming_dist", a, b)
  }

  def simhash_blocks(bits: Column): Column = {
    ensureVectorRegistered(SparkSession.active)
    call_function("simhash_blocks", bits)
  }

  def stopword_hits(tokens: Column, set: Column): Column = {
    ensureVectorRegistered(SparkSession.active)
    call_function("stopword_hits", tokens, set)
  }

  def lsh_bands(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    ensureVectorRegistered(SparkSession.active)
    call_function("lsh_bands", sig, lit(bands), lit(rowsPerBand))
  }

  def sig_agree(a: Column, b: Column): Column = {
    ensureVectorRegistered(SparkSession.active)
    call_function("sig_agree", a, b)
  }

  def int_dot(a: Column, b: Column): Column = {
    ensureVectorRegistered(SparkSession.active)
    call_function("int_dot", a, b)
  }

  def int_sqdist(a: Column, b: Column): Column = {
    ensureVectorRegistered(SparkSession.active)
    call_function("int_sqdist", a, b)
  }

  private def ensureVectorRegistered(spark: SparkSession): Unit = {
    if (vectorRegistered.containsKey(spark)) return
    vectorRegistered.synchronized {
      if (vectorRegistered.containsKey(spark)) return
      registerVectorKernels(spark)
      vectorRegistered.put(spark, java.lang.Boolean.TRUE)
    }
  }

  private def registerVectorKernels(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sign_bucket", exprs => SignBucketExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming_dist", exprs => HammingDistExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_blocks", exprs => SimhashBlocksExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "stopword_hits", exprs => StopwordHitsExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bands", exprs => LshBandsExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sig_agree", exprs => SigAgreeExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int_dot", exprs => IntDotExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int_sqdist", exprs => IntSqdistExpr(exprs(0), exprs(1)), "scala_udf")
  }

  // F4 — space-group number → short HM / unicode symbol via map literals
  private lazy val shortHMCol: Column =
    typedlit(SpaceGroups.shortHM.zipWithIndex.map { case (s, i) => (i + 1) -> s }.toMap)
  private lazy val unicodeCol: Column = typedlit(SpaceGroups.unicodeSymbol)

  def spg_short_hm(n: Column): Column = element_at(shortHMCol, n.cast("int"))
  def spg_unicode(n: Column): Column  = element_at(unicodeCol, n.cast("int"))

  private val tcodUdf = udf((s: String) =>
    if (s == null) null else SpaceGroups.toTcodFormat(s))
  def spg_tcod(hm: Column): Column = tcodUdf(hm)

  // F13 — formation energy per atom, pure built-ins:
  // (energy − Σ ref[site]) / natoms; null when a site element is unknown
  // (element_at yields null which propagates through the fold) or the site
  // list is empty.
  private lazy val energyRefCol: Column = typedlit(DomainFunctions.EnergyRef)
  def e_form_per_atom(speciesAtSites: Column, energy: Column): Column =
    when(speciesAtSites.isNull || size(speciesAtSites) === 0, lit(null))
      .otherwise(
        (energy - aggregate(
          transform(speciesAtSites, e => element_at(energyRefCol, e)),
          lit(0.0), (acc, x) => acc + x)) / size(speciesAtSites))

  // F11 — stable run ids: sha1(filter)[:8]
  def run_id(c: Column): Column = substring(sha1(c), 1, 8)

  /** SQL-name registration so `spark.sql` surfaces can call these. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("normalize_formula",
      (s: String) => if (s == null) null else Formulas.normalizeFormula(s))
    ensureHillRegistered(spark)
    spark.udf.register("spg_short_hm",
      (n: Int) => SpaceGroups.fromNumber(n).orNull)
    spark.udf.register("spg_unicode",
      (n: Int) => SpaceGroups.unicodeSymbol.get(n).orNull)
    spark.udf.register("spg_tcod",
      (s: String) => if (s == null) null else SpaceGroups.toTcodFormat(s))
    spark.udf.register("e_form_per_atom",
      (species: Seq[String], energy: Double) =>
        DomainFunctions.eFormPerAtom(species, energy).map(Double.box).orNull)
  }
}
