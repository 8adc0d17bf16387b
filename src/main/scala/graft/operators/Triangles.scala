package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle enumeration with degree orientation — the
  * standard trick that makes the wedge join survive skew: every edge is
  * oriented from its (degree, id)-smaller endpoint to the larger, so a
  * node's out-degree is bounded by O(√m) on any graph and wedge count
  * by Σ outdeg² = O(m^1.5) — a hub of degree D costs D wedges, not D²,
  * because the hub sits on the IN side of its star's edges. An
  * id-oriented version puts all of a low-id hub's edges on the OUT side
  * and melts down on power-law graphs; this is the difference between
  * "works on TPC-H" and "works on a web graph".
  *
  * Pipeline: canonicalize (least, greatest, distinct) → degree table →
  * orient by (deg, id) → wedge self-join on the common source → close
  * each wedge against the oriented edge list. Each triangle {x,y,z}
  * with x ≺ y ≺ z (≺ = (deg,id) order) is found exactly once: as the
  * wedge (y,z) at x closed by the edge y→z. Two equi-joins, both on
  * edge keys; output rows are id-sorted triples (a,b,c).
  *
  * q102's oracle is the id-ordered 3-way self-join in DuckDB — a
  * different orientation whose triangle SET must match exactly.
  */
object Triangles {

  /** Enumerate triangles of the undirected graph given as (a, b) pairs
    * (any orientation, duplicates and self-loops tolerated). Output:
    * (a, b, c) with a < b < c by id, each triangle once. */
  def enumerate(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint() // consumed by the degree agg AND both joins
    val deg = canon.select(col("u").as("n"))
      .unionByName(canon.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = canon
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("dd"))
      .localCheckpoint() // two consumers below (wedge agg + closing join)
    // Wedges explode ROW-LOCALLY from per-source out-adjacency lists
    // sorted by (dd, dst) — ONE src-keyed exchange where the old
    // self-join exchanged the oriented list twice and ran a join stage
    // (r13 optimization round, guide §2.4). Position-slice pairing of
    // the sorted list emits exactly the old strict wedge order
    // dy < dz OR (dy = dz AND y < z): entries are distinct per source
    // (dst is), so lexicographic struct order is strict. The agg
    // buffer is bounded by the ORIENTED out-degree — O(√m) on any
    // graph, the same bound that sized the old join's per-key fan-in —
    // so a hub costs its degree, not degree², exactly as before. The
    // slice lambda captures only agg-barrier outputs (the
    // captured-array HOF rule; GlobalPlanAuditSpec walks this plan).
    val wedges = oriented.groupBy("src")
      .agg(sort_array(collect_list(struct(col("dd"), col("dst")))).as("nb"))
      .select(col("src").as("x"), posexplode(col("nb")).as(Seq("i", "ys")),
        col("nb"))
      .select(col("x"), col("ys.dst").as("y"),
        explode(slice(col("nb"), col("i") + lit(2),
          size(col("nb")) - col("i") - lit(1))).as("zs"))
      .select(col("x"), col("y"), col("zs.dst").as("z"))
    val closed = wedges.join(
      oriented.select(col("src").as("y2"), col("dst").as("z2")),
      col("y") === col("y2") && col("z") === col("z2"))
    closed.select(array_sort(array(col("x"), col("y"), col("z"))).as("t"))
      .select(col("t")(0).as("a"), col("t")(1).as("b"), col("t")(2).as("c"))
  }
}
