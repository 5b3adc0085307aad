package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triangle counting and clustering coefficients — the static-graph
  * audit pair next to the iterative graph operators (connected
  * components in [[Dedup]], PageRank / label propagation in the
  * stats gates). Triangle density separates community-structured
  * graphs from random ones at equal degree; the per-node clustering
  * coefficient is the classic local cohesion signal.
  *
  * Algorithm: degree-ordered orientation ("compact-forward", Latapy
  * 2008; the same orientation MapReduce triangle counting uses, Suri
  * & Vassilvitskii 2011 §3): each undirected edge {u,v} becomes the
  * single arc u→v with (deg(u), u) < (deg(v), v). Every triangle
  * then has exactly ONE wedge a→b, b→c with both arcs oriented, so
  *
  *   triangles = (a→b) ⋈ (b→c) ⋈ (a→c)
  *
  * counts each triangle once with no post-dedup. The orientation is
  * what makes this 100 TB-safe: out-degrees under it are bounded by
  * O(√m) regardless of hub size (a node keeps an arc only toward
  * HIGHER-degree neighbors), so the wedge fan-out of the first join
  * is O(m^1.5) worst-case — the provably optimal bound — instead of
  * Σ deg² which a hub would blow up. All three joins are plain
  * equi-joins (shuffle on node / node-pair keys, AQE-replanned);
  * nothing is all-pairs.
  */
object Graphs {

  /** Canonical undirected edge set from a (u, v) pair relation:
    * self-loops dropped, both orders collapsed to u < v, duplicates
    * removed. One shuffle (the distinct).
    */
  def canonicalEdges(pairs: DataFrame): DataFrame =
    pairs
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()

  /** (node, deg) over canonical edges. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** Degree-ordered orientation of canonical edges: (s, t) arcs with
    * (deg(s), s) < (deg(t), t). `deg` must be [[degrees]] of the same
    * edge set.
    */
  def orient(edges: DataFrame, deg: DataFrame): DataFrame = {
    val ed = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    ed.select(
      when(fwd, col("u")).otherwise(col("v")).as("s"),
      when(fwd, col("v")).otherwise(col("u")).as("t"))
  }

  /** All triangles (a, b, c), each exactly once, a/b/c in orientation
    * order (NOT necessarily numeric order).
    */
  def triangles(edges: DataFrame): DataFrame = {
    val o = orient(edges, degrees(edges))
    val e1 = o.select(col("s").as("a"), col("t").as("b"))
    val e2 = o.select(col("s").as("b2"), col("t").as("c"))
    val e3 = o.select(col("s").as("a3"), col("t").as("c3"))
    e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-node triangle participation joined onto degrees:
    * (node, deg, t) with t = number of triangles containing the node
    * (0 when none). Input relation for clustering coefficients:
    * local(v) = 2·t / (deg·(deg−1)).
    */
  def nodeTriangles(edges: DataFrame): DataFrame = {
    val tv = triangles(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("t"))
    degrees(edges).join(tv, Seq("node"), "left")
      .select(col("node"), col("deg"), coalesce(col("t"), lit(0L)).as("t"))
  }

  /** One-row exact-integer graph summary:
    * (n_nodes, n_edges, n_triangles, wedges, global_ppm,
    * avg_local_ppm) where global = 3·triangles / wedges (transitivity)
    * and avg_local averages the per-node ppm coefficient over nodes
    * of degree ≥ 2 — both as floor-division ppm integers, so the
    * result is bit-identical in any engine.
    */
  def clusteringStats(edges: DataFrame): DataFrame = {
    val nd = nodeTriangles(edges)
    val lc = when(col("deg") >= 2,
      Binning.floorDivCol(col("t") * lit(2000000L), col("deg") * (col("deg") - 1)))
      .otherwise(lit(0L))
    val agg = nd.agg(
      count(lit(1)).as("n_nodes"),
      Binning.floorDivCol(sum(col("deg")).cast("long"), lit(2L)).as("n_edges"),
      Binning.floorDivCol(sum(col("t")).cast("long"), lit(3L)).as("n_triangles"),
      sum(Binning.floorDiv(col("deg") * (col("deg") - 1), 2L)).cast("long").as("wedges"),
      sum(lc).cast("long").as("lc_sum"),
      sum(when(col("deg") >= 2, lit(1L)).otherwise(lit(0L))).cast("long").as("n_deg2"))
    agg.select(
      col("n_nodes"), col("n_edges"), col("n_triangles"), col("wedges"),
      when(col("wedges") > 0,
        Binning.floorDivCol(col("n_triangles") * lit(3000000L), col("wedges")))
        .otherwise(lit(null).cast("long")).as("global_ppm"),
      when(col("n_deg2") > 0, Binning.floorDivCol(col("lc_sum"), col("n_deg2")))
        .otherwise(lit(null).cast("long")).as("avg_local_ppm"))
  }
}
