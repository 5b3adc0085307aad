package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions

/** IVF (inverted-file) approximate nearest neighbour — the classic
  * coarse-quantizer scale path for ANN alongside LSH: cluster the
  * corpus into C cells with k-means, search only the `nprobe`
  * nearest cells per query.
  *
  * Determinism (required by the rows-only gate): everything runs in
  * exact integer arithmetic over the fixed-point vectors — seeds are
  * the C smallest vec_ids, assignment distance is the exact integer
  * `‖x‖² + ‖c‖² − 2·x·c`, argmin ties break by cell id, and centroid
  * updates use floored integer element means — so every iteration is
  * reproducible on any cluster layout.
  *
  * Scale: assignment is a broadcast join (C centroids ≪ corpus); the
  * per-cell inverted lists are just a (cell, vec) relation
  * partitioned by cell; a query probes `nprobe` cells → candidates
  * are one bucket-keyed join away, never a corpus scan.
  */
object IvfIndex {

  /** Deterministic k-means over (vec_id, q, n) rows.
    * @return (cell, centroid array<long>, cn ‖centroid‖²)
    */
  def centroids(e: DataFrame, c: Int, iters: Int): DataFrame = {
    val spark = e.sparkSession
    // Seeds: the C smallest vec_ids (deterministic, cheap).
    var cents = e.orderBy(col("vec_id")).limit(c)
      .select(col("vec_id"), col("q").as("centroid"))
      .withColumn("cell", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))) - 1)
      .select(col("cell").cast("long").as("cell"), col("centroid"))
    var it = 0
    while (it < iters) {
      val assigned = assign(e, withNorm(cents))
      // Elementwise floored-integer mean per cell: explode positions,
      // exact integer sums, floor division, reassemble ordered.
      cents = assigned
        .select(col("cell"), posexplode(col("q")).as(Seq("i", "v")))
        .groupBy(col("cell"), col("i"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
        .select(col("cell"), col("i"),
          Binning.floorDivCol(col("s"), col("cnt")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("im"))
        .select(col("cell"), transform(col("im"), x => x.getField("m")).as("centroid"))
      it += 1
    }
    withNorm(cents)
  }

  private def withNorm(cents: DataFrame): DataFrame =
    cents.select(col("cell"), col("centroid"),
      VectorExpressions.normQ(col("centroid")).as("cn"))

  /** Nearest-cell assignment: broadcast centroids, exact integer
    * distance, ties by cell id. Input rows need (vec_id, q, n). */
  def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val dist = col("n") + col("cn") - lit(2L) * VectorExpressions.dotQ(col("q"), col("centroid"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"), col("n"), col("cell"), dist.as("_d"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id")).orderBy(col("_d"), col("cell"))))
      .filter(col("_rk") === 1)
      .select(col("vec_id"), col("q"), col("n"), col("cell"))
  }

  /** Probe: for each query row, its `nprobe` nearest cells. */
  def probeCells(queries: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    val dist = col("nq") + col("cn") - lit(2L) * VectorExpressions.dotQ(col("qq"), col("centroid"))
    queries.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qq"), col("nq"), col("cell"), dist.as("_d"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("_d"), col("cell"))))
      .filter(col("_rk") <= nprobe)
      .select(col("query_id"), col("qq"), col("nq"), col("cell"))
  }

  /** IVF top-k: probe cells, score candidates within them, salted
    * two-phase ranking. `queries` needs (query_id, qq, nq);
    * `assigned` is the output of [[assign]].
    */
  def knn(queries: DataFrame, assigned: DataFrame, cents: DataFrame,
          nprobe: Int, k: Int): DataFrame = {
    val probes = probeCells(queries, cents, nprobe)
    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosineQ(VectorExpressions.dotQ(col("qq"), col("q")),
          col("nq"), col("n")).as("_c"))
      // the same (query, vec) pair can surface via multiple probed
      // cells only if assignment were non-unique — it is unique, so
      // no dedup needed here.
    Relational.topKPerGroupSalted(scored, Seq(col("query_id")),
        Seq(col("_c").desc, col("vec_id")), k, col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (round(col("_c"), 6) + lit(0.0)).as("cos"), col("rnk"))
  }
}
