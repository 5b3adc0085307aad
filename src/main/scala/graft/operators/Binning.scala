package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rebinning / gridding — the Spark re-expression of pyspec's 1-D
  * `rebin` and the 3-D reciprocal-space gridder (reference: pyspec
  * `ccd/transformations.py` grid3d / ctrans).
  *
  * Scale: a gridder over N points and G cells is a single hash
  * aggregate keyed by cell id — map-side partial aggregation means the
  * shuffle carries at most G*partitions rows regardless of N, which is
  * exactly how a 100 TB point cloud reduces to a bounded grid.
  */
object Binning {

  /** Fixed-width 1-D rebin of integer abscissa `x` (bin = x div width)
    * aggregating exact-decimal weight `w` → (bin, n, y_sum, y_mean).
    */
  def rebin1d(df: DataFrame, x: Column, w: Column, width: Long): DataFrame = {
    val agg = df.groupBy((x.cast("long") / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), sum(w).as("sum_w"))
    agg.select(
      col("bin"), col("n"),
      round(col("sum_w").cast("double"), 2).as("y_sum"),
      round(col("sum_w").cast("double") / col("n").cast("double"), 4).as("y_mean"))
  }

  /** Histogram with a data-driven range: nBins equal cells over
    * [min(v), max(v)], the last cell right-closed. The global range is
    * one tiny scalar aggregate broadcast to the scan — two passes over
    * the data, no driver round-trip in the plan's data path.
    */
  def histogram(df: DataFrame, v: Column, nBins: Int): DataFrame = {
    val range = df.agg(min(v).as("lo"), max(v).as("hi"))
    val w = (col("hi") - col("lo")) / nBins.toDouble
    df.select(v.as("v")).crossJoin(broadcast(range))
      .select(least(floor((col("v") - col("lo")) / w), lit(nBins - 1L)).cast("long").as("bin"),
        col("lo"), col("hi"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col("lo") + col("bin") * ((col("hi") - col("lo")) / nBins.toDouble)), 4).as("bin_lo"))
      .select(col("bin"), col("n"), col("bin_lo"))
  }

  /** Regular 3-D gridder: cell = (floor(x/sx), floor(y/sy), floor(z/sz)),
    * per-cell count / exact sum / mean of weight `w`.
    */
  def grid3d(df: DataFrame, x: Column, y: Column, z: Column, w: Column,
             sx: Double, sy: Double, sz: Double): DataFrame = {
    val agg = df.groupBy(
        floor(x / sx).cast("long").as("gx"),
        floor(y / sy).cast("long").as("gy"),
        floor(z / sz).cast("long").as("gz"))
      .agg(count(lit(1)).as("n"), sum(w).as("sum_w"))
    agg.select(
      col("gx"), col("gy"), col("gz"), col("n"),
      round(col("sum_w").cast("double"), 2).as("w_sum"),
      round(col("sum_w").cast("double") / col("n").cast("double"), 4).as("w_mean"))
  }
}
