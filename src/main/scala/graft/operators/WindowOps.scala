package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered per-scan transforms (smoothing, derivative, normalization)
  * — the Spark re-expression of pyspec's scan post-processing
  * (normalize to monitor, smooth, numeric derivative).
  *
  * Scale: every op is one window over (key, order) = one shuffle by
  * key + in-partition sort; frames are O(1) rows so executors never
  * buffer a whole scan beyond the sort.
  */
object WindowOps {

  /** Centered moving average of exact-decimal `w` over ±halfWidth rows
    * within each key, ordered by `order`.
    */
  def movingAvg(df: DataFrame, key: Column, order: Column, w: Column,
                halfWidth: Int, out: String = "ma"): DataFrame = {
    val win = Window.partitionBy(key).orderBy(order)
      .rowsBetween(-halfWidth, halfWidth)
    df.withColumn(out,
      round(sum(w).over(win).cast("double") / count(lit(1)).over(win).cast("double"), 4))
  }

  /** Discrete derivative d(v)/d(t) within each key ordered by `order`
    * (t in integer nanoseconds → seconds). First row of each key is
    * dropped (no predecessor).
    */
  def derivative(df: DataFrame, key: Column, order: Column, v: Column, tNs: Column,
                 out: String = "deriv"): DataFrame = {
    val win = Window.partitionBy(key).orderBy(order)
    df.withColumn("_dv", v - lag(v, 1).over(win))
      .withColumn("_dt", (tNs - lag(tNs, 1).over(win)).cast("double"))
      .filter(col("_dt").isNotNull)
      .withColumn(out, round(col("_dv") / (col("_dt") / lit(1e9)), 6))
      .drop("_dv", "_dt")
  }

  /** Normalize `v` to the group total of exact-decimal `monitor`
    * (pyspec: counts normalized to monitor) — window sum, one shuffle.
    */
  def normalizeToMonitor(df: DataFrame, key: Column, v: Column, monitor: Column,
                         out: String = "norm"): DataFrame = {
    val win = Window.partitionBy(key)
    df.withColumn(out, round(v / sum(monitor).over(win).cast("double"), 6))
  }
}
