package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered per-scan transforms (smoothing, derivative, normalization)
  * — the Spark re-expression of pyspec's scan post-processing
  * (normalize to monitor, smooth, numeric derivative).
  *
  * Determinism: callers pass the FULL ordering (including a unique
  * tiebreak column such as a row id) so repeated runs — and the SQL
  * oracle — order peers identically even with duplicate timestamps.
  *
  * Scale: every op is one window over (key, order) = one shuffle by
  * key + in-partition sort; frames are O(1) rows so executors never
  * buffer a whole scan beyond the sort.
  */
object WindowOps {

  /** Centered moving average of exact-decimal `w` over ±halfWidth rows
    * within each key, ordered by `order` (must be a total order).
    */
  def movingAvg(df: DataFrame, key: Column, order: Seq[Column], w: Column,
                halfWidth: Int, out: String = "ma"): DataFrame = {
    val win = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(-halfWidth, halfWidth)
    // Exact tie-proof rounding (see Exact): frame sum is a scale-2
    // decimal, frame count a small int — the classic rounding-tie case.
    df.withColumn(out,
      Exact.roundedRatio(Exact.cents(sum(w).over(win)),
        count(lit(1)).over(win) * lit(100L), 4))
  }

  /** Discrete derivative d(v)/d(t) within each key ordered by `order`
    * (a total order; `t` in integer microseconds → per second).
    * Rows with no predecessor or with dt = 0 (duplicate timestamps)
    * are dropped — a 0 denominator would otherwise produce ±Inf/NaN
    * which neither engine hashes stably.
    */
  def derivative(df: DataFrame, key: Column, order: Seq[Column], v: Column, tUs: Column,
                 out: String = "deriv"): DataFrame = {
    val win = Window.partitionBy(key).orderBy(order: _*)
    df.withColumn("_dv", v - lag(v, 1).over(win))
      .withColumn("_dt", tUs - lag(tUs, 1).over(win))
      .filter(col("_dt").isNotNull && col("_dt") =!= 0)
      // `+ 0.0` canonicalizes IEEE -0.0 to +0.0 (a tiny negative dv
      // rounds to -0.0, which hashes differently from the oracle's 0.0).
      .withColumn(out, round(col("_dv").cast("double") / (col("_dt") / lit(1000000.0)), 6) + lit(0.0))
      .drop("_dv", "_dt")
  }

  /** Normalize `v` to the group total of exact-decimal `monitor`
    * (pyspec: counts normalized to monitor counts) — one window sum,
    * one shuffle. Groups whose monitor total is NULL/0 yield NULL.
    */
  def normalizeToMonitor(df: DataFrame, key: Column, v: Column, monitor: Column,
                         out: String = "norm"): DataFrame = {
    val win = Window.partitionBy(key)
    df.withColumn(out, round(v.cast("double") / sum(monitor).over(win).cast("double"), 6))
  }
}
