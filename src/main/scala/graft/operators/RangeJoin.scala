package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded range join (SURVEY.md §2 #49): match each left row
  * `(key, t)` to right rows `(key, t_r)` with
  * `t − span <= t_r <= t` — the "recent context" join every
  * event pipeline needs (reference analogue: associating detector
  * readings with the monitor/command values of the preceding
  * interval).
  *
  * Scale design: a naive non-equi theta-join degenerates to a
  * per-key cross product (Spark can only broadcast-nested-loop it).
  * Instead the time axis is bucketized at `span`: each right row
  * lands in exactly one `(key, bucket)` cell, each left row probes
  * its own bucket and the previous one (2 candidates cover the whole
  * span because bucket width == span), and the join is a plain
  * shuffle/broadcast-able EQUI-join on `(key, bucket)` followed by
  * the exact bound filter. Shuffle keys are `(key, bucket)` — time
  * spreads hot keys across buckets, and AQE sees an ordinary
  * hash join.
  */
object RangeJoin {

  /** @param key    join key column name (same on both sides)
    * @param leftT  left event-time column name (integer units)
    * @param rightT right event-time column name (integer units;
    *               distinct name from `leftT`)
    * @param span   inclusive look-back window, same units as t
    * @return inner-joined rows (all left + right columns) where
    *         `leftT − span <= rightT <= leftT`
    */
  def lookback(left: DataFrame, right: DataFrame, key: String,
               leftT: String, rightT: String, span: Long): DataFrame = {
    require(span > 0, "span must be positive")
    // exact FLOORED bucket ids — `div` truncates toward zero for
    // negative longs, which would misalign buckets for pre-epoch
    // times; floorDivCol is exact for the full long range
    val probe = left
      .withColumn("_b0", Binning.floorDivCol(col(leftT), lit(span)))
      .withColumn("_b", explode(array(col("_b0") - 1, col("_b0"))))
      .drop("_b0")
    val build = right.withColumn("_b", Binning.floorDivCol(col(rightT), lit(span)))
    // each right row has ONE bucket and the two probe buckets are
    // distinct, so a qualifying pair meets exactly once — no dedup
    probe.join(build, Seq(key, "_b"))
      .filter(col(rightT) >= col(leftT) - span && col(rightT) <= col(leftT))
      .drop("_b")
  }
}
