package graft

import org.apache.spark.sql.{Column, DataFrame}

package object queries {

  /** Deterministic total order for a SMALL (gate-sized) result without
    * `orderBy`'s range-partitioner overhead: a global sort first runs a
    * SAMPLING JOB that re-executes the whole upstream plan just to pick
    * range boundaries, then shuffles into range partitions. For bounded
    * outputs (every gate query returns ≤ ~10k rows by construction) a
    * single-partition exchange + in-partition sort gives the identical
    * row order while running the plan ONCE.
    *
    * `repartition(1)`, not `coalesce(1)`: coalesce would collapse the
    * FINAL COMPUTING stage to one task (it removes the boundary
    * upstream), while repartition inserts a narrow exchange of the
    * already-reduced result and leaves every upstream stage at full
    * parallelism. Unbounded results must keep `orderBy` — the parallel
    * range sort is the scalable path when the output itself is big.
    */
  implicit final class SmallResultOps(private val df: DataFrame) extends AnyVal {
    def orderedSmall(cols: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
  }
}
