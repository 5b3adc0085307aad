package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling (the ANALYZE / SUMMARIZE surface): per-column row
  * count, null count, distinct count and min/max in ONE pass over the
  * relation, emitted long-format so heterogeneous column types share
  * a schema (values rendered as strings; ordering stats computed on
  * the native type BEFORE rendering).
  *
  * Scale notes. `exact = true` computes exact per-column distincts —
  * Spark plans multi-distinct aggregates via Expand, which multiplies
  * the scanned relation by the number of profiled columns before the
  * partial aggregate: fine for a table of dozens of columns, wrong
  * for hundreds at 100 TB. `exact = false` switches to
  * `approx_count_distinct` (HyperLogLog++, `rsd` ≈ 2.3% by this
  * parameterization): single Expand-free aggregate, constant-size
  * sketch state per column, the profile a production ANALYZE actually
  * runs. Everything else is identical between the modes, and both are
  * one shuffle of one row.
  */
object Profile {

  /** Profile `cols` of `df`: (column, n_rows, n_null, n_distinct,
    * min_str, max_str), one row per column in `cols` order.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true,
              rsd: Double = 0.023): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs: Seq[Column] = cols.flatMap { c =>
      val distinct =
        if (exact) count_distinct(col(c))
        else approx_count_distinct(col(c), rsd)
      Seq(
        count(col(c)).as(s"_nn_$c"),
        distinct.as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    } :+ count(lit(1)).as("_n")
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getAs[Long]("_n")
    cols.map { c =>
      (c, n,
        n - r.getAs[Long](s"_nn_$c"),
        r.getAs[Long](s"_nd_$c"),
        r.getAs[String](s"_mn_$c"),
        r.getAs[String](s"_mx_$c"))
    }.toDF("column", "n_rows", "n_null", "n_distinct", "min_str", "max_str")
  }
}
