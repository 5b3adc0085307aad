package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scan-level conveniences over spec DataFrames — the pyspec
  * `SpecScan` surface that isn't just a filter.
  */
object SpecOps {

  /** pyspec scan concatenation (`sd[15] + sd[16]`): present several
    * source scans as ONE logical scan with contiguous point numbers,
    * e.g. to fit a lineshape across segmented acquisitions. Points
    * renumber in (file, scan, point) order.
    *
    * Scale note: the input is a user-selected handful of scans (the
    * pyspec idiom concatenates two or three), so the single-partition
    * renumbering window is the right tool; do not feed it a corpus.
    */
  def concatScans(scans: DataFrame, newScan: Long): DataFrame = {
    val w = Window.orderBy(col("file"), col("scan"), col("point"))
    scans
      .withColumn("point", (row_number().over(w) - 1).cast("long"))
      .withColumn("scan", lit(newScan))
      .drop("file").withColumn("file", lit(s"concat-$newScan"))
  }
}
