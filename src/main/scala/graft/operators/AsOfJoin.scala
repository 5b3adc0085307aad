package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the most recent right row
  * with rightTime <= leftTime within the same key.
  *
  * Implemented as union + carry-forward window rather than a range
  * join: both sides are tagged, unioned, shuffled ONCE on the key and
  * sorted by (time, tag); a running `last(..., ignoreNulls)` carries
  * the latest right-side payload forward. At 100 TB this is one
  * shuffle and never materializes candidate pairs (a range join would
  * explode quadratically on hot keys); AQE handles key skew.
  */
object AsOfJoin {

  /** @param left  rows to enrich; must contain `key`, `timeCol`
    * @param right rows providing the as-of payload: `key`, `timeCol`,
    *              plus `payloadCols` (carried to the left side with
    *              nulls when no right row precedes a left row)
    */
  def backward(left: DataFrame, right: DataFrame, key: String, timeCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val payload = struct((timeCol +: payloadCols).map(right(_)): _*)
    val taggedRight = right.select(
      Seq(col(key), col(timeCol).as("_t"), lit(0).as("_tag"), payload.as("_p")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(timeCol).as("_t"), lit(1).as("_tag"),
        lit(null).cast(taggedRight.schema("_p").dataType).as("_p")) ++
        leftCols.filterNot(_ == key).map(col): _*)
    val win = Window.partitionBy(col(key)).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("_match", last(col("_p"), ignoreNulls = true).over(win))
    val matched = carried.filter(col("_tag") === 1)
    val outPayload = (timeCol +: payloadCols).map(c =>
      col("_match").getField(c).as(s"right_$c"))
    matched.select(leftCols.map(col) ++ outPayload: _*)
  }
}
