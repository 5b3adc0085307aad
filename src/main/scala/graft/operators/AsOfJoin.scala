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
  *
  * Determinism: the right side must be UNIQUE per (key, time) — use
  * [[dedupRight]] first when it is not. With a unique right side the
  * (time, tag) ordering is total for every row that matters: ties can
  * only occur among left rows (which carry no payload and all see the
  * same prefix of right rows, tag 0 sorting first), so the carried
  * value is stable across runs and engines.
  */
object AsOfJoin {

  /** Keep exactly one right row per (key, time): the one with the
    * greatest `tiebreak` (documented winner — matches a SQL
    * `QUALIFY row_number() OVER (... ORDER BY tiebreak DESC) = 1`).
    */
  def dedupRight(right: DataFrame, key: String, timeCol: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key), col(timeCol)).orderBy(col(tiebreak).desc)
    right.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** @param left  rows to enrich; must contain `key`, `timeCol`
    * @param right rows providing the as-of payload: `key`, `timeCol`,
    *              plus `payloadCols` (carried to the left side with
    *              nulls when no right row precedes a left row);
    *              must be unique per (key, timeCol) — see class doc
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

  /** Forward as-of join: for every left row, the EARLIEST right row
    * with rightTime >= leftTime within the same key — the mirror of
    * [[backward]] (e.g. "the next calibration after this reading").
    * Same one-shuffle union shape; the carry runs via
    * `first(..., ignoreNulls)` over a currentRow→following frame,
    * with left rows (tag 0) sorting BEFORE right rows (tag 1) at an
    * equal timestamp so a same-time right row is an eligible match
    * (>= semantics, mirroring backward's <=). Right side must be
    * unique per (key, time) — [[dedupRight]] applies unchanged.
    */
  def forward(left: DataFrame, right: DataFrame, key: String, timeCol: String,
              payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val payload = struct((timeCol +: payloadCols).map(right(_)): _*)
    val taggedRight = right.select(
      Seq(col(key), col(timeCol).as("_t"), lit(1).as("_tag"), payload.as("_p")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(timeCol).as("_t"), lit(0).as("_tag"),
        lit(null).cast(taggedRight.schema("_p").dataType).as("_p")) ++
        leftCols.filterNot(_ == key).map(col): _*)
    val win = Window.partitionBy(col(key)).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("_match", first(col("_p"), ignoreNulls = true).over(win))
    val matched = carried.filter(col("_tag") === 0)
    val outPayload = (timeCol +: payloadCols).map(c =>
      col("_match").getField(c).as(s"right_$c"))
    matched.select(leftCols.map(col) ++ outPayload: _*)
  }
}
