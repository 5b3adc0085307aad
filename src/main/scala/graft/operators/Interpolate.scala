package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 1-D linear interpolation of irregular (x, y) samples onto a
  * regular per-group grid — the reference's scan-alignment primitive
  * (resample scans onto a common abscissa before comparing or
  * averaging them).
  *
  * Plan: grid rows (one `sequence` explode per group) union the data
  * rows, then ONE window shuffle per group ordered by (x, tag)
  * computes the bracketing sample on each side (`last`/`first` with
  * ignoreNulls over the preceding/following frames — the same
  * carry-forward trick as [[AsOfJoin]], run in both directions in a
  * single sort). Interpolation is one lerp expression; grid points
  * outside the sampled range drop out. No joins, no per-group
  * collection — a billion scans interpolate as one shuffle.
  *
  * Determinism: at equal x the data row sorts before the grid row
  * (tag 0 < 1), so an exactly-hit sample becomes the backward
  * bracket (`x_prev == grid_x`) and the lerp short-circuits to
  * `y_prev` — exact hits work at both range boundaries. Duplicate
  * data x ties break by y in the window ordering (largest y wins).
  */
object Interpolate {

  /** @param keys  group columns (names)
    * @param x     sample abscissa (cast to long — e.g. ts_us)
    * @param y     sample value (cast to double)
    * @param x0,dx,n  the regular grid x0 + i*dx, i in [0, n)
    * @return keys :+ (grid_x long, y_interp double), interpolable
    *         grid points only
    */
  def onGrid(df: DataFrame, keys: Seq[String], x: Column, y: Column,
             x0: Long, dx: Long, n: Int): DataFrame = {
    val kc = keys.map(col)
    val data = df.select(kc :+ x.cast("long").as("_x") :+ y.cast("double").as("_y"): _*)
      .withColumn("_tag", lit(0))
    val grid = df.select(kc: _*).distinct()
      .select(kc :+ explode(sequence(lit(0L), lit(n - 1L))).as("_i"): _*)
      .select(kc :+ (lit(x0) + col("_i") * lit(dx)).as("_x"): _*)
      .withColumn("_y", lit(null).cast("double"))
      .withColumn("_tag", lit(1))
    val ord = Seq(col("_x"), col("_tag"), col("_y"))
    val wBack = Window.partitionBy(kc: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(kc: _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val sampleX = when(col("_tag") === 0, col("_x"))
    val sampleY = when(col("_tag") === 0, col("_y"))
    val br = data.unionByName(grid)
      .withColumn("_px", last(sampleX, ignoreNulls = true).over(wBack))
      .withColumn("_py", last(sampleY, ignoreNulls = true).over(wBack))
      .withColumn("_nx", first(sampleX, ignoreNulls = true).over(wFwd))
      .withColumn("_ny", first(sampleY, ignoreNulls = true).over(wFwd))
      .filter(col("_tag") === 1 && col("_px").isNotNull &&
        (col("_px") === col("_x") || col("_nx").isNotNull))
    val lerp = when(col("_px") === col("_x"), col("_py"))
      .otherwise(col("_py") + (col("_ny") - col("_py")) *
        ((col("_x") - col("_px")).cast("double") / (col("_nx") - col("_px")).cast("double")))
    br.select(kc :+ col("_x").as("grid_x") :+ (lerp + lit(0.0)).as("y_interp"): _*)
  }

  /** DuckDB SQL mirror of [[onGrid]] over a table `tbl` with key
    * column `key`, abscissa expression `xSql`, value `ySql`. */
  def onGridSql(tbl: String, key: String, xSql: String, ySql: String,
                x0: Long, dx: Long, n: Int): String =
    s"""WITH pts AS (SELECT $key, CAST($xSql AS BIGINT) AS _x,
       |    CAST($ySql AS DOUBLE) AS _y, 0 AS _tag FROM $tbl),
       |grid AS (SELECT $key, $x0 + i * ${dx}::BIGINT AS _x,
       |    CAST(NULL AS DOUBLE) AS _y, 1 AS _tag
       |  FROM (SELECT DISTINCT $key FROM $tbl), range($n) AS r(i)),
       |u AS (SELECT * FROM pts UNION ALL SELECT * FROM grid),
       |br AS (SELECT $key, _x, _tag,
       |    last_value(CASE WHEN _tag = 0 THEN _x END IGNORE NULLS)
       |      OVER w_back AS _px,
       |    last_value(CASE WHEN _tag = 0 THEN _y END IGNORE NULLS)
       |      OVER w_back AS _py,
       |    first_value(CASE WHEN _tag = 0 THEN _x END IGNORE NULLS)
       |      OVER w_fwd AS _nx,
       |    first_value(CASE WHEN _tag = 0 THEN _y END IGNORE NULLS)
       |      OVER w_fwd AS _ny
       |  FROM u
       |  WINDOW
       |    w_back AS (PARTITION BY $key ORDER BY _x, _tag, _y
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    w_fwd AS (PARTITION BY $key ORDER BY _x, _tag, _y
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT $key, _x AS grid_x,
       |  (CASE WHEN _px = _x THEN _py
       |        ELSE _py + (_ny - _py) *
       |          (CAST(_x - _px AS DOUBLE) / CAST(_nx - _px AS DOUBLE)) END)
       |    + 0.0 AS y_interp
       |FROM br
       |WHERE _tag = 1 AND _px IS NOT NULL AND (_px = _x OR _nx IS NOT NULL)""".stripMargin
}
