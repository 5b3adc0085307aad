package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Detector-signal correction operators from the scan-analysis
  * playbook, kept in EXACT integer arithmetic on the comparison
  * surface (SURVEY.md §4):
  *
  *  - [[deadtimeMicro]] — nonparalyzable detector deadtime correction
  *    (pyspec counter correction; Knoll, "Radiation Detection and
  *    Measurement" §4.7: n_true = n_obs / (1 − n_obs·τ)). With counts
  *    carried as exact integer cents the whole correction is one
  *    integer floor-division per row — bit-identical on every engine,
  *    zero shuffle.
  *
  *  - [[snip]] — SNIP-style iterative background estimation (Ryan et
  *    al. 1988, the standard XRF/powder background peeler): p clipping
  *    passes with shrinking half-windows, each pass replacing y(x) by
  *    min(y(x), (y(x−w)+y(x+w))/2). Division by 2 on integer cents is
  *    floor-division — exact cross-engine. All passes share ONE
  *    (scan)-partitioned ordered window, so the whole pyramid costs a
  *    single shuffle and p in-partition passes: at 100 TB each scan's
  *    points co-locate once and the iteration never re-exchanges.
  *    (The classical LLS pre-transform is omitted deliberately: it
  *    needs libm ln/sqrt INSIDE the iteration, which would break
  *    exact-integer portability; on count data the plain clip is the
  *    textbook variant.)
  */
object ScanCorrect {

  /** Corrected counts in exact integer MICRO-counts from observed
    * integer cents (c = 100·n_obs): the nonparalyzable model
    *
    *   n_true = n_obs / (1 − n_obs·τ)
    *
    * with per-unit-rate deadtime τ = `tauE7`/1e7, evaluated as
    * `c·1e11 div (1e7 − c·tauE7)` — one integer floor-division,
    * identical on every engine (n_obs·τ = c·tauE7/1e7). Caller
    * guarantees `c·tauE7 < 1e7` (dead fraction < 100%); for the test
    * tables (c ≤ 49002, tauE7 = 10) that holds with huge margin, and
    * `c·1e11` stays far below 2^63.
    */
  def deadtimeMicro(cents: Column, tauE7: Long): Column =
    Binning.floorDivCol(cents * lit(100000000000L),
      lit(10000000L) - cents * lit(tauE7))

  /** DuckDB mirror of [[deadtimeMicro]] over a BIGINT cents fragment. */
  def deadtimeMicroSql(cents: String, tauE7: Long): String =
    s"((($cents) * 100000000000) // (10000000 - ($cents) * $tauE7))"

  /** Observed dead-time fraction in ppm: n_obs·τ·1e6 = c·tauE7 div 10. */
  def deadFracPpm(cents: Column, tauE7: Long): Column =
    Binning.floorDivCol(cents * lit(tauE7), lit(10L))

  /** DuckDB mirror of [[deadFracPpm]]. */
  def deadFracPpmSql(cents: String, tauE7: Long): String =
    s"((($cents) * $tauE7) // 10)"

  /** SNIP background over a nonnegative integer-cents column: appends
    * `bgCol` holding the clipped background after one pass per
    * half-window in `widths` (classically decreasing, e.g. 8,4,2,1).
    * Points within a half-window of either series edge keep their
    * running value for that pass (the null-neighbor guard), matching
    * the standard implementation. One shuffle total: every pass
    * reuses the same (partition, order) window, so Spark plans a
    * single exchange + sort and p in-partition Window passes.
    */
  def snip(df: DataFrame, y: Column, part: Seq[Column], order: Seq[Column],
           widths: Seq[Int], bgCol: String): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    val init = df.withColumn(bgCol, y)
    widths.foldLeft(init) { (acc, h) =>
      val mid = Binning.floorDivCol(
        lag(col(bgCol), h).over(w) + lead(col(bgCol), h).over(w), lit(2L))
      acc.withColumn(bgCol, least(col(bgCol), coalesce(mid, col(bgCol))))
    }
  }

  /** DuckDB mirror of [[snip]] as a chain of CTE window passes.
    * `base` must select `partCols`, `orderCols` and a nonnegative
    * integer `y0` column. Returns the CTE list `s0 AS (…), s1 AS (…),
    * …` where `s<widths.size>` exposes every base column plus the
    * background as `y<widths.size>`; the caller writes
    * `WITH <this> SELECT … FROM s<widths.size>`.
    */
  def snipSqlCtes(base: String, partCols: String, orderCols: String,
                  widths: Seq[Int]): String = {
    val passes = widths.zipWithIndex.map { case (h, i) =>
      s"""s${i + 1} AS (SELECT *, least(y$i,
         |  coalesce((lag(y$i, $h) OVER w + lead(y$i, $h) OVER w) // 2, y$i)) AS y${i + 1}
         |  FROM s$i WINDOW w AS (PARTITION BY $partCols ORDER BY $orderCols))""".stripMargin
    }
    s"""s0 AS ($base),
       |${passes.mkString(",\n")}""".stripMargin
  }
}
