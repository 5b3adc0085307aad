package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Isotonic regression (pool-adjacent-violators, PAVA) — the standard
  * score-calibration step of a quality/relevance classifier (Zadrozny
  * & Elkan 2002: map raw model scores to monotone probabilities).
  * pyspec's fitting family covers parametric shapes; this is the
  * non-parametric monotone one.
  *
  * Execution model: `groupByKey(model).mapGroups` — one calibration
  * curve per group fits on one core in O(n) after an O(n log n)
  * sort (same contract as [[GaussFit]]); a thousand models calibrate
  * in parallel with one shuffle. Deterministic: points sort by
  * (x, y, w) and PAVA's left-to-right pooling is order-defined.
  */
object Calibrate {

  final case class CPoint(g: Long, x: Double, y: Double, w: Double)
  final case class CFit(g: Long, x: Double, y: Double, w: Double, yhat: Double)

  /** Weighted PAVA over points already sorted by x (ties by y): the
    * unique monotone-nondecreasing least-squares fit. Returns fitted
    * values aligned with the input order.
    */
  def pava(ys: Array[Double], ws: Array[Double]): Array[Double] = {
    val n = ys.length
    if (n == 0) return Array.empty
    // blocks as (mean, weight, count) merged left-to-right
    val mean = new Array[Double](n)
    val wt = new Array[Double](n)
    val cnt = new Array[Int](n)
    var m = 0 // number of blocks
    var i = 0
    while (i < n) {
      mean(m) = ys(i); wt(m) = ws(i); cnt(m) = 1
      m += 1
      // merge while monotonicity is violated
      while (m > 1 && mean(m - 2) > mean(m - 1)) {
        val w2 = wt(m - 2) + wt(m - 1)
        mean(m - 2) = (mean(m - 2) * wt(m - 2) + mean(m - 1) * wt(m - 1)) / w2
        wt(m - 2) = w2
        cnt(m - 2) += cnt(m - 1)
        m -= 1
      }
      i += 1
    }
    val out = new Array[Double](n)
    var b = 0; var k = 0
    while (b < m) {
      var j = 0
      while (j < cnt(b)) { out(k) = mean(b); k += 1; j += 1 }
      b += 1
    }
    out
  }

  /** Per-group isotonic fit over (group, x, y, weight) columns:
    * returns every point with its fitted `yhat`. */
  def isotonicGroups(df: DataFrame, group: String, x: String, y: String,
                     w: String): Dataset[CFit] = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(col(group).cast("long").as("g"),
      col(x).cast("double").as("x"), col(y).cast("double").as("y"),
      col(w).cast("double").as("w")).as[CPoint]
    pts.groupByKey(_.g).flatMapGroups { (g, it) =>
      val arr = it.toArray.sortBy(p => (p.x, p.y, p.w))
      val fit = pava(arr.map(_.y), arr.map(_.w))
      arr.indices.iterator.map(i => CFit(g, arr(i).x, arr(i).y, arr(i).w, fit(i)))
    }
  }
}
