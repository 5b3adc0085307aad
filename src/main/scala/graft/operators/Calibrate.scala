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

  /** Platt scaling (Platt 1999): fit P(y=1 | s) = σ(a·s + b) by
    * Newton-Raphson on BUCKET-AGGREGATED sufficient statistics —
    * the parametric calibration next to [[isotonicGroups]]'s
    * monotone one. `stats` = (score, n, pos) per distinct score
    * bucket, VALUE-COLLAPSED upstream so it is bounded by the score
    * domain (deciles/value grid) at any corpus size; the fit itself
    * runs on the driver over those few rows (the IvfIndex/
    * QualityClassifier model-state discipline — sufficient
    * statistics cross the wire, never data). Deterministic: fixed
    * iteration count, fixed fold order, pure double arithmetic on
    * driver; Levenberg damping keeps the 2×2 Newton solve stable on
    * separable data. Scores are expected in [0, 1]-ish units
    * (e.g. ppm/1e6); returns (a, b).
    */
  def plattFit(stats: Seq[(Double, Long, Long)], iters: Int = 50): (Double, Double) = {
    // Platt's target smoothing: t+ = (Np+1)/(Np+2), t- = 1/(Nn+2)
    val np = stats.map(_._3).sum.toDouble
    val nn = stats.map(s => s._2 - s._3).sum.toDouble
    val tPos = (np + 1.0) / (np + 2.0)
    val tNeg = 1.0 / (nn + 2.0)
    var a = 0.0; var b = math.log((np + 1.0) / (nn + 1.0))
    var it = 0
    while (it < iters) {
      var g1 = 0.0; var g2 = 0.0 // gradient wrt a, b
      var h11 = 1e-12; var h12 = 0.0; var h22 = 1e-12 // damped Hessian
      stats.foreach { case (s, n, pos) =>
        val p = 1.0 / (1.0 + math.exp(-(a * s + b)))
        val w = p * (1.0 - p)
        // pos rows have target tPos, (n - pos) rows target tNeg
        val gRow = pos * (p - tPos) + (n - pos) * (p - tNeg)
        g1 += gRow * s; g2 += gRow
        h11 += n * w * s * s; h12 += n * w * s; h22 += n * w
      }
      val det = h11 * h22 - h12 * h12
      if (det > 0) {
        a -= (h22 * g1 - h12 * g2) / det
        b -= (h11 * g2 - h12 * g1) / det
      }
      it += 1
    }
    (a, b)
  }
}
