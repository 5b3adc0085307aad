package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Peak statistics & closed-form fits over scan points — the Spark
  * re-expression of pyspec's `peakguess`/linear-fit routines
  * (reference: pyspec `fit.py` peak-parameter estimation from
  * weighted moments).
  *
  * Numerical strategy (SURVEY.md §4): callers pass EXACT columns
  * (decimal weights, decimal/int abscissae) so the power sums are
  * order-independent — a 1000-executor shuffle reduces to the same
  * bits as a single-threaded oracle. All lossy floating math happens
  * on the already-reduced scalars, with the exact same expression
  * tree as the SQL oracle so doubles match bit-for-bit.
  *
  * Scale: each operator is one hash aggregate with map-side partial
  * combine; no windows, no driver collection. Groups never need to be
  * memory-resident (unlike an iterative fitter) because the moments
  * are streaming-computable.
  */
object PeakAnalysis {
  /** 2*sqrt(2*ln 2): FWHM of a gaussian from its sigma. */
  val FwhmFactor = 2.3548200450309493

  /** Weighted peak moments per group: center of mass, gaussian-
    * equivalent FWHM from the second central moment, height
    * (max weight), and total weight.
    *
    * @param x EXACT integer/decimal abscissa column, small enough that
    *          w*x*x stays inside decimal(38) (e.g. seconds relative to
    *          a fixed epoch as decimal(8,0))
    * @param w EXACT decimal weight column (e.g. detector counts as
    *          decimal(18,2))
    */
  def peakMoments(df: DataFrame, groupCols: Seq[String], x: Column, w: Column): DataFrame = {
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(w).as("sum_w"),
      sum(w * x).as("sum_wx"),
      sum(w * x * x).as("sum_wx2"),
      max(w).as("max_w"))
    val sumW = col("sum_w").cast("double")
    val com = col("sum_wx").cast("double") / sumW
    val ex2 = col("sum_wx2").cast("double") / sumW
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        round(sumW, 2).as("w_total"),
        round(col("max_w").cast("double"), 2).as("height"),
        // Exact tie-proof rounding: com = sum_wx/sum_w on integer cents.
        Exact.roundedRatio(Exact.cents(col("sum_wx")), Exact.cents(col("sum_w")), 4).as("com"),
        round(lit(FwhmFactor) * sqrt(greatest(ex2 - com * com, lit(0.0))), 4).as("fwhm")): _*)
  }

  /** Closed-form least-squares line y = slope*x + intercept per group,
    * from exact sums (Sx, Sy, Sxy, Sxx). `x` and `y` must be exact
    * (decimal/integer) columns — see class doc.
    */
  def linReg(df: DataFrame, groupCols: Seq[String], x: Column, y: Column): DataFrame = {
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(x).as("s_x"),
      sum(y).as("s_y"),
      sum(y * x).as("s_xy"),
      sum(x * x).as("s_xx"))
    val nd = col("n").cast("double")
    val sx = col("s_x").cast("double")
    val sy = col("s_y").cast("double")
    val sxy = col("s_xy").cast("double")
    val sxx = col("s_xx").cast("double")
    val den = nd * sxx - sx * sx
    val slope = (nd * sxy - sx * sy) / den
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        // `+ 0.0` canonicalizes IEEE -0.0 to +0.0 so a tiny negative
        // slope hashes identically to the oracle's 0.0.
        (round(when(den =!= 0.0, slope), 6) + lit(0.0)).as("slope"),
        (round(when(den =!= 0.0, (sy - slope * sx) / nd), 6) + lit(0.0)).as("intercept")): _*)
  }

  /** Weighted least-squares line fit per group — pyspec's `fit.py`
    * weights every point by its counting-statistics error (w = 1/σ²),
    * so the unweighted [[linReg]] is only the equal-exposure special
    * case. Same closed-form single-aggregate shape with the five
    * weighted power sums:
    *
    *   slope = (Sw·Swxy − Swx·Swy) / (Sw·Swxx − Swx²),
    *   intercept = (Swy − slope·Swx) / Sw
    *
    * `w` must be an exact-decimal (or integer) column so the
    * distributed sums stay order-independent; the closed form goes
    * through doubles only at the end (round 6, both engines).
    */
  def wLinReg(df: DataFrame, groupCols: Seq[String], x: Column, y: Column,
              w: Column): DataFrame = {
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(w).as("s_w"),
      sum(w * x).as("s_wx"),
      sum(w * y).as("s_wy"),
      sum(w * y * x).as("s_wxy"),
      sum(w * x * x).as("s_wxx"))
    val sw = col("s_w").cast("double")
    val swx = col("s_wx").cast("double")
    val swy = col("s_wy").cast("double")
    val swxy = col("s_wxy").cast("double")
    val swxx = col("s_wxx").cast("double")
    val den = sw * swxx - swx * swx
    val slope = (sw * swxy - swx * swy) / den
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        (round(when(den =!= 0.0, slope), 6) + lit(0.0)).as("slope"),
        (round(when(den =!= 0.0, (swy - slope * swx) / sw), 6) + lit(0.0)).as("intercept")): _*)
  }

  /** Streaming-computable per-group summary (n/sum/mean/std/min/max)
    * with the sample std derived from exact power sums. Singleton
    * groups yield NULL std (matching SQL `stddev_samp`), not NaN.
    */
  def groupStats(df: DataFrame, groupCols: Seq[String], w: Column): DataFrame = {
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(w).as("sum_w"),
      sum(w * w).as("sum_w2"),
      min(w).as("min_w"),
      max(w).as("max_w"))
    val nd = col("n").cast("double")
    val s1 = col("sum_w").cast("double")
    val s2 = col("sum_w2").cast("double")
    val variance = (s2 - s1 * s1 / nd) / (nd - lit(1.0))
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        round(s1, 2).as("v_sum"),
        // Exact tie-proof rounding: mean = sum/n on integer cents.
        Exact.roundedRatio(Exact.cents(col("sum_w")), col("n") * lit(100L), 4).as("v_mean"),
        round(when(col("n") > 1, sqrt(greatest(variance, lit(0.0)))), 4).as("v_std"),
        round(col("min_w").cast("double"), 2).as("v_min"),
        round(col("max_w").cast("double"), 2).as("v_max")): _*)
  }
}
