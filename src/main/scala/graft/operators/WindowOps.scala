package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the offline complement of
  * `StreamingOps.sessionize`: a session break is a gap greater than
  * `gap` between consecutive events of a key; the session id is the
  * running count of breaks (classic gaps-and-islands). One window
  * shuffle + one aggregate; sessions of a billion keys form in
  * parallel.
  */
object Sessionize {
  /** @param valueCents exact integer value column (e.g. scale-2
    *                    cents via [[Exact.cents]]) so the per-session
    *                    total is order-independent
    * @param tie unique column making the event order total
    * @return one row per (key, session): session_id (0-based per
    *         key), start/end, event count, exact value total
    */
  def batch(df: DataFrame, key: Column, t: Column, tie: Column,
            valueCents: Column, gap: Long): DataFrame = {
    val pre = df.select(key.as("k"), t.as("_t"), tie.as("_tie"),
      valueCents.as("_v"))
    val w = Window.partitionBy(col("k")).orderBy(col("_t"), col("_tie"))
    pre
      .withColumn("_brk",
        when(col("_t") - lag(col("_t"), 1).over(w) > gap, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("k"), col("session_id"))
      .agg(min(col("_t")).as("t_start"), max(col("_t")).as("t_end"),
        count(lit(1)).as("n_events"), sum(col("_v")).as("total_cents"))
  }
}

/** Ordered per-scan transforms (smoothing, derivative, normalization)
  * — the Spark re-expression of pyspec's scan post-processing
  * (normalize to monitor, smooth, numeric derivative).
  *
  * Determinism: callers pass the FULL ordering (including a unique
  * tiebreak column such as a row id) so repeated runs — and the SQL
  * oracle — order peers identically even with duplicate timestamps.
  *
  * Scale: every op is one window over (key, order) = one shuffle by
  * key + in-partition sort; frames are O(1) rows so executors never
  * buffer a whole scan beyond the sort.
  */
object WindowOps {

  /** Centered moving average of exact-decimal `w` over ±halfWidth rows
    * within each key, ordered by `order` (must be a total order).
    */
  def movingAvg(df: DataFrame, key: Column, order: Seq[Column], w: Column,
                halfWidth: Int, out: String = "ma"): DataFrame = {
    val win = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(-halfWidth, halfWidth)
    // Exact tie-proof rounding (see Exact): frame sum is a scale-2
    // decimal, frame count a small int — the classic rounding-tie case.
    df.withColumn(out,
      Exact.roundedRatio(Exact.cents(sum(w).over(win)),
        count(lit(1)).over(win) * lit(100L), 4))
  }

  /** Discrete derivative d(v)/d(t) within each key ordered by `order`
    * (a total order; `t` in integer microseconds → per second).
    * Rows with no predecessor or with dt = 0 (duplicate timestamps)
    * are dropped — a 0 denominator would otherwise produce ±Inf/NaN
    * which neither engine hashes stably.
    */
  def derivative(df: DataFrame, key: Column, order: Seq[Column], v: Column, tUs: Column,
                 out: String = "deriv"): DataFrame = {
    val win = Window.partitionBy(key).orderBy(order: _*)
    df.withColumn("_dv", v - lag(v, 1).over(win))
      .withColumn("_dt", tUs - lag(tUs, 1).over(win))
      .filter(col("_dt").isNotNull && col("_dt") =!= 0)
      // `+ 0.0` canonicalizes IEEE -0.0 to +0.0 (a tiny negative dv
      // rounds to -0.0, which hashes differently from the oracle's 0.0).
      .withColumn(out, round(col("_dv").cast("double") / (col("_dt") / lit(1000000.0)), 6) + lit(0.0))
      .drop("_dv", "_dt")
  }

  /** Normalize `v` to the group total of exact-decimal `monitor`
    * (pyspec: counts normalized to monitor counts) — one window sum,
    * one shuffle. Groups whose monitor total is NULL/0 yield NULL.
    *
    * With `withError`, also propagates the counting-statistics
    * uncertainty `sqrt(v) / monitor_total` (pyspec norm keeps σ =
    * √N/monitor per point); negative counts yield NULL rather than
    * NaN.
    */
  def normalizeToMonitor(df: DataFrame, key: Column, v: Column, monitor: Column,
                         out: String = "norm", withError: Boolean = false,
                         errOut: String = "norm_err"): DataFrame = {
    val win = Window.partitionBy(key)
    val monTot = sum(monitor).over(win).cast("double")
    val base = df.withColumn(out, round(v.cast("double") / monTot, 6))
    if (!withError) base
    else base.withColumn(errOut,
      when(v >= 0, round(sqrt(v.cast("double")) / monTot, 6)))
  }

  /** Exponentially-weighted moving average per scan: s_0 = y_0,
    * s_i = α·y_i + (1−α)·s_{i−1} — the recursive smoother the window
    * API cannot express (each value depends on the full prefix), so
    * it runs as a typed `mapGroups` pass like the iterative fits:
    * one shuffle, points sorted in-group, O(points-per-scan) memory,
    * parallel across scans. Closed-form reformulations overflow
    * (1−α)^−i for long scans; the linear pass is the numerically
    * sane shape.
    */
  def ewma(df: DataFrame, group: String, x: String, y: String,
           alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha out of (0,1]: $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(group).cast("long").as("g"),
        col(x).cast("double").as("x"), col(y).cast("double").as("y"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val pts = it.toArray.sortBy(p => (p._2, p._3))
        var s = 0.0
        var first = true
        pts.iterator.map { case (_, px, py) =>
          s = if (first) { first = false; py } else alpha * py + (1 - alpha) * s
          (g, px, s)
        }
      }
      .toDF(group, x, "ewma")
  }

  /** Holt linear-trend (double exponential) smoothing — the trend
    * upgrade of [[ewma]]: l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1}),
    * b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}, initialized l₀ = y₀,
    * b₀ = y₁−y₀. Like EWMA the recursion needs the full prefix, so
    * it runs as one `mapGroups` pass per scan: one shuffle,
    * O(points-per-scan) memory, parallel across scans. On an exactly
    * linear series the forecast l+b continues the line exactly for
    * ANY α, β (pinned in StatsEdgeSpec).
    *
    * @return (g, x, level, trend, forecast) — `forecast` is the
    *         one-step-ahead prediction l_t + b_t made AT x
    */
  def holt(df: DataFrame, group: String, x: String, y: String,
           alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha out of (0,1]: $alpha")
    require(beta >= 0 && beta <= 1, s"beta out of [0,1]: $beta")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(group).cast("long").as("g"),
        col(x).cast("double").as("x"), col(y).cast("double").as("y"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val pts = it.toArray.sortBy(p => (p._2, p._3))
        var l = 0.0
        var b = 0.0
        pts.iterator.zipWithIndex.map { case ((_, px, py), i) =>
          if (i == 0) {
            l = py
            b = if (pts.length > 1) pts(1)._3 - py else 0.0
          } else {
            val lPrev = l
            l = alpha * py + (1 - alpha) * (l + b)
            b = beta * (l - lPrev) + (1 - beta) * b
          }
          (g, px, l, b, l + b)
        }
      }
      .toDF(group, x, "level", "trend", "forecast")
  }

  /** Holt–Winters additive seasonal smoothing (triple exponential —
    * Winters 1960) — the seasonal upgrade of [[holt]]:
    *
    *   l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    *   s_t = γ(y_t − l_t) + (1−γ)s_{t−m}
    *
    * with the textbook simple initialization on the first two
    * seasons: l = mean(season 1), b = (mean(season 2) −
    * mean(season 1))/m, s_i = y_i − l. Series shorter than 2m yield
    * no rows (not enough data to initialize a seasonal model —
    * documented contract). On an exactly m-periodic zero-trend
    * series the one-step forecast reproduces the series EXACTLY for
    * any α/β/γ (pinned in AuditEdgeSpec). Same mapGroups shape as
    * [[ewma]]/[[holt]]/[[kalman]]: one shuffle, O(points) per scan.
    *
    * @return (g, x, level, trend, seasonal, forecast) — `seasonal`
    *         is the updated index at x; `forecast` the one-step-ahead
    *         prediction l + b + s_{next}
    */
  def holtWinters(df: DataFrame, group: String, x: String, y: String,
                  m: Int, alpha: Double, beta: Double, gamma: Double): DataFrame = {
    require(m >= 2, s"season length out of range: $m")
    require(alpha > 0 && alpha <= 1, s"alpha out of (0,1]: $alpha")
    require(beta >= 0 && beta <= 1, s"beta out of [0,1]: $beta")
    require(gamma >= 0 && gamma <= 1, s"gamma out of [0,1]: $gamma")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(group).cast("long").as("g"),
        col(x).cast("double").as("x"), col(y).cast("double").as("y"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val pts = it.toArray.sortBy(p => (p._2, p._3))
        if (pts.length < 2 * m) Iterator.empty
        else {
          val mean1 = pts.take(m).map(_._3).sum / m
          val mean2 = pts.slice(m, 2 * m).map(_._3).sum / m
          var l = mean1
          var b = (mean2 - mean1) / m
          val s = Array.tabulate(m)(i => pts(i)._3 - mean1)
          pts.iterator.zipWithIndex.drop(m).map { case ((_, px, py), t) =>
            val si = t % m
            val lPrev = l
            l = alpha * (py - s(si)) + (1 - alpha) * (l + b)
            b = beta * (l - lPrev) + (1 - beta) * b
            s(si) = gamma * (py - l) + (1 - gamma) * s(si)
            (g, px, l, b, s(si), l + b + s((t + 1) % m))
          }
        }
      }
      .toDF(group, x, "level", "trend", "seasonal", "forecast")
  }

  /** Local-level Kalman filter per scan — the OPTIMAL recursive
    * smoother next to [[ewma]]'s fixed-gain one (Kalman 1960;
    * state x_t = x_{t−1} + w, w~N(0,Q); obs y_t = x_t + v, v~N(0,R)):
    *
    *   predict: P ← P + Q
    *   gain:    K = P / (P + R)
    *   update:  l ← l + K·(y − l);  P ← (1 − K)·P
    *
    * initialized l₀ = y₀, P₀ = R (diffuse-ish: first gain = 2Q.. —
    * any P₀ washes out geometrically). The gain ADAPTS: large early
    * (uncertain state), converging to the steady-state EWMA
    * equivalent α* = K∞ — which is why two closed-form pins exist:
    * Q = 0 makes the estimate the exact running MEAN of the prefix
    * (gain 1/t — constant level, every observation equal weight),
    * and R → 0 makes it track y exactly. Like [[ewma]]/[[holt]] the
    * full-prefix recursion is the documented non-window family: one
    * `mapGroups` pass, one shuffle, O(points-per-scan) memory,
    * parallel across scans.
    *
    * @return (g, x, level, gain) — posterior level and the gain K
    *         used at that step
    */
  def kalman(df: DataFrame, group: String, x: String, y: String,
             q: Double, r: Double): DataFrame = {
    require(q >= 0, s"process variance negative: $q")
    require(r > 0, s"observation variance not positive: $r")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(group).cast("long").as("g"),
        col(x).cast("double").as("x"), col(y).cast("double").as("y"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val pts = it.toArray.sortBy(p => (p._2, p._3))
        var l = 0.0
        var p = 0.0
        pts.iterator.zipWithIndex.map { case ((_, px, py), i) =>
          var k = 0.0
          if (i == 0) { l = py; p = r; k = 1.0 }
          else {
            p += q
            k = p / (p + r)
            l += k * (py - l)
            p *= (1 - k)
          }
          (g, px, l, k)
        }
      }
      .toDF(group, x, "level", "gain")
  }

  /** One-sided CUSUM control chart (#180): S_i = max(0, S_{i−1} +
    * (x_i − target)). The recursion is closed-form as the running
    * sum minus its own running minimum — P_i − min(0, min_{j≤i} P_j)
    * with P_i = Σ_{j≤i}(x_j − target) — so the whole chart is two
    * chained window functions sharing ONE key-partitioned shuffle
    * (no mapGroups, no UDAF, exact integers throughout).
    *
    * @param xCents  exact integer reading
    * @param target  exact integer per-row target level (may itself be
    *                a window expression over the same partition)
    * @return input columns + `cusum`
    */
  def cusum(df: DataFrame, key: Seq[Column], order: Seq[Column],
            xCents: Column, target: Column): DataFrame = {
    val wo = Window.partitionBy(key: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_p", sum(xCents - target).over(wo))
      .withColumn("cusum", col("_p") - least(lit(0L), min(col("_p")).over(wo)))
      .drop("_p")
  }

  /** Savitzky–Golay smoothing, 5-point quadratic (the standard
    * scientific scan-smoothing filter — a least-squares parabola
    * through each ±2 neighbourhood, preserving peak height/width
    * far better than a moving average). Coefficients are the exact
    * rationals (−3, 12, 17, 12, −3)/35, so with integer-cents input
    * the convolution numerator is exact integer arithmetic and the
    * single division goes through the tie-proof signed rounding —
    * bit-identical on every engine. Rows without a full window
    * (scan edges) yield NULL, as pyspec's smoothers do. One window
    * shuffle, O(1) frame.
    */
  def savitzkyGolay5(df: DataFrame, key: Column, order: Seq[Column], vCents: Column,
                     out: String = "sg"): DataFrame = {
    val win = Window.partitionBy(key).orderBy(order: _*)
    val num = lag(vCents, 2).over(win) * lit(-3L) +
      lag(vCents, 1).over(win) * lit(12L) +
      vCents * lit(17L) +
      lead(vCents, 1).over(win) * lit(12L) +
      lead(vCents, 2).over(win) * lit(-3L)
    // numerator is cents·35 → dollars = num / 3500, HALF_UP to 4
    df.withColumn(out, Exact.roundedRatioSigned(num, lit(3500L), 4))
  }

  /** Cosmic-ray despiking (synchrotron CCD/point-detector staple): a
    * point is a spike when it deviates from the ROLLING MEDIAN of its
    * ±halfWidth neighbourhood by more than `thrCents` (exact integer
    * cents); spikes are replaced by the rolling median, everything
    * else passes through.
    *
    * Exactness: the window's values are collected as integer cents,
    * sorted, and the median is kept as DOUBLED cents (`med2` = 2× the
    * odd-count middle, or the sum of the two even-count middles) so
    * both the median and the spike test `|2·v − med2| > 2·thr` are
    * pure integer arithmetic — no float crosses the oracle. Partial
    * edge windows use their actual element count. One window shuffle;
    * the frame is O(halfWidth) values per row.
    */
  def despike(df: DataFrame, key: Column, order: Seq[Column], vCents: Column,
              halfWidth: Int, thrCents: Long): DataFrame = {
    val win = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(-halfWidth, halfWidth)
    val sorted = array_sort(collect_list(vCents).over(win))
    val n = size(sorted)
    val half = (n / 2).cast("int")
    val med2 = when(n % 2 === 1, element_at(sorted, ((n + 1) / 2).cast("int")) * 2L)
      .otherwise(element_at(sorted, half) + element_at(sorted, half + 1))
    df.withColumn("_med2", med2)
      .withColumn("is_spike",
        abs(vCents * 2L - col("_med2")) > lit(2L * thrCents))
      .withColumn("roll_med", col("_med2").cast("double") / lit(200.0))
      .withColumn("v_clean",
        when(col("is_spike"), col("_med2").cast("double") / lit(200.0))
          .otherwise(vCents.cast("double") / lit(100.0)))
      .drop("_med2")
  }

  /** Linear background subtraction (pyspec: `bgsub` over a scan): the
    * baseline is the straight line through each group's FIRST and
    * LAST point in `order`; `out` = v − baseline(x). One window over
    * (key, order) with an unbounded frame — still a single shuffle,
    * and the frame is computed once per partition by the sort, not
    * per row.
    *
    * Degenerate single-x groups (x_last == x_first) subtract the
    * first y (flat baseline) — mirrored in SQL oracles via the same
    * CASE. `x`/`v` must be exact (integer/decimal) so the double
    * division below is the ONLY lossy step on either engine.
    */
  def bgSubtract(df: DataFrame, key: Column, order: Seq[Column],
                 x: Column, v: Column, out: String = "v_sub"): DataFrame = {
    val win = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val x0 = first(x).over(win).cast("double")
    val x1 = last(x).over(win).cast("double")
    val y0 = first(v).over(win).cast("double")
    val y1 = last(v).over(win).cast("double")
    val xd = x.cast("double")
    val bg = when(x1 === x0, y0)
      .otherwise(y0 + (y1 - y0) * (xd - x0) / (x1 - x0))
    df.withColumn(out, round(v.cast("double") - bg, 6) + lit(0.0))
  }
}
