package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Banded dynamic time warping — the alignment distance for series
  * that drift in PHASE, where #149's cross-correlation only handles a
  * rigid shift (a scan that runs 10% slow matches itself under DTW
  * but decorrelates under any single lag).
  *
  * Scale shape: one task per (series, reference) pair via a typed map
  * over pre-aggregated series rows — a billion series parallelize
  * across the cluster, each costing O(n·w) time and O(w) memory with
  * the Sakoe–Chiba band |i−j| ≤ w (the band is also the standard
  * accuracy/runtime knob: w = full length degrades to exact O(n²)
  * DTW). The reference series attaches as a single-row broadcast
  * (bounded by the time-grid span, like the dark-frame scalar).
  *
  * All costs are exact integer |a−b| sums on cents — deterministic
  * across engines, partitionings and reruns.
  */
object Dtw {

  /** Exact banded DTW distance between two integer series. Band
    * width `w` is clamped to at least |n−m| (otherwise no warping
    * path exists). Empty series → -1 (no path; callers treat it as
    * a sentinel, never a distance).
    */
  def distance(a: Array[Long], b: Array[Long], w: Int): Long = {
    val (n, m) = (a.length, b.length)
    if (n == 0 || m == 0) return -1L
    val band = math.max(w, math.abs(n - m))
    val Inf = Long.MaxValue / 4
    // two rolling rows of the DP table, band-limited
    var prev = Array.fill(m + 1)(Inf)
    var cur = Array.fill(m + 1)(Inf)
    prev(0) = 0L
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, Inf)
      val jLo = math.max(1, i - band)
      val jHi = math.min(m, i + band)
      var j = jLo
      while (j <= jHi) {
        val cost = math.abs(a(i - 1) - b(j - 1))
        val best = math.min(math.min(prev(j), cur(j - 1)), prev(j - 1))
        if (best < Inf) cur(j) = cost + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) >= Inf) -1L else prev(m)
  }

  /** Per-group DTW against a broadcast reference: `series` must have
    * (key, ys: array<long>) rows — one pre-aggregated series per key
    * — and `ref` ONE row with (ref_ys: array<long>). Output:
    * (key, n_points, dtw_cents).
    */
  def vsReference(series: DataFrame, ref: DataFrame, w: Int): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    val joined: Dataset[(Long, Seq[Long], Seq[Long])] =
      Curation.withStats(series, ref)
        .select(col("key").cast("long"), col("ys"), col("ref_ys"))
        .as[(Long, Seq[Long], Seq[Long])]
    joined.map { case (k, ys, refYs) =>
      (k, ys.length.toLong, distance(ys.toArray, refYs.toArray, w))
    }.toDF("key", "n_points", "dtw_cents")
  }
}
