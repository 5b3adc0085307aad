package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-scan spectral analysis — the periodicity view of a scan/series
  * (pyspec users plot power spectra of noisy motor scans; a pipeline
  * uses the same shape to find diurnal/weekly cycles in event
  * streams).
  *
  * A full FFT needs the whole series in one place anyway (per-scan,
  * not per-corpus), so this runs as the same typed `mapGroups` shape
  * as the iterative fits: one shuffle keyed by scan, O(n·k) work and
  * O(n) memory per scan, parallel across a billion scans. Doubles
  * are fine here (sums of products in scan-local order — the sort
  * pins the order, so results are deterministic run-to-run and
  * machine-to-machine under IEEE).
  */
object Spectral {

  /** Discrete periodogram at integer frequencies 1..kMax: power_k =
    * (Σ y·cos(2πkt/n))² + (Σ y·sin(2πkt/n))² over the MEAN-REMOVED
    * series (so power at k=0 doesn't leak into low frequencies).
    * `t` is the 0-based position in the ordered series, n its
    * length. Returns (g, k, n, power).
    */
  def periodogram(df: DataFrame, group: Column, order: Column, y: Column,
                  kMax: Int): DataFrame = {
    require(kMax >= 1, s"kMax out of range: $kMax")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(group.cast("long").as("g"), order.cast("double").as("o"),
        y.cast("double").as("y"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val ys = it.toArray.sortBy(p => (p._2, p._3)).map(_._3)
        val n = ys.length
        val mean = ys.sum / n
        val c = ys.map(_ - mean)
        (1 to math.min(kMax, n / 2)).iterator.map { k =>
          var re = 0.0
          var im = 0.0
          var t = 0
          while (t < n) {
            val ph = 2.0 * math.Pi * k * t / n
            re += c(t) * math.cos(ph)
            im -= c(t) * math.sin(ph)
            t += 1
          }
          (g, k, n.toLong, re * re + im * im)
        }
      }
      .toDF("g", "k", "n", "power")
  }
}
