package graft

import org.apache.spark.sql.functions._
import graft.operators.Calibrate

class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  test("PAVA pools the textbook violator and leaves monotone data alone") {
    // y = [1, 3, 2, 4]: the (3, 2) violation pools to 2.5
    assert(Calibrate.pava(Array(1, 3, 2, 4), Array(1, 1, 1, 1)).toSeq ===
      Seq(1.0, 2.5, 2.5, 4.0))
    // already monotone -> identity
    assert(Calibrate.pava(Array(1, 2, 3), Array(1, 1, 1)).toSeq === Seq(1.0, 2.0, 3.0))
    // strictly decreasing -> one block at the mean
    assert(Calibrate.pava(Array(3, 2, 1), Array(1, 1, 1)).toSeq === Seq(2.0, 2.0, 2.0))
  }

  test("weights shift the pooled mean") {
    // pool of (3 w=3, 1 w=1) -> 2.5
    assert(Calibrate.pava(Array(3, 1), Array(3, 1)).toSeq === Seq(2.5, 2.5))
  }

  test("fitted curve is monotone, preserves weighted mass, beats raw rss") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 200).map { i =>
      val x = i.toDouble
      (1L, x, 0.02 * x + rnd.nextGaussian(), 1.0)
    }.toDF("g", "x", "y", "w")
    val fit = Calibrate.isotonicGroups(pts, "g", "x", "y", "w").collect()
      .sortBy(f => (f.x, f.y))
    // monotone non-decreasing
    assert(fit.sliding(2).forall(p => p(0).yhat <= p(1).yhat + 1e-12))
    // weighted mass preserved (projection property)
    val my = fit.map(f => f.y * f.w).sum
    val mh = fit.map(f => f.yhat * f.w).sum
    assert(math.abs(my - mh) < 1e-6)
    // least-squares: fitted rss <= raw-mean rss
    val mean = my / fit.map(_.w).sum
    val rssFit = fit.map(f => (f.y - f.yhat) * (f.y - f.yhat)).sum
    val rssMean = fit.map(f => (f.y - mean) * (f.y - mean)).sum
    assert(rssFit < rssMean)
  }

  test("distributed fit is deterministic across partitionings") {
    val pts = (1 to 100).map(i => ((i % 4).toLong, (i / 4).toDouble, ((i * 13) % 17).toDouble, 1.0))
      .toDF("g", "x", "y", "w")
    val a = Calibrate.isotonicGroups(pts, "g", "x", "y", "w")
      .collect().sortBy(f => (f.g, f.x, f.y))
    val b = Calibrate.isotonicGroups(pts.repartition(13), "g", "x", "y", "w")
      .collect().sortBy(f => (f.g, f.x, f.y))
    assert(a.toSeq === b.toSeq)
  }
}
