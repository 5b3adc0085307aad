package graft

import org.apache.spark.sql.functions._
import graft.operators.{Binning, ScanCorrect}

/** Edge-case pins for the round-6 analysis operators. */
class AnalysisEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("snip on a series shorter than every half-window is the identity") {
    // 5 points, half-windows 8,4,2,1: the 8/4 passes see only null
    // neighbors everywhere; 2/1 clip interior points of a monotone
    // series only if the neighbor average dips below — for a convex
    // rising series the background equals the raw series.
    val pts = Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 400L),
      (1L, 4L, 800L), (1L, 5L, 1600L)).toDF("g", "t", "y0")
      .withColumn("id", col("t"))
    val out = ScanCorrect.snip(pts, col("y0"), Seq(col("g")),
      Seq(col("t"), col("id")), Seq(8, 4, 2, 1), "bg")
    // convex series: (y[i-w]+y[i+w])/2 >= y[i] pointwise, so no clip
    assert(out.filter(col("bg") =!= col("y0")).count() === 0)
  }

  test("snip single-point and two-point groups pass through unchanged") {
    val pts = Seq((1L, 1L, 500L), (2L, 1L, 300L), (2L, 2L, 900L))
      .toDF("g", "t", "y0").withColumn("id", col("t"))
    val out = ScanCorrect.snip(pts, col("y0"), Seq(col("g")),
      Seq(col("t"), col("id")), Seq(8, 4, 2, 1), "bg")
    assert(out.filter(col("bg") =!= col("y0")).count() === 0)
  }

  test("radialProfileSplit conserves total intensity: sum(w·v) = 1e6 · sum(v)") {
    val w = 16; val h = 12
    val pixels = Array.tabulate(w * h)(i => ((i * 7) % 101).toDouble)
    val frames = Seq((0L, w, pixels.toSeq)).toDF("frame", "width", "pixels")
    val prof = Binning.radialProfileSplit(frames, col("frame"), col("width"),
      col("pixels"), cx = w / 2, cy = h / 2)
    val total = prof.agg(sum(col("wv_sum"))).collect()(0).getLong(0)
    val expected = pixels.map(_.toLong).sum * 1000000L
    assert(total === expected, s"split integration must conserve intensity")
    // and the weights themselves account for every pixel exactly once
    val wTot = prof.agg(sum(col("w_tot"))).collect()(0).getLong(0)
    assert(wTot === w.toLong * h * 1000000L)
  }

  test("radialProfileSplit matches hard binning on exact-integer radii") {
    // pixels on the axes have integer radius -> f = 0 -> all weight to
    // the floor ring, matching radialProfile exactly on those rings
    val w = 9; val h = 1 // a single row through the center
    val pixels = Array.tabulate(w)(i => (i + 1).toDouble)
    val frames = Seq((0L, w, pixels.toSeq)).toDF("frame", "width", "pixels")
    val split = Binning.radialProfileSplit(frames, col("frame"), col("width"),
        col("pixels"), cx = 4, cy = 0)
      .select(col("rb"), col("wv_sum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ring 0 holds only the center pixel (value 5): weight 1e6
    assert(split(0L) === 5L * 1000000L)
    // ring 4 holds the two edge pixels (values 1 and 9)
    assert(split(4L) === 10L * 1000000L)
  }

  test("deadtime correction of zero counts is zero; correction is monotone") {
    val df = Seq(0L, 1L, 100L, 10000L, 49002L).toDF("c")
      .select(col("c"), ScanCorrect.deadtimeMicro(col("c"), 10L).as("m"))
      .orderBy("c").collect()
    assert(df(0).getLong(1) === 0L)
    val ms = df.map(_.getLong(1))
    assert(ms.sliding(2).forall(p => p(0) < p(1)), "monotone in counts")
  }
}
