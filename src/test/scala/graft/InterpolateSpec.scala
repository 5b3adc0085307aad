package graft

import org.apache.spark.sql.functions._
import graft.operators.Interpolate

class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val samples = Seq(
    (1L, 0L, 10.0), (1L, 10L, 20.0), (1L, 20L, 40.0),
    (2L, 5L, 1.0), (2L, 15L, 3.0)).toDF("g", "x", "y")

  test("midpoints interpolate linearly; exact hits return the sample") {
    val out = Interpolate.onGrid(samples, Seq("g"), col("x"), col("y"),
        x0 = 0L, dx = 5L, n = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 0L)) == 10.0) // exact hit
    assert(out((1L, 5L)) == 15.0) // midpoint of 10..20
    assert(out((1L, 10L)) == 20.0)
    assert(out((1L, 15L)) == 30.0) // midpoint of 20..40
    assert(out((1L, 20L)) == 40.0)
    assert(out((2L, 10L)) == 2.0) // group 2 midpoint
  }

  test("grid points outside the sampled range drop out") {
    val out = Interpolate.onGrid(samples, Seq("g"), col("x"), col("y"),
        x0 = 0L, dx = 5L, n = 5)
      .filter(col("g") === 2).collect().map(_.getLong(1)).sorted
    // group 2 samples span [5, 15]: grid 0 and 20 are out of range
    assert(out.toSeq == Seq(5L, 10L, 15L))
  }
}
