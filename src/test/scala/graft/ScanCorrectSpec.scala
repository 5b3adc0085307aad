package graft

import org.apache.spark.sql.functions._
import graft.operators.{Binning, ScanCorrect}

class ScanCorrectSpec extends SparkSpec {
  import spark.implicits._

  test("deadtimeMicro matches the nonparalyzable closed form on known values") {
    // n_obs = 100 counts (c = 10000 cents), τ = 1e-6·rate (tauE7 = 10):
    // dead fraction = 0.01, n_true = 100/0.99 = 101.0101…
    val df = Seq(10000L, 0L, 49002L).toDF("c")
      .select(ScanCorrect.deadtimeMicro(col("c"), 10L).as("m"),
        ScanCorrect.deadFracPpm(col("c"), 10L).as("ppm"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    // 10000·1e11 div (1e7 − 1e5) = 101010101 µ-counts = 101.010101
    assert(rows(0) === ((101010101L, 10000L)))
    assert(rows(1) === ((0L, 0L)))
    // c = 49002: n = 490.02, dead = 0.049002, n_true = 490.02/0.950998
    val expected = (49002L * 100000000000L) / (10000000L - 490020L)
    assert(rows(2)._1 === expected)
    // correction always increases a positive reading
    assert(rows(2)._1 > 49002L * 10000L)
  }

  test("snip background is ≤ raw everywhere and exact on a flat series") {
    val flat = (1 to 40).map(i => (1L, i.toLong, i.toLong, 500L)).toDF("g", "t", "id", "y0")
    val bgFlat = ScanCorrect.snip(flat, col("y0"), Seq(col("g")),
      Seq(col("t"), col("id")), Seq(8, 4, 2, 1), "bg")
    // a constant series is its own background: the clip never fires
    assert(bgFlat.filter(col("bg") =!= col("y0")).count() === 0)
  }

  test("snip removes an injected peak but keeps the baseline") {
    // baseline 100 with a sharp peak of 5000 at the center
    val pts = (1 to 41).map { i =>
      val y = if (math.abs(i - 21) <= 1) 5000L else 100L
      (1L, i.toLong, i.toLong, y)
    }.toDF("g", "t", "id", "y0")
    val bg = ScanCorrect.snip(pts, col("y0"), Seq(col("g")),
      Seq(col("t"), col("id")), Seq(8, 4, 2, 1), "bg")
      .select(col("t"), col("bg")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // peak center clipped down to the baseline; baseline untouched
    assert(bg(21L) === 100L)
    assert(bg(5L) === 100L)
    assert(bg(40L) === 100L)
    // background never exceeds the raw value by construction
    val bad = ScanCorrect.snip(pts, col("y0"), Seq(col("g")),
      Seq(col("t"), col("id")), Seq(8, 4, 2, 1), "bg")
      .filter(col("bg") > col("y0")).count()
    assert(bad === 0)
  }

  test("snip plans one exchange for all passes (shared window)") {
    val pts = (1 to 40).map(i => (i % 3L, i.toLong, i.toLong, 100L)).toDF("g", "t", "id", "y0")
    val plan = ScanCorrect.snip(pts, col("y0"), Seq(col("g")),
      Seq(col("t"), col("id")), Seq(8, 4, 2, 1), "bg")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one shuffle for the SNIP pyramid, plan:\n$plan")
  }

  test("int8 code arithmetic round-trips exactly at the grid points") {
    // a = k·s/255 for integer k must code to exactly k with zero residual
    val s = 255000L
    val rows = (0 to 255).map(k => (k * (s / 255L), s)).toDF("a", "s")
      .select(Binning.floorDivCol(col("a") * lit(510L) + col("s"), col("s") * lit(2L)).as("code"),
        (col("a") * lit(255L)).as("a255"), col("s"))
      .select(col("code"), (col("a255") - col("code") * col("s")).as("r"))
      .collect()
    rows.zipWithIndex.foreach { case (r, k) =>
      assert(r.getLong(0) === k.toLong)
      assert(r.getLong(1) === 0L)
    }
  }
}
