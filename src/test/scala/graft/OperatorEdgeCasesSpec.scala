package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators._

/** Edge cases called out by the round-1 review: singleton-group std,
  * duplicate-timestamp derivatives, degenerate histogram ranges,
  * negative floor division, rounding ties, as-of determinism, and
  * salted-vs-direct top-k equivalence.
  */
class OperatorEdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("fitters survive empty and sub-minimal inputs with NaN results") {
    val f0 = graft.operators.GaussFit.fitArrays(1L, Array.empty, Array.empty)
    assert(f0.n == 0 && !f0.converged && f0.height.isNaN && f0.esd_height.isNaN)
    val l0 = graft.operators.LineshapeFit.fitArrays(
      graft.operators.LineshapeFit.Lorentzian, 1L, Array.empty, Array.empty)
    assert(l0.n == 0 && !l0.converged)
    val f2 = graft.operators.GaussFit.fitArrays(2L, Array(1.0, 2.0), Array(3.0, 4.0))
    assert(f2.n == 2 && !f2.converged) // under the 5-point minimum
    assert(f2.esd_height.isNaN) // no esd from a degenerate fit
  }

  test("groupStats: singleton group yields NULL std, not NaN/0") {
    val df = Seq(("a", 1.5), ("b", 2.0), ("b", 4.0)).toDF("k", "v")
    val out = PeakAnalysis.groupStats(df, Seq("k"), col("v").cast("decimal(18,2)"))
      .orderBy("k").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("v_std")))
    assert(math.abs(out(1).getDouble(out(1).fieldIndex("v_std")) - 1.4142) < 1e-9)
  }

  test("derivative: duplicate timestamps are dropped, not Inf/NaN") {
    val df = Seq(("a", 1000000L, 1.0), ("a", 1000000L, 2.0), ("a", 3000000L, 5.0))
      .toDF("k", "t_us", "v")
    val out = WindowOps.derivative(df, col("k"), Seq(col("t_us"), col("v")),
      col("v").cast("decimal(18,2)"), col("t_us"))
    val rows = out.select("deriv").as[Double].collect()
    assert(rows.length == 1) // the duplicate-ts row vanished
    assert(math.abs(rows(0) - 1.5) < 1e-9) // (5-2)/2s
  }

  test("histogram: degenerate range lands all rows in bin 0") {
    val df = Seq(7.5, 7.5, 7.5).toDF("v")
    val out = Binning.histogram(df, col("v"), 10).collect()
    assert(out.length == 1 && out(0).getLong(0) == 0L && out(0).getLong(1) == 3L)
  }

  test("floorDiv floors toward -inf for negative values") {
    val df = Seq(-7L, -5L, -1L, 0L, 1L, 5L, 7L).toDF("x")
    val out = df.select(Binning.floorDiv(col("x"), 5L)).as[Long].collect().toSeq
    assert(out == Seq(-2L, -1L, -1L, 0L, 0L, 1L, 1L))
  }

  test("Exact.roundedRatio: resolves the .5 tie HALF_UP (3118.29/56)") {
    val df = Seq((BigDecimal("3118.29"), 56L)).toDF("s", "n")
    val v = df.select(Exact.roundedRatio(Exact.cents(col("s")), col("n") * lit(100L), 4))
      .as[Double].head()
    assert(v == 55.6838) // exact quotient 55.68375 -> HALF_UP
  }

  test("as-of join: matches latest right <= left, null when none") {
    val left = Seq((1L, 100L, "l1"), (1L, 250L, "l2"), (2L, 50L, "lx"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (2L, 60L, 30.0))
      .toDF("k", "t", "p")
    val out = AsOfJoin.backward(left, right, "k", "t", Seq("p"))
      .orderBy("k", "t").collect()
    assert(out(0).getDouble(out(0).fieldIndex("right_p")) == 10.0) // t=100 matches right t=100
    assert(out(1).getDouble(out(1).fieldIndex("right_p")) == 20.0)
    assert(out(2).isNullAt(out(2).fieldIndex("right_p"))) // right t=60 > left t=50
  }

  test("topKPerGroupSalted equals the direct single-window ranking") {
    val df = (1 to 500).map(i => (s"g${i % 7}", i * 31 % 101, i.toLong)).toDF("g", "v", "id")
    val direct = Relational.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id")), 5)
      .select("g", "v", "id", "rnk").orderBy("g", "rnk").collect().toSeq
    val salted = Relational.topKPerGroupSalted(df, Seq(col("g")),
      Seq(col("v").desc, col("id")), 5, col("id"))
      .select("g", "v", "id", "rnk").orderBy("g", "rnk").collect().toSeq
    assert(direct == salted)
  }

  test("RangeJoin.lookback: inclusive bounds, bucket-boundary pairs, no dup matches") {
    val left = Seq((1L, 100L), (1L, 205L), (2L, 100L)).toDF("k", "t")
    val right = Seq(
      (1L, 100L, 1.0),  // dt=0   -> matches t=100 (inclusive upper)
      (1L, 50L, 2.0),   // dt=50  -> matches t=100 (inclusive lower: 100-50=50)
      (1L, 49L, 3.0),   // dt=51  -> outside for t=100
      (1L, 160L, 4.0),  // matches t=205 across the bucket boundary (bucket 3 vs 4)
      (2L, 300L, 5.0)   // future event -> no match
    ).toDF("k", "rt", "p")
    val out = RangeJoin.lookback(left, right, "k", "t", "rt", 50L)
      .select("k", "t", "rt").orderBy("t", "rt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 100L, 50L), (1L, 100L, 100L), (1L, 205L, 160L)))
  }

  test("RangeJoin.lookback equals a direct theta-join on random data incl. negative times") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(_ => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong - 500L))
      .toDF("k", "t")
    val right = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong - 500L, i.toLong))
      .toDF("k", "rt", "rid")
    val bucketed = RangeJoin.lookback(left, right, "k", "t", "rt", 37L)
      .select("k", "t", "rt", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val theta = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          col("r.rt") >= col("l.t") - 37L && col("r.rt") <= col("l.t"))
      .select(col("l.k"), col("t"), col("rt"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(bucketed == theta)
  }

  test("modePerGroup: ties break toward the larger value; counts exact") {
    val df = Seq(("u1", "a"), ("u1", "a"), ("u1", "b"), ("u1", "b"), ("u1", "c"),
      ("u2", "z")).toDF("u", "v")
    val out = Relational.modePerGroup(df, Seq(col("u")), col("v"))
      .orderBy("u").collect()
    assert(out(0).getString(out(0).fieldIndex("mode_value")) == "b") // tie a/b -> larger
    assert(out(0).getLong(out(0).fieldIndex("n_mode")) == 2L)
    assert(out(1).getString(out(1).fieldIndex("mode_value")) == "z")
  }

  test("cubeAgg: emits all four grouping levels with ALL labels") {
    val df = Seq(("A", "X", 1L), ("A", "Y", 2L), ("B", "X", 4L)).toDF("f", "s", "v")
    val out = Relational.cubeAgg(df, Seq(col("f"), col("s")),
        Seq(sum(col("v")).as("t")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      ("A", "X", 1L), ("A", "Y", 2L), ("B", "X", 4L),
      ("A", "ALL", 3L), ("B", "ALL", 4L),
      ("ALL", "X", 5L), ("ALL", "Y", 2L),
      ("ALL", "ALL", 7L)))
  }

  test("ewma matches the reference recurrence; alpha=1 is identity") {
    val rnd = new scala.util.Random(3)
    val ys = (1 to 50).map(_ => rnd.nextDouble() * 100)
    val df = ys.zipWithIndex.map { case (y, i) => (1L, i.toDouble, y) }
      .toDF("g", "x", "y")
    val got = WindowOps.ewma(df, "g", "x", "y", alpha = 0.3)
      .orderBy("x").select("ewma").as[Double].collect()
    // reference recurrence: first point seeds, then s = a*y + (1-a)*s
    var s = ys.head
    val ref = ys.zipWithIndex.map { case (y, i) =>
      if (i == 0) s else { s = 0.3 * y + 0.7 * s; s }
    }
    (got zip ref).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    val ident = WindowOps.ewma(df, "g", "x", "y", alpha = 1.0)
      .orderBy("x").select("ewma").as[Double].collect()
    (ident zip ys).foreach { case (a, b) => assert(a == b) }
  }

  test("savitzkyGolay5 reproduces a parabola exactly and nulls scan edges") {
    // v = (t-5)^2 dollars in cents on a unit grid: a quadratic is
    // invariant under the SG(5,2) filter
    val df = (1L to 9L).map(t => ("s", t, (t - 5) * (t - 5) * 100L))
      .toDF("k", "t", "vc")
    val out = WindowOps.savitzkyGolay5(df, col("k"), Seq(col("t")), col("vc"))
      .orderBy("t").collect()
    (0 until 9).foreach { i =>
      val r = out(i)
      if (i < 2 || i > 6) assert(r.isNullAt(r.fieldIndex("sg")), s"edge $i not null")
      else {
        val t = i + 1
        assert(r.getDouble(r.fieldIndex("sg")) == ((t - 5) * (t - 5)).toDouble,
          s"parabola not preserved at t=$t")
      }
    }
  }

  test("despike: spike replaced by rolling median; edges and exact threshold safe") {
    // cents values: flat 100s with one 100000 spike; halfWidth 2, thr 500
    val df = Seq(
      ("a", 1L, 10000L), ("a", 2L, 10000L), ("a", 3L, 10000000L),
      ("a", 4L, 10000L), ("a", 5L, 10000L),
      // second scan: deviation EXACTLY at the threshold -> not a spike
      ("b", 1L, 10000L), ("b", 2L, 10000L), ("b", 3L, 10500L)
    ).toDF("k", "t", "vc")
    val out = WindowOps.despike(df, col("k"), Seq(col("t")), col("vc"),
        halfWidth = 2, thrCents = 500L)
      .select("k", "t", "is_spike", "v_clean").orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    val spikes = out.filter(_._3)
    assert(spikes.map(x => (x._1, x._2)).toSeq == Seq(("a", 3L)))
    assert(spikes.head._4 == 100.0) // spike replaced by rolling median
    // non-spike rows pass through unchanged
    assert(out.filter(x => x._1 == "a" && x._2 == 1L).head._4 == 100.0)
    // |v - med| == thr exactly is NOT a spike (strict >, integer-exact)
    assert(!out.filter(x => x._1 == "b" && x._2 == 3L).head._3)
  }

  test("bgSubtract: endpoints land on zero; singleton group subtracts its own value") {
    val df = Seq(("a", 0L, 10.0), ("a", 10L, 25.0), ("a", 20L, 30.0),
      ("b", 5L, 7.0)).toDF("k", "x", "v")
    val out = WindowOps.bgSubtract(df, col("k"), Seq(col("x")),
        col("x"), col("v").cast("decimal(18,2)"))
      .select("k", "x", "v_sub").orderBy("k", "x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // baseline a: 10 -> 30 over x 0..20; midpoint baseline = 20, v=25 -> +5
    assert(out == Seq(("a", 0L, 0.0), ("a", 10L, 5.0), ("a", 20L, 0.0), ("b", 5L, 0.0)))
  }

  test("RangeJoin.lookback plans as an equi-join — never a nested-loop/cartesian") {
    val left = (1 to 100).map(i => (i.toLong % 5, i.toLong * 7)).toDF("k", "t")
    val right = (1 to 100).map(i => (i.toLong % 5, i.toLong * 11)).toDF("k", "rt")
    val plan = RangeJoin.lookback(left, right, "k", "t", "rt", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("weightedPerGroup pre-aggregates before the window (collapse to distinct values)") {
    val df = (1 to 1000).map(i => ("g", (i % 10).toLong, 1L)).toDF("k", "v", "w")
    val plan = Percentiles.weightedPerGroup(df, Seq("k"), col("v"), col("w"), 50)
      .queryExecution.optimizedPlan.toString
    // the Aggregate (per-value collapse) must sit BELOW the Window in
    // the plan tree — the raw rows never reach the window sort
    val winIdx = plan.indexOf("Window")
    val aggBelow = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggBelow > winIdx,
      s"expected per-value Aggregate beneath Window:\n$plan")
  }

  test("scale knobs: suggestedPlanes and suggestedDfCap stay in sane ranges") {
    assert(VectorOps.suggestedPlanes(1000L) == 4) // floor
    assert(VectorOps.suggestedPlanes(1L << 40) == 20) // cap
    assert(VectorOps.suggestedPlanes(1048576L, 1024L) == 10) // 2^20/2^10
    assert(Dedup.suggestedDfCap(1000000L) == 1415) // ~sqrt(2e6)
    assert(Dedup.suggestedDfCap(1L) == 2) // floor
  }

  test("weightedPerGroup: crossing picks the smallest value reaching the mass") {
    // values 1,2,3 with weights 10,10,80: p50 of mass lands on 3;
    // unweighted median would be 2
    // duplicate v=3 rows verify the per-value collapse sums weights
    val df = Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 50L), ("g", 3L, 30L))
      .toDF("k", "v", "w")
    val out = Percentiles.weightedPerGroup(df, Seq("k"), col("v"), col("w"), 50)
      .collect()
    assert(out.head.getLong(out.head.fieldIndex("wp")) == 3L)
    // p20 -> cumw 10 of 100 reaches 20%? 10*100 >= 100*20 is false; 2 qualifies
    val p20 = Percentiles.weightedPerGroup(df, Seq("k"), col("v"), col("w"), 20)
      .collect()
    assert(p20.head.getLong(p20.head.fieldIndex("wp")) == 2L)
  }

  test("qOfRing: zero at the beam center, monotone, matches the closed form") {
    val rings = spark.range(0, 200).select(col("id").as("rbin"))
      .withColumn("q", Binning.qOfRing(col("rbin"),
        pixelSize = 0.172, distance = 300.0, wavelengthA = 1.54))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rings(0L) === 0.0)
    assert((1L until 200L).forall(i => rings(i) > rings(i - 1)), "monotone in r")
    val want = 4.0 * math.Pi / 1.54 *
      math.sin(math.atan(100.0 * 0.172 / 300.0) / 2.0)
    assert(math.abs(rings(100L) - want) < 1e-6)
  }

  test("radialProfile: ring 0 is the center pixel, rings partition the frame") {
    // 3x3 frame, center (1,1): ring 0 = center; ring 1 = the 8 others
    // (corner distance sqrt(2) floors to 1).
    val df = Seq((1L, 3, Seq(1.0, 2.0, 3.0, 4.0, 50.0, 6.0, 7.0, 8.0, 9.0)))
      .toDF("id", "width", "pixels")
    val out = Binning.radialProfile(df, col("id"), col("width"), col("pixels"),
        cx = 1, cy = 1)
      .orderBy("rbin").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 1L && out(0).getLong(3) == 50L)
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 8L && out(1).getLong(3) == 40L)
  }

  test("correctedRadialProfile: identity corrections reduce to radialProfile × 1e6") {
    // dark = 0, flat = 1, distance → ∞ (solid angle = 1): the
    // corrected micro sums must equal the plain profile's sums × 1e6.
    val df = Seq((1L, 3, Seq(1.0, 2.0, 3.0, 4.0, 50.0, 6.0, 7.0, 8.0, 9.0),
        Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
      .toDF("id", "width", "pixels", "dk")
    val out = Binning.correctedRadialProfile(df, col("id"), col("width"),
        col("pixels"), col("dk"), cx = 1, cy = 1,
        pixelSize = 0.172, distance = 1e18, flat = (_, _) => lit(1.0))
      .orderBy("rbin").collect()
    assert(out.length == 2)
    assert(out(0).getLong(3) == 50000000L)
    assert(out(1).getLong(3) == 40000000L)
  }

  test("correctedRadialProfile: dark and flat divide out as expected") {
    // raw = 2·flat + dark per pixel → every corrected value is
    // exactly 2.0 → 2e6 micro-units regardless of position (far
    // detector, solid angle ≈ 1).
    val flat = (r: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =>
      (lit(10) + (r + c) % lit(7)) / lit(10.0)
    val w = 4
    val dark = Array.tabulate(w * w)(i => (i % 5).toDouble)
    val raw = Array.tabulate(w * w) { i =>
      2.0 * ((10 + ((i / w) + (i % w)) % 7) / 10.0) + dark(i)
    }
    val df = Seq((7L, w, raw.toSeq, dark.toSeq)).toDF("id", "width", "pixels", "dk")
    val out = Binning.correctedRadialProfile(df, col("id"), col("width"),
        col("pixels"), col("dk"), cx = 2, cy = 2,
        pixelSize = 0.1, distance = 1e18, flat = flat)
      .collect()
    // mean of every ring = 2.0 → i_mean_micro = 2_000_000 ± 1 micro
    // (per-pixel floor can shave at most 1 micro-unit)
    out.foreach { r =>
      val mean = r.getDouble(4)
      assert(math.abs(mean - 2000000.0) <= 1.0, s"ring mean $mean")
    }
  }

  test("peakCentroid: single bright pixel → centroid at its coordinates") {
    val w = 4
    val px = Array.tabulate(w * w)(i => if (i == 9) 100.0 else 1.0) // (r=2, c=1)
    val df = Seq((3L, w, px.toSeq)).toDF("id", "width", "pixels")
    val out = Binning.peakCentroid(df, col("id"), col("width"), col("pixels"),
        threshold = 50L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 1L && r.getLong(2) == 100L && r.getLong(3) == 100L)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 2.0)
  }

  test("peakCentroid: symmetric blob → centroid at blob center, frames below threshold drop") {
    val w = 5
    // frame 1: uniform 10 above threshold in a plus-shape around (2,2)
    val blob = Set(2 * w + 2, 1 * w + 2, 3 * w + 2, 2 * w + 1, 2 * w + 3)
    val px1 = Array.tabulate(w * w)(i => if (blob(i)) 10.0 else 0.0)
    val px2 = Array.fill(w * w)(1.0) // all below threshold
    val df = Seq((1L, w, px1.toSeq), (2L, w, px2.toSeq)).toDF("id", "width", "pixels")
    val out = Binning.peakCentroid(df, col("id"), col("width"), col("pixels"),
        threshold = 5L).collect()
    assert(out.length == 1, "frame 2 has no pixel above threshold")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 5L)
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 2.0)
  }
}
