package graft

import org.apache.spark.sql.functions._
import graft.operators.{Binning, CorpusStats, PeakAnalysis}

/** Specs for the round-6 diagnostics batch: sector integration,
  * stack-statistics pixel masking, peak second moments, and the
  * corpus-audit statistics (TTR, per-source KL). The SQL gates pin
  * cross-engine hashes; these pin the SEMANTICS against brute-force
  * recomputes and invariants.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // 2 tiny 4x4 frames with distinct quadrant structure
  private def frames = Seq(
    (0L, 4, (0 until 16).map(i => (i * 7 % 13).toDouble).toArray),
    (1L, 4, (0 until 16).map(i => ((i * 11 + 3) % 17).toDouble).toArray)
  ).toDF("frame", "width", "pixels")

  test("sectorProfile partitions each ring exactly (sums match radialProfile)") {
    val rad = Binning.radialProfile(frames, col("frame"), col("width"),
      col("pixels"), cx = 2, cy = 2)
    val sec = Binning.sectorProfile(frames, col("frame"), col("width"),
      col("pixels"), cx = 2, cy = 2)
    val reagg = sec.groupBy("id", "rbin")
      .agg(sum("n_px").as("n_px"), sum("v_sum").as("v_sum"))
    val a = rad.select("id", "rbin", "n_px", "v_sum").orderBy("id", "rbin").collect()
    val b = reagg.select("id", "rbin", "n_px", "v_sum").orderBy("id", "rbin").collect()
    assert(a.toSeq == b.toSeq)
    // sectors stay in range and no (id, rbin, sect) cell repeats
    val cells = sec.select("id", "rbin", "sect").collect()
    assert(cells.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 7))
    assert(cells.length == cells.toSeq.distinct.length)
  }

  test("sectorOctant covers all 8 octants with exact boundaries") {
    val pts = Seq((3, 1, 0L), (1, 3, 1L), (-1, 3, 2L), (-3, 1, 3L),
      (-3, -1, 4L), (-1, -3, 5L), (1, -3, 6L), (3, -1, 7L),
      // boundary conventions: dc==dr>0 → 0; dr==-dc>0 → 3; -dc==-dr>0 → 4; -dr==dc>0 → 7
      (2, 2, 0L), (-2, 2, 3L), (-2, -2, 4L), (2, -2, 7L), (0, 0, 0L))
    val df = pts.map(p => (p._1, p._2)).toDF("dc", "dr")
      .select(Binning.sectorOctant(col("dc"), col("dr")).as("s"))
    assert(df.as[Long].collect().toSeq == pts.map(_._3))
  }

  test("stackPixelMask flags exactly the out-of-band pixels; masked profile excludes them") {
    // pixel i's across-frame sum: f0 = i, f1 = i + 16 → sum = 2i + 16
    val stack = Seq(
      (0L, 4, (0 until 16).map(_.toDouble).toArray),
      (1L, 4, (0 until 16).map(i => (i + 16).toDouble).toArray)
    ).toDF("frame", "width", "pixels")
    // hot: 2i+16 >= 40 → i >= 12 (4 px); dead: 2i+16 <= 18 → i <= 1 (2 px)
    val mask = Binning.stackPixelMask(stack, col("pixels"), hotSumMin = 40L, deadSumMax = 18L)
    assert(mask.as[Int].collect().sorted.toSeq == Seq(0, 1, 12, 13, 14, 15))
    val prof = Binning.radialProfileMasked(stack, col("frame"), col("width"),
      col("pixels"), cx = 2, cy = 2, mask)
    val totalPx = prof.agg(sum("n_px")).as[Long].head()
    assert(totalPx == 2L * (16 - 6)) // both frames lose the 6 masked pixels
  }

  test("peakWidths matches brute-force second moments") {
    val w = 5
    val px = Array.tabulate(w * w)(i => ((i * 13 + 5) % 23).toDouble)
    val df = Seq((7L, w, px)).toDF("frame", "width", "pixels")
    val thr = 8L
    val out = Binning.peakWidths(df, col("frame"), col("width"), col("pixels"), thr)
      .collect().head
    // brute force
    val b = px.zipWithIndex.filter(_._1 >= thr)
      .map { case (v, i) => (i % w, i / w, v.toLong) }
    val vs = b.map(_._3).sum
    val scv = b.map(t => t._1 * t._3).sum
    val srv = b.map(t => t._2 * t._3).sum
    val sccv = b.map(t => t._1.toLong * t._1 * t._3).sum
    val srrv = b.map(t => t._2.toLong * t._2 * t._3).sum
    val scrv = b.map(t => t._1.toLong * t._2 * t._3).sum
    val varC = vs * sccv - scv * scv
    val varR = vs * srrv - srv * srv
    val covN = vs * scrv - scv * srv
    assert(out.getAs[Long]("n_peak") == b.length.toLong)
    assert(out.getAs[Long]("v_sum") == vs)
    assert(math.abs(out.getAs[Double]("cx") - scv.toDouble / vs) < 1e-3)
    assert(math.abs(out.getAs[Double]("sigma_c") - math.sqrt(varC.toDouble) / vs) < 1e-3)
    assert(math.abs(out.getAs[Double]("sigma_r") - math.sqrt(varR.toDouble) / vs) < 1e-3)
    assert(math.abs(out.getAs[Double]("rho") -
      covN / (math.sqrt(varC.toDouble) * math.sqrt(varR.toDouble))) < 1e-3)
  }

  test("peakWidths: degenerate (single-pixel) frame reports NULL widths") {
    val df = Seq((1L, 3, Array(0.0, 0.0, 0.0, 0.0, 9.0, 0.0, 0.0, 0.0, 0.0)))
      .toDF("frame", "width", "pixels")
    val r = Binning.peakWidths(df, col("frame"), col("width"), col("pixels"), 5L)
      .collect().head
    assert(r.getAs[Long]("n_peak") == 1L)
    assert(r.isNullAt(r.fieldIndex("sigma_c")) && r.isNullAt(r.fieldIndex("rho")))
  }

  test("ttr: exact counts on a known fixture") {
    val docs = Seq(
      ("web", "a b a c"),   // tokens 4, types 3, hapax 2 (b, c)
      ("web", "a d"),       // +2 tokens; d hapax
      ("code", "x x x")     // tokens 3, types 1, hapax 0
    ).toDF("source", "text")
    val out = CorpusStats.ttr(docs, col("source"), col("text"))
      .orderBy("source").collect()
    val code = out(0); val web = out(1)
    assert(code.getAs[Long]("n_tokens") == 3 && code.getAs[Long]("n_types") == 1
      && code.getAs[Long]("n_hapax") == 0)
    assert(web.getAs[Long]("n_tokens") == 6 && web.getAs[Long]("n_types") == 4
      && web.getAs[Long]("n_hapax") == 3)
    assert(math.abs(web.getAs[Double]("ttr") - 0.6667) < 1e-9)
  }

  test("lpRadialProfile: excludes beam center, matches hand-computed correction") {
    val w = 5
    val px = Array.fill(w * w)(100.0)
    val df = Seq((0L, w, px)).toDF("frame", "width", "pixels")
    val out = Binning.lpRadialProfile(df, col("frame"), col("width"), col("pixels"),
      cx = 2, cy = 2, pixelSize = 0.2, distance = 100.0, pf = 0.9)
      .collect()
    // beam-center pixel excluded: total pixels = 24
    assert(out.map(_.getAs[Long]("n_px")).sum == (w * w - 1).toLong)
    // brute-force mirror of the correction for every pixel
    val k2 = (0.2 / 100.0) * (0.2 / 100.0)
    def corr(dc: Int, dr: Int): Long = {
      val r2 = dc * dc + dr * dr
      val x2 = r2.toDouble * k2
      val c2t2 = 1.0 / (1.0 + x2); val s2t2 = x2 / (1.0 + x2)
      val cos2chi = (dc * dc - dr * dr).toDouble / r2.toDouble
      val p = (1.0 + c2t2 - 0.9 * cos2chi * s2t2) / 2.0
      math.floor(100.0 * math.sqrt((1.0 - math.sqrt(c2t2)) / 2.0) *
        math.sqrt(s2t2) / p * 1e6).toLong
    }
    val expected = (for { r <- 0 until w; c <- 0 until w; if (r, c) != ((2, 2)) } yield {
      val (dc, dr) = (c - 2, r - 2)
      (math.floor(math.sqrt((dc * dc + dr * dr).toDouble)).toLong, corr(dc, dr))
    }).groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    out.foreach { row =>
      val (n, s) = expected(row.getAs[Long]("rbin"))
      assert(row.getAs[Long]("n_px") == n && row.getAs[Long]("i_sum_micro") == s, row.toString)
    }
  }

  test("roiLineCuts: both axes from one pass, sums match brute force") {
    val w = 4
    val px = Array.tabulate(w * w)(i => (i + 1).toDouble)
    val df = Seq((3L, w, px)).toDF("frame", "width", "pixels")
    val out = Binning.roiLineCuts(df, col("frame"), col("width"), col("pixels"),
      r0 = 1, r1 = 3, c0 = 0, c1 = 4).collect()
    val cols = out.filter(_.getAs[String]("axis") == "col")
    val rows = out.filter(_.getAs[String]("axis") == "row")
    assert(cols.length == 4 && rows.length == 2)
    // col c sum over rows 1..2 = (4+c+1) + (8+c+1)
    cols.foreach { r =>
      val c = r.getAs[Long]("pos")
      assert(r.getAs[Long]("v_sum") == (5 + c) + (9 + c), r.toString)
      assert(r.getAs[Long]("n_px") == 2L)
    }
    rows.foreach { r =>
      val rr = r.getAs[Long]("pos")
      assert(r.getAs[Long]("v_sum") == (1 to 4).map(c => rr * 4 + c).sum)
    }
  }

  test("wLinReg: equal weights reduce to linReg; weights steer the fit") {
    val df = Seq((1L, 0, 1.0), (1L, 1, 3.0), (1L, 2, 4.0), (1L, 3, 7.0))
      .toDF("k", "x", "y")
      .select(col("k"), col("x").cast("decimal(9,0)").as("x"),
        col("y").cast("decimal(18,2)").as("y"))
    val unw = PeakAnalysis.linReg(df, Seq("k"), col("x"), col("y")).collect().head
    val eqw = PeakAnalysis.wLinReg(df, Seq("k"), col("x"), col("y"),
      lit(3).cast("decimal(9,0)")).collect().head
    assert(unw.getAs[Double]("slope") == eqw.getAs[Double]("slope"))
    assert(unw.getAs[Double]("intercept") == eqw.getAs[Double]("intercept"))
    // all weight on (0,1) and (2,4): the fit is the line through them
    val wcol = when(col("x") === 0 || col("x") === 2, 1000).otherwise(0)
    val steered = PeakAnalysis.wLinReg(df, Seq("k"), col("x"), col("y"),
      wcol.cast("decimal(9,0)")).collect().head
    assert(math.abs(steered.getAs[Double]("slope") - 1.5) < 1e-6)
    assert(math.abs(steered.getAs[Double]("intercept") - 1.0) < 1e-6)
  }

  test("docEntropy: H = ln n for all-distinct tokens, 0 for one repeated token") {
    val docs = Seq((1L, "a b c d"), (2L, "x x x x x")).toDF("doc_id", "text")
    val out = CorpusStats.docEntropy(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(math.abs(out(0).getAs[Double]("entropy") - math.log(4.0)) < 1e-4)
    assert(math.abs(out(1).getAs[Double]("entropy")) < 1e-4)
  }

  test("jaccardSurvival: identical docs land in bucket 10, totals match pair count") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // identical to 1
      (3L, "the quick brown fox leaps over a sleepy cat"),
      (4L, "completely different words here that share nothing at all")
    ).toDF("doc_id", "text")
    val surv = graft.operators.Dedup.jaccardSurvival(docs, col("doc_id"), col("text"), 3)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_pairs")).toMap
    assert(surv.getOrElse(10L, 0L) == 1L) // the identical pair
    val nPairs = graft.operators.Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0)
      .count()
    assert(surv.values.sum == nPairs)
    assert(surv.keys.forall(b => b >= 0 && b <= 10))
  }

  test("sourceKl: slices matching the corpus mix score ~0, divergent slices positive") {
    // every source has the SAME distribution → each equals the corpus mix → KL ≈ 0
    val same = Seq(("s1", "a a b"), ("s2", "a a b"), ("s3", "a a b"))
      .toDF("source", "text")
    val klSame = CorpusStats.sourceKl(same, col("source"), col("text"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("kl")).toMap
    // micro-ln floors can dip a hair below zero
    assert(klSame.values.forall(v => math.abs(v) < 1e-4), klSame.toString)

    // divergent slices: corpus is a:7 b:1; both slices differ from it
    val skew = Seq(("bal", "a b"), ("skew", "a a a a a a")).toDF("source", "text")
    val out = CorpusStats.sourceKl(skew, col("source"), col("text")).collect()
    val kl = out.map(r => r.getAs[String]("source") -> r.getAs[Double]("kl")).toMap
    assert(kl("bal") > 0.3 && kl("skew") > 0.1, kl.toString) // exact: 0.413, 0.134
    assert(out.forall(_.getAs[Long]("n_tokens") > 0))
  }
}
