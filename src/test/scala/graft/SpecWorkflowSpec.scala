package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{GaussFit, PeakAnalysis, WindowOps}

/** End-to-end reference workflow: what a pyspec user does daily —
  * read a spec file, pick a scan, normalize to monitor, estimate the
  * peak, refine with a gaussian fit — all through the Spark surface.
  */
class SpecWorkflowSpec extends SparkSpec {

  private val (trueC, trueS, trueH, trueBg) = (0.52, 0.11, 900.0, 25.0)

  private lazy val fixture: String = {
    val dir = Files.createTempDirectory("specwf").toFile
    val f = new java.io.File(dir, "scan.spec")
    val sb = new StringBuilder
    sb.append("#F scan.spec\n#E 1704067200\n#D Mon Jan 01 00:00:00 2024\n")
    sb.append("#O0 Theta  Chi\n\n")
    sb.append("#S 1 ascan th 0 1 100 1\n#D Mon Jan 01 00:10:00 2024\n")
    sb.append("#P0 0.1 2.2\n#N 3\n#L th  detector  monitor\n")
    (0 to 100).foreach { i =>
      val x = i / 100.0
      val y = trueBg + trueH * math.exp(-(x - trueC) * (x - trueC) / (2 * trueS * trueS))
      sb.append(f"$x%.3f ${math.rint(y)}%.0f 10000\n")
    }
    sb.append("\n")
    Files.write(f.toPath, sb.toString.getBytes("UTF-8"))
    f.getPath
  }

  test("read spec -> peakguess -> gaussian fit recovers the peak") {
    val scan = spark.read.format("spec").load(fixture)
      .filter(col("scan") === 1)
      .select(col("scan"),
        element_at(col("data"), "th").as("x"),
        element_at(col("data"), "detector").as("y"))
    // moment estimate (peakguess) over background-dominated data gets
    // close; the iterative fit should nail it
    val fit = GaussFit.fitGroups(scan, "scan", "x", "y").collect().head
    assert(math.abs(fit.getDouble(fit.fieldIndex("com")) - trueC) < 0.002)
    assert(math.abs(fit.getDouble(fit.fieldIndex("sigma")) - trueS) < 0.005)
    assert(math.abs(fit.getDouble(fit.fieldIndex("height")) - trueH) < 5.0)
    assert(math.abs(fit.getDouble(fit.fieldIndex("bg")) - trueBg) < 2.0)
  }

  test("LIVE workflow: tail the growing file, monitor per-scan peaks as scans close") {
    // the streaming version of the daily loop: watch the file the
    // instrument is writing, and as each scan COMPLETES, refresh its
    // peak summary (height/COM estimate from moments)
    val dir = Files.createTempDirectory("specwfl").toFile
    val f = new java.io.File(dir, "live.spec")
    def gaussScan(no: Int, c: Double): String = {
      val sb = new StringBuilder(s"\n#S $no ascan th 0 1 20 1\n#L th  det\n")
      (0 to 20).foreach { i =>
        val x = i / 20.0
        sb.append(f"$x%.2f ${math.rint(10 + 500 * math.exp(-(x - c) * (x - c) / 0.02))}%.0f\n")
      }
      sb.toString
    }
    def append(s: String): Unit = Files.write(f.toPath, s.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    append("#F live.spec\n#O0 Theta\n" + gaussScan(1, 0.3) + gaussScan(2, 0.7))
    val peaks = spark.readStream.format("spec").load(f.getPath)
      .select(col("scan"),
        element_at(col("data"), "th").as("x"),
        element_at(col("data"), "det").as("w"))
      .groupBy(col("scan"))
      .agg(count(lit(1)).as("n"), max(col("w")).as("height"),
        (sum(col("x") * col("w")) / sum(col("w"))).as("com"))
    val q = peaks.writeStream.format("memory").queryName("live_peaks")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val one = spark.table("live_peaks").collect()
      assert(one.map(_.getLong(0)).toSeq == Seq(1L)) // scan 2 still acquiring
      assert(math.abs(one.head.getDouble(3) - 0.3) < 0.05)
      append(gaussScan(3, 0.5)) // scan 3 begins => scan 2 is complete
      q.processAllAvailable()
      val two = spark.table("live_peaks").collect().sortBy(_.getLong(0))
      assert(two.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      assert(math.abs(two(1).getDouble(3) - 0.7) < 0.05)
      assert(two.forall(_.getLong(1) == 21L)) // every point of every closed scan
    } finally q.stop()
  }

  test("scan concatenation: sd[1] + sd[2] fits as one logical scan") {
    val both = spark.read.format("spec").load(fixture) // 101-point scan 1 only here
    val twice = graft.sources.SpecOps.concatScans(
      both.filter(col("scan") === 1).union(both.filter(col("scan") === 1)), newScan = 99L)
    val rows = twice.select("scan", "point").collect()
    assert(rows.forall(_.getLong(0) == 99L))
    assert(rows.map(_.getLong(1)).sorted.toSeq == (0L until 202L)) // contiguous renumber
    // the concatenated scan flows into the same fit surface
    val pts = twice.select(col("scan"),
      element_at(col("data"), "th").as("x"),
      element_at(col("data"), "detector").as("y"))
    val fit = GaussFit.fitGroups(pts, "scan", "x", "y").collect().head
    assert(math.abs(fit.getDouble(fit.fieldIndex("com")) - trueC) < 0.002)
  }

  test("normalize scan counts to the monitor column") {
    val scan = spark.read.format("spec").load(fixture)
      .select(col("scan"), col("point"),
        element_at(col("data"), "detector").cast("decimal(18,2)").as("det"),
        element_at(col("data"), "monitor").cast("decimal(18,2)").as("mon"))
    val normed = WindowOps.normalizeToMonitor(scan, col("scan"), col("det"), col("mon"))
    val n = normed.filter(col("norm").isNotNull).count()
    assert(n == 101)
  }
}
