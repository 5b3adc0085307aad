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
