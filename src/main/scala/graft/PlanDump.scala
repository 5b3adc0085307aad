package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for named queries to files
  * — the per-round `plans/rNN/<query>_{before,after}.txt` evidence
  * the optimization rounds commit.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>
  * (writes <outDir>/<q>_<suffix>.txt; AQE off so the pre-execution
  * plan carries codegen ids, same conf as [[PlanAudit]]).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "args: sfDir outDir suffix q1,q2,...")
    val Array(sfDir, outDir, suffix, qlist) = args.take(4)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    qlist.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        formatted.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
