package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: stage-timing probe for the k-truss gate (driver path at
  * sf0.1, distributed path at a BenchScale dir). */
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    val edges = graft.SharedRelations.partCoEdges(spark, d)
    val n = edges.count()
    println(s"[probe] edge build+count: ${(System.nanoTime()-t0)/1e9}s n=$n")
    t0 = System.nanoTime()
    try {
      val stats = graft.operators.Graphs.trussSizes(edges, Seq(3, 4), rounds = 10)
      println(s"[probe] trussSizes total: ${(System.nanoTime()-t0)/1e9}s $stats")
    } catch { case e: Throwable =>
      println(s"[probe] trussSizes FAILED after ${(System.nanoTime()-t0)/1e9}s: $e")
      e.printStackTrace()
    }
    spark.stop()
  }
}
