package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print schemas as Spark sees them (timestamp unit checks). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables.load(spark, dir, n)
      println(s"=== $n (${df.count()} rows)")
      println(df.schema.treeString)
    }
    val ev = Tables.events(spark, dir)
    ev.show(3, false)
    println(s"entry rows: ${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
