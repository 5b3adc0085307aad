package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Write-time layout → read-time shuffle elimination, plan-asserted. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("same-key bucketed tables join with zero Exchange; unbucketed join shuffles") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    spark.sql("DROP TABLE IF EXISTS lay_l")
    spark.sql("DROP TABLE IF EXISTS lay_r")
    Layout.writeBucketed(left, "lay_l", "k", 4)
    Layout.writeBucketed(right, "lay_r", "k", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "lay_l", "lay_r", "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // control: the same join off raw DataFrames DOES plan an Exchange
      val controlPlan = left.join(right, "k").queryExecution.executedPlan.toString
      assert(controlPlan.contains("Exchange"), controlPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS lay_l")
      spark.sql("DROP TABLE IF EXISTS lay_r")
    }
  }

  test("writeBucketed validates the table name before touching the warehouse (r12 ADVICE)") {
    val df = Seq((1L, "a")).toDF("k", "v")
    // names that would concatenate into a deletable path must be
    // rejected up front — never become a recursive-delete target
    for (bad <- Seq("../../etc", "a/b", "a b", "", "x;drop")) {
      val e = intercept[IllegalArgumentException] {
        Layout.writeBucketed(df, bad, "k", 2)
      }
      assert(e.getMessage.contains("table name"), s"name='$bad': ${e.getMessage}")
    }
    // idempotent over a stale warehouse dir a previous session left
    // behind (not in this catalog): plant one, then write — the
    // Hadoop-FS cleanup must remove it instead of
    // LOCATION_ALREADY_EXISTS
    spark.sql("DROP TABLE IF EXISTS lay_guard")
    val wh = new org.apache.hadoop.fs.Path(spark.sessionState.conf.warehousePath)
    val loc = new org.apache.hadoop.fs.Path(wh, "lay_guard")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(loc, "stale"))
    Layout.writeBucketed(df, "lay_guard", "k", 2)
    assert(spark.table("lay_guard").count() === 1L)
    spark.sql("DROP TABLE IF EXISTS lay_guard")
  }

  test("partitioned write prunes directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val df = (1 to 300).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "p")
    Layout.writePartitioned(df, dir, "p")
    val read = spark.read.parquet(dir).filter(col("p") === "p1")
    assert(read.count() === 100)
    val formatted = read.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the partition filter reaches the scan, and the data filter list
    // stays empty: pruning happened at planning, not per row
    assert(formatted.contains("PartitionFilters"), formatted)
    val pf = formatted.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("p1") || pf.contains("isnotnull"), pf)
    // only one of three directories is read
    val files = read.queryExecution.executedPlan.collectLeaves().head
      .toString
    assert(!files.contains("p=p0") || files.length < 4000)
  }
}
