package graft

import org.apache.spark.sql.functions._
import graft.operators.Locality

class LocalitySpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known Morton values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (7L, 7L))
      .toDF("x", "y")
    val got = df.select(Locality.zValue(col("x"), col("y"), 3))
      .collect().map(_.getLong(0)).toSeq
    // morton(5,3) = interleave(101, 011) = 0b011 0 11 -> x bits at even:
    // 1,0,1 -> 1+16, y bits 1,1,0 -> 2+8 => 27
    assert(got == Seq(0L, 1L, 2L, 3L, 27L, 63L))
  }

  test("gridCell maps bounds onto the full cell range, inclusively") {
    val df = Seq(0L, 5L, 9L).toDF("c")
    val cells = df.select(Locality.gridCell(col("c"), lit(0L), lit(9L), 2))
      .collect().map(_.getLong(0)).toSeq
    assert(cells == Seq(0L, 2L, 3L)) // 4 cells over [0, 9]
  }

  test("clusterByZ makes partitions cover compact rectangles in BOTH dimensions") {
    val n = 4096
    // a uniform 64x64 grid of points, shuffled arrival order
    val pts = scala.util.Random.shuffle(
      (0 until n).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong)).toList)
      .toDF("id", "x", "y").repartition(8)
    val z = Locality.zValue(col("x"), col("y"), 6)
    val parts = 16
    val clustered = Locality.clusterByZ(pts.withColumn("z", z), col("z"), parts)
    val spans = clustered
      .select(spark_partition_id().as("p"), col("x"), col("y"), col("z"))
      .groupBy("p")
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.map(_.getLong(3)).sum == n)
    val xSpan = spans.map(_.getLong(1)).max
    val ySpan = spans.map(_.getLong(2)).max
    // 16 z-range partitions of a 64x64 morton curve: every partition's
    // bounding box is at most a quarter of the global span in each
    // dimension (vs 63 for a layout sorted by x alone, whose partitions
    // span ALL of y)
    assert(xSpan <= 31, s"x span $xSpan")
    assert(ySpan <= 31, s"y span $ySpan")
    // contrast: linear sort by x leaves y unpruned
    val linear = pts.repartitionByRange(parts, col("x")).sortWithinPartitions(col("x"))
      .select(spark_partition_id().as("p"), col("y"))
      .groupBy("p").agg((max(col("y")) - min(col("y"))).as("ys")).collect()
    assert(linear.map(_.getLong(1)).max == 63L)
  }

  test("zValue/gridCell reject out-of-contract parameters") {
    intercept[IllegalArgumentException](Locality.zValue(lit(1L), lit(1L), 32))
    intercept[IllegalArgumentException](Locality.zValue(lit(1L), lit(1L), 0))
  }
}
