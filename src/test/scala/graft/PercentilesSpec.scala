package graft

import org.apache.spark.sql.functions._
import graft.operators.Percentiles

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("matches the NIST/NumPy linear interpolation rule") {
    // group 1: sorted values 10,20,30,40 (n=4): p50 -> h=1.5 -> 25.0;
    // p90 -> h=2.7 -> 30 + 0.7*10 = 37.0
    // group 2: single value (n=1): every percentile = 5.0
    val df = Seq((1L, 1L, 40.0), (1L, 2L, 10.0), (1L, 3L, 30.0), (1L, 4L, 20.0),
      (2L, 5L, 5.0)).toDF("g", "id", "v")
    val out = Percentiles.perGroup(df, Seq("g"), col("v"), col("id"), Seq(0.5, 0.9))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) == ((25.0, 37.0)))
    assert(out(2L) == ((5.0, 5.0)))
  }

  test("duplicate values are stable under the tiebreak") {
    val df = Seq((1L, 1L, 7.0), (1L, 2L, 7.0), (1L, 3L, 7.0)).toDF("g", "id", "v")
    val out = Percentiles.perGroup(df, Seq("g"), col("v"), col("id"), Seq(0.5))
      .collect().head
    assert(out.getDouble(1) == 7.0)
  }
}
