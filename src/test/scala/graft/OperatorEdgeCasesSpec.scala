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
}
