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

  test("ntileBucketStats matches window-ntile aggregation exactly") {
    // heavy ties, group sizes spanning n<k, n=k, n>>k, n=1
    val rnd = new scala.util.Random(42)
    val rows = (for {
      g <- 1 to 6
      n = Seq(1, 2, 3, 4, 7, 1000)(g - 1)
      i <- 1 to n
    } yield (g.toLong, i.toLong, (rnd.nextInt(20) * 10).toLong)).toSeq
    val df = rows.toDF("g", "id", "v")
    for (k <- Seq(1, 3, 4, 5)) {
      val fast = Percentiles.ntileBucketStats(df.select($"g", $"v"), Seq("g"), col("v"), k)
        .select($"g", $"bucket", $"n", $"lo", $"hi")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val exact = Percentiles.ntileRows(df, Seq("g"), col("v"), col("id"), k)
        .groupBy($"g", $"bucket")
        .agg(count(lit(1)).as("n"), min($"v").as("lo"), max($"v").as("hi"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(fast == exact, s"k=$k: bucket stats diverge from window ntile")
    }
  }

  test("ntileBucketStats handles null values like window ntile") {
    // nulls sort first in both the collapsed window and ntile's order
    val rows = Seq((1L, 1L, Some(5L)), (1L, 2L, None), (1L, 3L, Some(5L)),
      (1L, 4L, None), (1L, 5L, Some(9L)), (1L, 6L, Some(1L)), (1L, 7L, Some(9L)))
    val df = rows.toDF("g", "id", "v")
    val fast = Percentiles.ntileBucketStats(df.select($"g", $"v"), Seq("g"), col("v"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    val exact = Percentiles.ntileRows(df, Seq("g"), col("v"), col("id"), 3)
      .groupBy($"g", $"bucket")
      .agg(count(lit(1)).as("n"), min($"v").as("lo"), max($"v").as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(fast == exact)
  }

  test("ntileBucketStats never sorts the raw relation in a window") {
    // scale guard: every Window in the plan must sit above a hash
    // aggregate (the collapse to distinct values), never directly on
    // the source rows
    val df = (1 to 100).map(i => (i % 3, i)).toDF("g", "v")
    val out = Percentiles.ntileBucketStats(df, Seq("g"), col("v"), 4)
    out.collect() // materialize so AQE finalizes the physical plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(walk)
    }
    def hasAggBelow(p: SparkPlan): Boolean =
      walk(p).exists(_.isInstanceOf[HashAggregateExec])
    val windows = walk(out.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected a window over the collapsed relation")
    windows.foreach { w =>
      assert(w.children.forall(hasAggBelow),
        "window input is not the collapsed (group, value) relation")
    }
  }

  test("approx_percentile (GK sketch) stays within its rank-error bound vs exact") {
    // the scale path for quantiles over corpus-sized groups: one
    // mergeable sketch aggregate, no order statistics; accuracy knob =
    // max rank error 1/accuracy
    import spark.implicits._
    val n = 10000
    val df = (1 to n).map(_.toLong).toDF("v").repartition(8)
    val accuracy = 100 // rank error <= n / accuracy = 100 ranks
    val got = df.agg(
      expr(s"approx_percentile(v, array(0.1, 0.5, 0.99), $accuracy)")).collect()(0)
      .getSeq[Long](0)
    val exactR = Seq(0.1, 0.5, 0.99).map(p => (p * n).toLong)
    got.zip(exactR).foreach { case (g, e) =>
      assert(math.abs(g - e) <= n / accuracy + 1,
        s"approx $g vs exact rank $e exceeds the bound")
    }
    // determinism: the sketch is deterministic for a fixed partitioning
    val again = df.coalesce(1).agg(
      expr(s"approx_percentile(v, array(0.1, 0.5, 0.99), $accuracy)")).collect()(0)
      .getSeq[Long](0)
    val again2 = df.coalesce(1).agg(
      expr(s"approx_percentile(v, array(0.1, 0.5, 0.99), $accuracy)")).collect()(0)
      .getSeq[Long](0)
    assert(again == again2)
  }
}
