package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 1.5), (2L, Some("b"), 2.5), (3L, None, 1.5),
    (4L, Some("a"), -0.5), (5L, Some("c"), 1.5)
  ).toDF("id", "s", "v")

  test("exact profile: counts, nulls, distincts, min/max per column") {
    val got = Profile.profile(df, Seq("id", "s", "v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toList
    assert(got == List(
      ("id", 5L, 0L, 5L, "1", "5"),
      ("s", 5L, 1L, 3L, "a", "c"),
      ("v", 5L, 0L, 3L, "-0.5", "2.5")))
  }

  test("approx mode stays within the HLL error bound on a wide distinct column") {
    val wide = (1L to 20000L).toDF("k")
    val exact = Profile.profile(wide, Seq("k")).collect()(0).getLong(3)
    val approx = Profile.profile(wide, Seq("k"), exact = false).collect()(0).getLong(3)
    assert(exact == 20000L)
    // rsd 2.3% => allow 4 sigma
    assert(math.abs(approx - 20000L) <= 20000L * 0.023 * 4,
      s"approx distinct $approx too far from 20000")
  }

  test("neither mode plans an Expand (the multi-distinct rewrite is avoided)") {
    // a plain multi-distinct agg DOES hit Catalyst's Expand rewrite …
    val aggsExact = df.agg(count_distinct(col("id")), count_distinct(col("s")))
    assert(aggsExact.queryExecution.executedPlan.toString.contains("Expand"))
    // … which is exactly why Profile's exact mode unions per-column
    // aggregates instead, and the approx mode sketches in one pass
    for (exact <- Seq(true, false)) {
      val plan = Profile.profile(df, Seq("id", "s", "v"), exact = exact)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Expand"), s"Expand in exact=$exact plan")
    }
  }
}
