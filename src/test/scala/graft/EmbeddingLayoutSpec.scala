package graft

import graft.queries.EmbeddingQueries

/** The embed_neardup payload layout must be a size-based SWITCH, not
  * a code edit: broadcast-attach under the threshold, payload-through-
  * explode (no corpus join) beyond it — with identical results.
  */
class EmbeddingLayoutSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("payload attach broadcasts below the threshold, not above") {
    val q = SparkEntry.queries("q_embed_neardup")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // small regime (default 10MB threshold vs a tiny sf0.001 table)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      val small = q(spark, sfDir)
      val smallRows = small.collect().map(_.toString).sorted.toSeq
      assert(planOf(q(spark, sfDir)).contains("BroadcastHashJoin"),
        "under-threshold regime should broadcast the vector table")

      // beyond-broadcast regime: broadcasting disabled entirely
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = q(spark, sfDir)
      val bigPlan = planOf(big)
      assert(!bigPlan.contains("BroadcastHashJoin"),
        "beyond-threshold regime must not join back to the corpus")
      assert(!bigPlan.contains("BroadcastNestedLoopJoin"))
      val bigRows = big.collect().map(_.toString).sorted.toSeq
      assert(bigRows == smallRows, "layout switch changed the result")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
