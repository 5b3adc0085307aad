package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connected components labels every member with its component min") {
    // chain 1-2-3-4, pair (10,11), triangle (20,21),(21,22),(20,22)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chain converges (diameter > one iteration)") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
        driverMaxEdges = 0L) // pin the distributed loop
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 12)
    assert(got.forall(_._2 == 1L))
  }

  test("pathological diameter: a 10k-node path converges within default maxIters") {
    // plain min-propagation would need 10k iterations; pointer
    // jumping closes it in ~15. Converging at all within the default
    // maxIters=20 proves the doubling works (non-convergence would
    // leave far nodes labelled > 1).
    val pairs = (1L until 10000L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
        driverMaxEdges = 0L) // pin the DISTRIBUTED loop (the jump path under test)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 10000)
    assert(got.forall(_._2 == 1L))
  }

  test("the CC loop never mutates the caller session's AQE conf") {
    val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    // result is planned on the CALLER's session with its conf intact
    assert(out.sparkSession eq spark)
    assert(out.count() == 3)
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == before)
  }

  test("empty pair list yields an empty labelling, not a crash") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    assert(out.columns.toSeq == Seq("doc_id", "cluster_id"))
    assert(out.count() == 0)
  }

  test("driver union-find and distributed loop agree (both paths, same fixed point)") {
    // chain + triangle + isolated pair, plus string ids on a second set
    val pairs = (Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)) ++
      (30L until 60L).map(i => (i, i + 1))).toDF("doc_a", "doc_b")
    val fast = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val loop = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
        driverMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(fast == loop)
    // string ids: fast path only (the loop's sum-based convergence
    // scalar is numeric-only; large string-id graphs map ids first)
    val sPairs = Seq(("b", "a"), ("b", "c"), ("x", "y")).toDF("doc_a", "doc_b")
    val sFast = Dedup.connectedComponents(sPairs, "doc_a", "doc_b")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(sFast == Seq(("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")))
  }

  test("deterministic across runs") {
    val pairs = Seq((5L, 9L), (9L, 2L), (7L, 8L)).toDF("doc_a", "doc_b")
    val a = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
    assert(a == Seq((2L, 2L), (5L, 2L), (7L, 7L), (8L, 7L), (9L, 2L)))
  }
}
