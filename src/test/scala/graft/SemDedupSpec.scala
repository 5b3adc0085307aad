package graft

import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions
import graft.operators.{IvfIndex, SemDedup}

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 4

  /** (vec_id, q, n) from integer fixture vectors. */
  private def rel(rows: Seq[(Long, Seq[Long])]) =
    rows.toDF("vec_id", "q")
      .select(col("vec_id"), col("q"),
        VectorExpressions.normQ(col("q")).as("n"))

  test("within-cell near-parallel vectors group; representative keeps") {
    // cell A around +x: 1 and 2 near-parallel (cos ~ 1), 3 orthogonal-ish
    // cell B far away on +y: 4 alone
    val rows = Seq(
      (1L, Seq(1000000L, 1000L, 0L, 0L)),
      (2L, Seq(999000L, 2000L, 0L, 0L)),
      (3L, Seq(1000L, 0L, 990000L, 0L)),
      (4L, Seq(0L, 50000000L, 0L, 0L)))
    val e = rel(rows)
    val cents = IvfIndex.train(e, c = 2, iters = 2, dims = dims)
    val assigned = IvfIndex.assign(e, cents)
    val out = SemDedup.dedup(assigned, tau = 0.9).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((1L, true)))   // representative of {1,2}
    assert(out(2L) == ((1L, false)))  // duplicate, dropped
    assert(out(3L)._2 && out(3L)._1 == 3L) // singleton keeps itself
    assert(out(4L)._2 && out(4L)._1 == 4L)
  }

  test("pairs only form within a cell (the SemDeDup approximation)") {
    // 1 and 2 are exactly parallel but live in far-apart cells when
    // C=2 splits the corpus between the two blobs each sits in
    val rows = Seq(
      (1L, Seq(1000000L, 0L, 0L, 0L)),
      (2L, Seq(90000000L, 0L, 0L, 0L)), // same direction, far cell
      (3L, Seq(995000L, 10000L, 0L, 0L)),
      (4L, Seq(89000000L, 1000000L, 0L, 0L)))
    val e = rel(rows)
    val cents = IvfIndex.train(e, c = 2, iters = 3, dims = dims)
    val assigned = IvfIndex.assign(e, cents)
    val cells = assigned.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells(1L) != cells(2L), "fixture needs 1 and 2 in different cells")
    val p = SemDedup.pairs(assigned, tau = 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!p.contains((1L, 2L)))
    // but the near-parallel SAME-cell pairs are found
    assert(p.contains((1L, 3L)) || p.contains((2L, 4L)))
  }

  test("maxCellDf drops an oversized cell before any pair forms") {
    // one cell of 6 near-identical vectors, one cell of 2
    val rows =
      (1L to 6L).map(i => (i, Seq(1000000L + i, 10L, 0L, 0L))) ++
        Seq((7L, Seq(0L, 80000000L, 0L, 0L)), (8L, Seq(0L, 80000001L, 0L, 0L)))
    val e = rel(rows)
    val cents = IvfIndex.train(e, c = 2, iters = 3, dims = dims)
    val assigned = IvfIndex.assign(e, cents)
    val capped = SemDedup.pairs(assigned, tau = 0.9, maxCellDf = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((7L, 8L)))
    val uncapped = SemDedup.pairs(assigned, tau = 0.9).count()
    assert(uncapped > capped.size)
  }

  test("no pairs above tau: every vector keeps itself") {
    val rows = Seq(
      (1L, Seq(1000000L, 0L, 0L, 0L)),
      (2L, Seq(0L, 1000000L, 0L, 0L)),
      (3L, Seq(0L, 0L, 1000000L, 0L)))
    val e = rel(rows)
    val cents = IvfIndex.train(e, c = 2, iters = 1, dims = dims)
    val out = SemDedup.dedup(IvfIndex.assign(e, cents), tau = 0.99).collect()
    assert(out.length == 3)
    assert(out.forall(_.getBoolean(2)))
  }
}
