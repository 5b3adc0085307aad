package graft

import org.apache.spark.sql.functions._
import graft.operators.KMedoids
import graft.expressions.VectorExpressions

/** Behavior pins for the PAM k-medoids operator (#320): planted-cluster
  * recovery, the swap-refinement invariant, rerun determinism, and the
  * k ≥ m degenerate case.
  */
class KMedoidsSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated planted clusters in 4-d quantized units:
    * cluster c centered at c·10_000_000 with small per-point jitter.
    */
  private def planted = {
    val rows = for {
      c <- 0 until 3
      i <- 0 until 10
    } yield {
      val id = (c * 10 + i).toLong
      val base = c.toLong * 10000000L
      (id, Seq(base + i * 13L, base - i * 7L, base + i * 3L, base - i * 11L))
    }
    rows.toDF("vec_id", "q")
  }

  test("PAM recovers one medoid per planted cluster and assigns exactly") {
    val model = KMedoids.train(planted, k = 3, sampleMax = 100)
    assert(model.medoidIds.length === 3)
    // one medoid inside each planted id range
    assert(model.medoidIds.map(_ / 10).sorted.toSeq === Seq(0L, 1L, 2L))
    // corpus assignment groups exactly by planted cluster
    val cells = planted.select(col("vec_id"),
        element_at(VectorExpressions.nearestCellScore(col("q"), model.medoids), 1)
          .as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = cells.groupBy(_._1 / 10).view.mapValues(_.map(_._2).toSet)
    byCluster.foreach { case (cl, cs) =>
      assert(cs.size === 1, s"cluster $cl split across cells: $cs")
    }
    assert(byCluster.values.flatten.toSet.size === 3, "clusters merged")
  }

  test("SWAP never worsens the BUILD objective; reruns are bit-identical") {
    val m1 = KMedoids.train(planted, k = 3, sampleMax = 100)
    val m2 = KMedoids.train(planted, k = 3, sampleMax = 100)
    assert(m1.finalCostMicro <= m1.buildCostMicro)
    assert(m1.medoidIds.toSeq === m2.medoidIds.toSeq)
    assert(m1.finalCostMicro === m2.finalCostMicro)
    assert(m1.nSwaps === m2.nSwaps)
  }

  test("k >= sample size makes every point a medoid at zero cost") {
    val tiny = Seq(
      (5L, Seq(0L, 0L, 0L, 0L)),
      (1L, Seq(1000L, 0L, 0L, 0L)),
      (9L, Seq(0L, 2000L, 0L, 0L))).toDF("vec_id", "q")
    val model = KMedoids.train(tiny, k = 5, sampleMax = 100)
    assert(model.medoidIds.toSeq === Seq(1L, 5L, 9L)) // ascending id
    assert(model.finalCostMicro === 0L)
  }

  test("medoids are actual sample vectors (not synthetic means)") {
    val model = KMedoids.train(planted, k = 3, sampleMax = 100)
    val byId = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    model.medoidIds.zip(model.medoids).foreach { case (id, v) =>
      assert(byId(id).toSeq === v.toSeq, s"medoid $id is not its sample vector")
    }
  }
}
