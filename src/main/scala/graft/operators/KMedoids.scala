package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-medoids (PAM — Kaufman & Rousseeuw 1990) over a hard row-bounded
  * deterministic sample: the MEDOID refinement of the cluster-quality
  * family (#300/#303/#305/#309) — where k-means centroids are synthetic
  * points that elongated / non-convex / outlier-ridden clusters pull off
  * the data manifold, PAM's centers are actual corpus vectors, so the
  * model is robust to exactly the shapes the sampled silhouette (#309)
  * measures.
  *
  * Scale design (the IvfIndex discipline): the full PAM objective is
  * quadratic, so it runs on a BOUNDED sample — the `sampleMax` smallest
  * (portable md5, vec_id) keys, a hard ROW bound at any corpus size (the
  * #309 sample shape; one TakeOrdered). The m×m distance matrix and the
  * BUILD+SWAP search are driver arithmetic over exact integers (model
  * state, never corpus state); the corpus then assigns to the k medoid
  * vectors through the native [[graft.expressions.VectorExpressions
  * .nearestCellScore]] literal-matrix expression — zero joins, zero
  * shuffles, streaming-safe.
  *
  * Determinism (required by the rows-only gate): pair dissimilarities
  * are micro-floored Euclidean distances of the fixed-point vectors
  * (exact longs in, one IEEE sqrt + floor out); BUILD picks by
  * (max gain, first in sample order); SWAP applies the single best
  * (most negative ΔT, first in deterministic scan order) swap per
  * round to a fixpoint — bit-identical reruns on any partitioning.
  */
object KMedoids {

  /** @param medoidIds      sample vec_ids chosen as medoids (ascending
    *                       cell order = the literal matrix row order)
    * @param medoids        quantized medoid vectors (cell i = row i)
    * @param buildCostMicro sample objective after greedy BUILD
    * @param finalCostMicro sample objective after SWAP fixpoint
    * @param nSwaps         swaps applied before the fixpoint
    */
  final case class Model(medoidIds: Array[Long], medoids: Array[Array[Long]],
                         buildCostMicro: Long, finalCostMicro: Long, nSwaps: Int)

  /** Train PAM on the deterministic sample of `vectors` —
    * (vec_id, q) rows with `q` the fixed-point quantized vector.
    */
  def train(vectors: DataFrame, k: Int, sampleMax: Int = 400,
            maxSwaps: Int = 64): Model = {
    require(k >= 1, s"k out of range: $k")
    val smp = vectors
      .withColumn("_hb", TextOps.baseHash(
        concat(lit("kmed:"), col("vec_id").cast("string"))))
      .orderBy(col("_hb"), col("vec_id"))
      .limit(sampleMax)
      .select(col("vec_id"), col("q"))
      .collect()
    val ids = smp.map(_.getLong(0))
    val vs = smp.map(_.getSeq[Long](1).toArray)
    val m = ids.length
    require(m >= 1, "empty sample")
    // micro-floored Euclidean dissimilarity matrix (exact integer d²
    // in, one IEEE sqrt + floor out — the #309 pair-distance form)
    val dist = Array.ofDim[Long](m, m)
    var i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        var d2 = 0L
        var t = 0
        val a = vs(i); val b = vs(j)
        while (t < a.length) { val df = a(t) - b(t); d2 += df * df; t += 1 }
        val d = math.floor(math.sqrt(d2.toDouble) * 1e6).toLong
        dist(i)(j) = d; dist(j)(i) = d
        j += 1
      }
      i += 1
    }
    if (k >= m) {
      // every sample point is a medoid; cost 0 by definition
      val ord = ids.indices.sortBy(ids(_)).toArray
      return Model(ord.map(ids(_)), ord.map(vs(_)), 0L, 0L, 0)
    }
    val isMed = new Array[Boolean](m)
    val meds = new scala.collection.mutable.ArrayBuffer[Int](k)
    // BUILD: first center minimizes total distance; each next center
    // maximizes the cost reduction. Ties -> smallest sample index
    // (sample order is (hash, vec_id) — deterministic).
    var best = -1; var bestTot = Long.MaxValue
    i = 0
    while (i < m) {
      var tot = 0L; var j = 0
      while (j < m) { tot += dist(i)(j); j += 1 }
      if (tot < bestTot) { bestTot = tot; best = i }
      i += 1
    }
    meds += best; isMed(best) = true
    val nearest = Array.tabulate(m)(j => dist(best)(j))
    while (meds.length < k) {
      var bh = -1; var bGain = -1L
      var h = 0
      while (h < m) {
        if (!isMed(h)) {
          var gain = 0L; var j = 0
          while (j < m) {
            val g = nearest(j) - dist(h)(j)
            if (g > 0) gain += g
            j += 1
          }
          if (gain > bGain) { bGain = gain; bh = h }
        }
        h += 1
      }
      meds += bh; isMed(bh) = true
      var j = 0
      while (j < m) {
        if (dist(bh)(j) < nearest(j)) nearest(j) = dist(bh)(j)
        j += 1
      }
    }
    def objective(): Long = {
      var c = 0L; var j = 0
      while (j < m) { c += nearest(j); j += 1 }
      c
    }
    // nearest + second-nearest medoid distances for the SWAP phase
    val second = new Array[Long](m)
    def refresh(): Unit = {
      var j = 0
      while (j < m) {
        var n1 = Long.MaxValue; var n2 = Long.MaxValue
        meds.foreach { mi =>
          val d = dist(mi)(j)
          if (d < n1) { n2 = n1; n1 = d } else if (d < n2) n2 = d
        }
        nearest(j) = n1; second(j) = n2
        j += 1
      }
    }
    refresh()
    val buildCost = objective()
    // SWAP: apply the single best strictly-improving (medoid, candidate)
    // swap per round until none improves (or the runaway backstop).
    var swaps = 0
    var improved = true
    while (improved && swaps < maxSwaps) {
      improved = false
      var bMi = -1; var bH = -1; var bDelta = 0L
      var mi = 0
      while (mi < meds.length) {
        val medIdx = meds(mi)
        var h = 0
        while (h < m) {
          if (!isMed(h)) {
            var delta = 0L
            var j = 0
            while (j < m) {
              val dh = dist(h)(j)
              val nd =
                if (dist(medIdx)(j) == nearest(j)) math.min(second(j), dh)
                else math.min(nearest(j), dh)
              delta += nd - nearest(j)
              j += 1
            }
            if (delta < bDelta) { bDelta = delta; bMi = mi; bH = h }
          }
          h += 1
        }
        mi += 1
      }
      if (bDelta < 0L) {
        isMed(meds(bMi)) = false
        meds(bMi) = bH
        isMed(bH) = true
        refresh()
        swaps += 1
        improved = true
      }
    }
    // canonical cell order: ascending medoid vec_id (stable output)
    val order = meds.toArray.sortBy(ids(_))
    Model(order.map(ids(_)), order.map(vs(_)), buildCost, objective(), swaps)
  }
}
