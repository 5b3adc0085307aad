package graft.operators

/** Turnbull NPMLE for interval-censored survival (Turnbull 1976):
  * each observation is an interval (l, r] known to contain the event
  * time (r = Long.MaxValue for right-censoring); the nonparametric
  * maximum-likelihood estimator places probability mass ONLY on the
  * "Turnbull intervals" — the innermost (q, p] pairs with q a left
  * endpoint, p a right endpoint and no other endpoint strictly
  * between — and the masses solve the self-consistency equations,
  * here by the classic EM iteration (fixed count, uniform init).
  *
  * This is the estimator a training-data pipeline needs when event
  * times are only known to a reporting granularity (weekly churn
  * snapshots, batch audit windows): Kaplan–Meier (#187) assumes
  * exact death days and is biased on interval data; the NPMLE is
  * not. With exact observations (l, l+1] plus right-censoring it
  * REDUCES to Kaplan–Meier (pinned in TurnbullSpec).
  *
  * Scale shape: observations value-collapse to ((l, r), count)
  * cells — bounded by the inspection grid², never the user count —
  * and only those cross to the driver; the EM is O(iters · cells ·
  * intervals) on that table. All driver loops run in sorted cell
  * order, so the fit is bit-reproducible on any partitioning.
  */
object Turnbull {

  /** Right-censoring sentinel for `r`. */
  val Inf: Long = Long.MaxValue

  /** One fitted Turnbull interval: (q, p] with its probability mass
    * and the survival value just after p (1 − cumulative mass).
    */
  final case class Mass(q: Long, p: Long, s: Double, surv: Double)

  /** Turnbull intervals of the observed (l, r] set: innermost
    * [q-from-lefts, p-from-rights] pairs with no other endpoint
    * strictly inside (q, p).
    */
  private[operators] def intervals(obs: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
    val lefts = obs.map(_._1).distinct.sorted
    val rights = obs.map(_._2).distinct.sorted
    val all = (lefts ++ rights).distinct.sorted
    for {
      q <- lefts
      // smallest right endpoint ≥ q…
      p <- rights.find(_ > q).toSeq
      // …with no other endpoint strictly between
      if !all.exists(e => e > q && e < p)
    } yield (q, p)
  }

  /** EM fit. `obs` = ((l, r), count) with l < r (r = [[Inf]] for
    * right-censored). Returns one [[Mass]] per Turnbull interval in
    * time order. Deterministic: fixed `iters`, sorted iteration
    * order everywhere.
    */
  def npmle(obs: Seq[(Long, Long, Long)], iters: Int = 100): Seq[Mass] = {
    require(obs.nonEmpty, "no observations")
    obs.foreach { case (l, r, n) =>
      require(l < r, s"degenerate interval ($l, $r]")
      require(n > 0, s"nonpositive count $n")
    }
    val cells = obs.sortBy(c => (c._1, c._2))
    val ti = intervals(cells)
    val k = ti.length
    val nTot = cells.map(_._3).sum.toDouble
    // membership: Turnbull interval (q, p] ⊆ observation (l, r]
    val member: Array[Array[Boolean]] = cells.map { case (l, r, _) =>
      ti.map { case (q, p) => q >= l && p <= r }.toArray
    }.toArray
    var s = Array.fill(k)(1.0 / k)
    var it = 0
    while (it < iters) {
      val next = new Array[Double](k)
      var i = 0
      while (i < cells.length) {
        val m = member(i)
        var denom = 0.0
        var j = 0
        while (j < k) { if (m(j)) denom += s(j); j += 1 }
        if (denom > 0) {
          val w = cells(i)._3 / denom
          j = 0
          while (j < k) { if (m(j)) next(j) += w * s(j); j += 1 }
        }
        i += 1
      }
      var j = 0
      while (j < k) { next(j) /= nTot; j += 1 }
      s = next
      it += 1
    }
    var cum = 0.0
    ti.zipWithIndex.map { case ((q, p), j) =>
      cum += s(j)
      Mass(q, p, s(j), math.max(1.0 - cum, 0.0))
    }
  }
}
