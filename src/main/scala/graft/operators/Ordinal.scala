package graft.operators

/** Proportional-odds (cumulative-logit) ordinal regression with a
  * FULL Newton fit (McCullagh 1980): for ordered categories
  * j = 0..J−1 and a covariate x,
  *
  *   P(Y ≤ j | x) = σ(θ_j − β·x),   j = 0..J−2,
  *
  * with one shared slope β (the "proportional odds" constraint) and
  * J−1 ordered cutpoints θ. The full Newton step uses the ANALYTIC
  * gradient and Hessian of the multinomial log-likelihood — not
  * Fisher scoring, not a diagonal approximation — with deterministic
  * step-halving when a step would lower the likelihood.
  *
  * Scale shape (the Platt/IvfIndex model-state discipline): the
  * corpus value-collapses to the (x, j) contingency counts — at most
  * |x-domain|·J cells — and ONLY those cross to the driver; the fit
  * is a few hundred flops on that table, and the fitted curve
  * deploys back into plans as literals. Every driver loop runs in a
  * fixed order over the fixed cell list, so the fit is
  * bit-reproducible on any partitioning (pinned in OrdinalSpec).
  */
object Ordinal {

  /** Fitted model: ordered cutpoints θ (length J−1) and slope β. */
  final case class PropOdds(theta: Array[Double], beta: Double)

  private def sigma(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Cell probability π_j(x) under (θ, β). */
  private def cellProb(theta: Array[Double], beta: Double,
                       x: Double, j: Int): Double = {
    val jm = theta.length // J - 1
    val hi = if (j >= jm) 1.0 else sigma(theta(j) - beta * x)
    val lo = if (j == 0) 0.0 else sigma(theta(j - 1) - beta * x)
    hi - lo
  }

  private def logLik(cells: Seq[(Int, Int, Long)], theta: Array[Double],
                     beta: Double): Double = {
    var ll = 0.0
    cells.foreach { case (x, j, n) =>
      val p = cellProb(theta, beta, x.toDouble, j)
      ll += (if (p > 0) n * math.log(p) else Double.NegativeInfinity)
    }
    ll
  }

  /** Full-Newton ML fit over the value-collapsed contingency cells
    * `(x, j, count)` with x ∈ {0, 1} and j ∈ 0..J−1 (J ≥ 2 inferred
    * from the max j). Deterministic: fixed iteration count, fixed
    * in-order accumulation, Gaussian elimination with partial
    * pivoting on exact comparisons, and at most `maxHalvings`
    * likelihood-guarded step halvings per iteration.
    */
  def fitPropOdds(cells: Seq[(Int, Int, Long)], iters: Int = 30,
                  maxHalvings: Int = 20): PropOdds = {
    require(cells.nonEmpty, "no cells")
    val byKey = cells.sortBy(c => (c._1, c._2))
    val jMax = byKey.map(_._2).max
    require(jMax >= 1, s"need >= 2 categories, max j = $jMax")
    val jm = jMax // number of cutpoints = J - 1
    val dim = jm + 1 // params: theta_0..theta_{jm-1}, beta
    val nTot = byKey.map(_._3).sum.toDouble
    // init: empirical overall cumulative logits, beta = 0
    val theta = new Array[Double](jm)
    var acc = 0.0
    var j = 0
    while (j < jm) {
      acc += byKey.filter(_._2 == j).map(_._3).sum.toDouble
      // clamp so an empty leading/trailing cell cannot produce ±inf
      val c = math.min(math.max(acc / nTot, 1e-6), 1.0 - 1e-6)
      theta(j) = math.log(c / (1.0 - c))
      j += 1
    }
    var beta = 0.0
    var it = 0
    while (it < iters) {
      // gradient + Hessian of LL at (theta, beta)
      val g = new Array[Double](dim)
      val h = Array.fill(dim)(new Array[Double](dim))
      byKey.foreach { case (x, jj, n) =>
        if (n > 0) {
          val xd = x.toDouble
          val p = cellProb(theta, beta, xd, jj)
          if (p > 1e-300) {
            // u = dπ/dp, v = d²π/dpdq via γ_j = σ(θ_j − βx):
            // dγ = σ'·a, d²γ = σ''·a a', a_k = δ_{jk}, a_β = −x
            val u = new Array[Double](dim)
            val v = Array.fill(dim)(new Array[Double](dim))
            def addBoundary(b: Int, sign: Double): Unit = {
              if (b >= 0 && b < jm) {
                val s = sigma(theta(b) - beta * xd)
                val s1 = s * (1.0 - s)
                val s2 = s1 * (1.0 - 2.0 * s)
                val a = new Array[Double](dim)
                a(b) = 1.0
                a(dim - 1) = -xd
                var pp = 0
                while (pp < dim) {
                  u(pp) += sign * s1 * a(pp)
                  var qq = 0
                  while (qq < dim) {
                    v(pp)(qq) += sign * s2 * a(pp) * a(qq)
                    qq += 1
                  }
                  pp += 1
                }
              }
            }
            addBoundary(jj, 1.0)      // γ_j term (absent when j = J−1)
            addBoundary(jj - 1, -1.0) // −γ_{j−1} term (absent when j = 0)
            val w = n / p
            var pp = 0
            while (pp < dim) {
              g(pp) += w * u(pp)
              var qq = 0
              while (qq < dim) {
                h(pp)(qq) += w * (v(pp)(qq) - u(pp) * u(qq) / p)
                qq += 1
              }
              pp += 1
            }
          }
        }
      }
      // Newton step: solve H d = g (H is the LL Hessian, negative
      // definite near the optimum), p ← p − d
      val d = solve(h, g)
      val ll0 = logLik(byKey, theta, beta)
      var step = 1.0
      var halved = 0
      var accepted = false
      while (!accepted && halved <= maxHalvings) {
        val t2 = Array.tabulate(jm)(k => theta(k) - step * d(k))
        val b2 = beta - step * d(dim - 1)
        if (logLik(byKey, t2, b2) >= ll0 - 1e-12) {
          System.arraycopy(t2, 0, theta, 0, jm)
          beta = b2
          accepted = true
        } else { step *= 0.5; halved += 1 }
      }
      it += 1
    }
    PropOdds(theta, beta)
  }

  /** In-place Gaussian elimination with partial pivoting (exact
    * comparisons — deterministic). Returns the solution of A x = b;
    * a (near-)singular pivot yields a zero component instead of NaN
    * so a rank-deficient design degrades to a no-op step.
    */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (piv != col) {
        val tr = a(piv); a(piv) = a(col); a(col) = tr
        val tb = b(piv); b(piv) = b(col); b(col) = tb
      }
      val p = a(col)(col)
      if (math.abs(p) > 1e-300) {
        r = col + 1
        while (r < n) {
          val f = a(r)(col) / p
          var c = col
          while (c < n) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
          r += 1
        }
      }
      col += 1
    }
    val x = new Array[Double](n)
    var row = n - 1
    while (row >= 0) {
      var s = b(row)
      var c = row + 1
      while (c < n) { s -= a(row)(c) * x(c); c += 1 }
      x(row) = if (math.abs(a(row)(row)) > 1e-300) s / a(row)(row) else 0.0
      row -= 1
    }
    x
  }
}
