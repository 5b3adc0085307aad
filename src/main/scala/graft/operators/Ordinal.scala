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

  /** DuckDB CTE-chain replay of [[fitPropOdds]] for the x ∈ {0, 1},
    * J = 4 instantiation (jm = 3 cutpoints, dim = 4 params): every
    * Newton iteration re-derives the driver's gradient/Hessian cell
    * folds (same (x, j) order, same parenthesization), runs the 4×4
    * partial-pivot Gaussian elimination as unrolled swap/eliminate
    * LATERAL steps (the q_markov_attrib recipe — `ORDER BY |a| DESC,
    * i` mirrors the driver's strict-> first-max pivot), back-
    * substitutes with the driver's ascending-column subtraction
    * order, and replays the deterministic step halving as a
    * 21-candidate log-likelihood comprehension taking the FIRST
    * accepted power-of-two step (exact 2^-s via integer shift).
    * Assumes a prior CTE `cells(x, y, n)` with all four tiers
    * occupied (jMax = 3 — the gate's fixed-cent thresholds guarantee
    * it at every tested scale). Emits CTEs cl/tier/init/newt/fin;
    * `fin.p` = [θ0, θ1, θ2, β] after `iters` iterations.
    */
  def replaySql(iters: Int = 30, maxHalvings: Int = 20): String = {
    val jm = 3
    val dim = jm + 1 // 4
    val aw = dim + 1 // augmented row width 5
    val nCand = maxHalvings + 1 // 21 step candidates
    // init thetas: ordered double accumulation of tier shares
    def accj(j: Int): String =
      (1 to j).foldLeft("tier.t0")((a, k) => s"($a + tier.t$k)")
    def thj(j: Int): String = {
      val c = s"least(greatest(${accj(j)} / cl.ntot, 1e-6), 1e0 - 1e-6)"
      s"ln($c / (1e0 - $c))"
    }
    // sigmoid at boundary b for current params st.p; bIdx1 = b + 1 as
    // a SQL index expression
    def sig(bIdx1: String, xd: String): String =
      s"1e0 / (1e0 + exp(-(st.p[$bIdx1] - st.p[4] * $xd)))"
    // a-vector components of boundary b (index expr) at param k
    def aVec(k: Int, bEq: String, xd: String): String =
      if (k == dim - 1) s"(-$xd)"
      else s"(CASE WHEN $bEq = $k THEN 1e0 ELSE 0e0 END)"
    def uK(k: Int): String =
      s"(CASE WHEN r.jj < $jm THEN (r.sa * (1e0 - r.sa)) * ${aVec(k, "r.jj", "r.xd")} ELSE 0e0 END)" +
        s" + (CASE WHEN r.jj >= 1 THEN (-(r.sb * (1e0 - r.sb))) * ${aVec(k, "r.jj - 1", "r.xd")} ELSE 0e0 END)"
    val pcExpr = s"(CASE WHEN r.jj >= $jm THEN 1e0 ELSE r.sa END)" +
      s" - (CASE WHEN r.jj = 0 THEN 0e0 ELSE r.sb END)"
    def fold(body: String, over: String, v: String): String =
      s"list_reduce(list_prepend(0e0, [$body for $v in $over]), (aa, bb) -> aa + bb)"
    def gK(k: Int): String =
      fold(s"CASE WHEN c.pc > 1e-300 THEN c.w * c.u[${k + 1}] ELSE 0e0 END", "k1.cc", "c")
    def vKL(k: Int, l: Int): String =
      s"(CASE WHEN c.jj < $jm THEN (c.s2a * ${aVec(k, "c.jj", "c.xd")}) * ${aVec(l, "c.jj", "c.xd")} ELSE 0e0 END)" +
        s" + (CASE WHEN c.jj >= 1 THEN (c.s2bn * ${aVec(k, "c.jj - 1", "c.xd")}) * ${aVec(l, "c.jj - 1", "c.xd")} ELSE 0e0 END)"
    def hKL(k: Int, l: Int): String =
      fold(s"CASE WHEN c.pc > 1e-300 THEN c.w * ((${vKL(k, l)})" +
        s" - (c.u[${k + 1}] * c.u[${l + 1}]) / c.pc) ELSE 0e0 END", "k1.cc", "c")
    val augEntries = (0 until dim).flatMap(k =>
      (0 until dim).map(l => hKL(k, l)) :+ gK(k)).mkString(",\n    ")
    // elimination: one pivot + swap + eliminate LATERAL triple per column
    def elim(c: Int): String = {
      val prev = if (c == 0) "k2.a" else s"el${c - 1}.e"
      val diag = c * aw + c + 1
      s"""LATERAL (SELECT ii.i AS piv FROM (SELECT unnest(range(0, cl.pd)) AS i) ii
         |    WHERE ii.i >= $c
         |    ORDER BY abs($prev[CAST(ii.i AS INTEGER) * $aw + ${c + 1}]) DESC, ii.i LIMIT 1) pv$c,
         |  LATERAL (SELECT [CASE
         |      WHEN i // $aw = $c THEN $prev[CAST(pv$c.piv AS INTEGER) * $aw + (i % $aw) + 1]
         |      WHEN i // $aw = pv$c.piv THEN $prev[$c * $aw + (i % $aw) + 1]
         |      ELSE $prev[i + 1] END for i in range(0, cl.ad)] AS s) sw$c,
         |  LATERAL (SELECT CASE WHEN abs(sw$c.s[$diag]) > 1e-300 THEN
         |      [CASE WHEN i // $aw > $c AND i % $aw >= $c THEN
         |         sw$c.s[i + 1] - (sw$c.s[(i // $aw) * $aw + ${c + 1}] / sw$c.s[$diag]) * sw$c.s[$c * $aw + (i % $aw) + 1]
         |       ELSE sw$c.s[i + 1] END for i in range(0, cl.ad)]
         |      ELSE sw$c.s END AS e) el$c""".stripMargin
    }
    val elims = (0 until dim).map(elim).mkString(",\n  ")
    val eFin = s"el${dim - 1}.e"
    // back-substitution: driver's ascending-column subtraction order
    def bRow(row: Int): String = {
      val b0 = s"$eFin[${row * aw + dim + 1}]"
      val s = (row + 1 until dim).foldLeft(b0)((acc, cc) =>
        s"($acc - $eFin[${row * aw + cc + 1}] * xb$cc.x)")
      val diag = s"$eFin[${row * aw + row + 1}]"
      s"LATERAL (SELECT CASE WHEN abs($diag) > 1e-300 THEN $s / $diag ELSE 0e0 END AS x) xb$row"
    }
    val backs = (dim - 1 to 0 by -1).map(bRow).mkString(",\n  ")
    val dList = (0 until dim).map(k => s"xb$k.x").mkString(", ")
    // candidate step 2^-s (exact), candidate params, candidate LL
    val stp = "(1e0 / CAST((1 << CAST(s AS INTEGER)) AS DOUBLE))"
    def sigq(bIdx1: String): String =
      s"1e0 / (1e0 + exp(-((st.p[$bIdx1] - $stp * dd.d[$bIdx1])" +
        s" - (st.p[4] - $stp * dd.d[4]) * r.xd)))"
    val pcs = s"((CASE WHEN r.jj >= $jm THEN 1e0 ELSE ${sigq("r.jj + 1")} END)" +
      s" - (CASE WHEN r.jj = 0 THEN 0e0 ELSE ${sigq("r.jj")} END))"
    val llCand = fold(s"CASE WHEN $pcs > 0e0 THEN r.nn * ln($pcs)" +
      " ELSE CAST('-infinity' AS DOUBLE) END", "k0.raw", "r")
    val ll0 = fold("CASE WHEN c.pc > 0e0 THEN c.nn * ln(c.pc)" +
      " ELSE CAST('-infinity' AS DOUBLE) END", "k1.cc", "c")
    s"""cl AS MATERIALIZED (SELECT list(CAST(x AS DOUBLE) ORDER BY x, y) AS xs,
       |    list(CAST(y AS INTEGER) ORDER BY x, y) AS js,
       |    list(CAST(n AS DOUBLE) ORDER BY x, y) AS ns,
       |    CAST(count(*) AS INTEGER) AS cnum, CAST(sum(n) AS DOUBLE) AS ntot,
       |    $dim AS pd, ${dim * aw} AS ad, $nCand AS sh
       |  FROM cells),
       |tier AS (SELECT
       |    ${(0 until jm).map(j =>
             s"CAST(coalesce(sum(n) FILTER (WHERE y = $j), 0) AS DOUBLE) AS t$j")
             .mkString(",\n    ")}
       |  FROM cells),
       |init AS (SELECT [${(0 until jm).map(thj).mkString(", ")}, 0e0] AS p FROM tier, cl),
       |newt AS (
       |  SELECT 0 AS it, init.p AS p FROM init
       |  UNION ALL
       |  SELECT st.it + 1, upd.pn
       |  FROM newt st, cl,
       |  LATERAL (SELECT [{'xd': cl.xs[ci + 1], 'jj': cl.js[ci + 1], 'nn': cl.ns[ci + 1],
       |      'sa': CASE WHEN cl.js[ci + 1] < $jm THEN ${sig("cl.js[ci + 1] + 1", "cl.xs[ci + 1]")} ELSE 0e0 END,
       |      'sb': CASE WHEN cl.js[ci + 1] >= 1 THEN ${sig("cl.js[ci + 1]", "cl.xs[ci + 1]")} ELSE 0e0 END}
       |    for ci in range(0, cl.cnum)] AS raw) k0,
       |  LATERAL (SELECT [{'pc': $pcExpr, 'w': r.nn / ($pcExpr), 'nn': r.nn,
       |      'jj': r.jj, 'xd': r.xd,
       |      'u': [${(0 until dim).map(uK).mkString(",\n           ")}],
       |      's2a': CASE WHEN r.jj < $jm THEN (r.sa * (1e0 - r.sa)) * (1e0 - 2e0 * r.sa) ELSE 0e0 END,
       |      's2bn': CASE WHEN r.jj >= 1 THEN -((r.sb * (1e0 - r.sb)) * (1e0 - 2e0 * r.sb)) ELSE 0e0 END}
       |    for r in k0.raw] AS cc) k1,
       |  LATERAL (SELECT [$augEntries] AS a) k2,
       |  $elims,
       |  $backs,
       |  LATERAL (SELECT [$dList] AS d) dd,
       |  LATERAL (SELECT $ll0 AS v) ll,
       |  LATERAL (SELECT [$llCand for s in range(0, cl.sh)] AS l) ls,
       |  LATERAL (SELECT [s for s in range(0, cl.sh)
       |      if ls.l[CAST(s AS INTEGER) + 1] >= ll.v - 1e-12] AS sel) se,
       |  LATERAL (SELECT CASE WHEN len(se.sel) > 0 THEN
       |      [st.p[k + 1] - (1e0 / CAST((1 << CAST(se.sel[1] AS INTEGER)) AS DOUBLE)) * dd.d[k + 1]
       |       for k in range(0, cl.pd)]
       |    ELSE st.p END AS pn) upd
       |  WHERE st.it < $iters
       |),
       |fin AS MATERIALIZED (SELECT p FROM newt WHERE it = $iters)""".stripMargin
  }

  /** In-place Gaussian elimination with partial pivoting (exact
    * comparisons — deterministic). Returns the solution of A x = b;
    * a (near-)singular pivot yields a zero component instead of NaN
    * so a rank-deficient design degrades to a no-op step.
    */
  private[operators] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
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
