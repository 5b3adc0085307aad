package graft.operators

/** Restricted cubic-spline (natural-spline) rate-curve fitting
  * (Harrell 2001 §2.4.4; Stone & Koo 1985): smooth a bounded grid
  * series — here an hourly event-rate curve — with the 4-knot
  * restricted cubic basis (linear in the tails, the property that
  * makes extrapolation honest for hazard/rate shapes), fit by
  * closed-form least squares.
  *
  * Model: y ≈ β₀ + β₁·x + γ₁·B₁(x) + γ₂·B₂(x), where for knots
  * k₁<k₂<k₃<k₄ and c³₊(x,k) = max(x−k, 0)³,
  *
  *   B_j(x) = c³₊(x,k_j) − c³₊(x,k₃)·(k₄−k_j)/(k₄−k₃)
  *            + c³₊(x,k₄)·(k₃−k_j)/(k₄−k₃),   j = 1, 2.
  *
  * Scale shape (the q_theil_sen convention): the fit input is the
  * CALENDAR-BOUNDED hour grid, never the corpus — the corpus
  * collapses to (hour, count) in one aggregate, only the grid crosses
  * to the driver, and the 4×4 normal-equation solve is model-sized
  * flops. Determinism: knots are exact integer floor positions of the
  * grid span; the normal equations accumulate in ascending-x order
  * with a fixed per-row operation order (the kalman/holt ordered-fold
  * discipline), the solve is [[Ordinal.solve]]'s deterministic
  * partial-pivot elimination, and every emitted value is one
  * micro-floor — so the DuckDB oracle replays the whole fit
  * bit-identically (ordered list folds + the unrolled-elimination
  * recipe).
  */
object Spline {

  /** 4 knot positions at 5/35/65/95% of the integer span (Harrell's
    * recommended placement), exact integer floors. Degenerate spans
    * fail loudly: integer floors collapse adjacent knots once
    * xmax−xmin < 4 (e.g. span 3 gives k₂ = k₃, span ≤ 2 gives
    * k₃ = k₄ and [[basis]] would divide by zero — NaN driver-side,
    * engine-dependent in the DuckDB mirror). A 4-knot spline on a
    * sub-4-point grid is meaningless anyway. */
  def knots(xmin: Long, xmax: Long): Array[Long] = {
    val ks = Array(5L, 35L, 65L, 95L).map(p => xmin + (xmax - xmin) * p / 100)
    require(ks(0) < ks(1) && ks(1) < ks(2) && ks(2) < ks(3),
      s"spline: grid span ${xmax - xmin} too small for 4 distinct knots " +
        s"(got ${ks.mkString("[", ", ", "]")}) — need xmax - xmin >= 4")
    ks
  }

  /** Restricted-cubic basis value B_j(x) (j = 0 or 1 selecting knot
    * k₁ or k₂) — fixed double op order, mirrored by [[basisSql]]. */
  def basis(x: Double, ks: Array[Long], j: Int): Double = {
    def cube(k: Long): Double = { val t = x - k; if (t > 0) t * t * t else 0.0 }
    val k3 = ks(2); val k4 = ks(3)
    cube(ks(j)) - cube(k3) * ((k4 - ks(j)).toDouble / (k4 - k3).toDouble) +
      cube(k4) * ((k3 - ks(j)).toDouble / (k4 - k3).toDouble)
  }

  /** DuckDB mirror of [[basis]] with `x` a DOUBLE SQL expression and
    * knots referenced as columns of a CTE row (k1..k4 BIGINT). */
  def basisSql(x: String, kj: String): String = {
    def cube(k: String) =
      s"(CASE WHEN ($x - $k) > 0 THEN (($x - $k) * ($x - $k)) * ($x - $k) ELSE 0e0 END)"
    s"((${cube(kj)} - ${cube("k3")} * (CAST(k4 - $kj AS DOUBLE) / CAST(k4 - k3 AS DOUBLE)))" +
      s" + ${cube("k4")} * (CAST(k3 - $kj AS DOUBLE) / CAST(k4 - k3 AS DOUBLE)))"
  }

  /** Fitted coefficients (β₀, β₁, γ₁, γ₂) from (x, y) grid rows
    * sorted ascending by x: normal equations accumulated in that
    * order with the fixed per-row op order the oracle replays, then
    * [[Ordinal.solve]]. */
  def fit(rows: Seq[(Long, Long)], ks: Array[Long]): Array[Double] = {
    require(rows.nonEmpty, "spline: empty grid — nothing to fit")
    val a = Array.fill(4)(new Array[Double](4))
    val b = new Array[Double](4)
    rows.foreach { case (xi, yi) =>
      val x = xi.toDouble
      val z = Array(1.0, x, basis(x, ks, 0), basis(x, ks, 1))
      var p = 0
      while (p < 4) {
        var q = 0
        while (q < 4) { a(p)(q) += z(p) * z(q); q += 1 }
        b(p) += z(p) * yi.toDouble
        p += 1
      }
    }
    Ordinal.solve(a, b)
  }

  /** Scala mirror of the cube: t = x−k as doubles. */
  def cubeD(x: Double, k: Long): Double = { val t = x - k; if (t > 0) t * t * t else 0.0 }

  /** DuckDB CTE chain replaying [[fit]] + 12-point evaluation,
    * assuming a prior CTE `grid(x BIGINT, y BIGINT)`. Emits CTEs
    * bnds/kk/ls/e0/pv·sw·el per column/xb·/cf; `cf.c` =
    * [β₀, β₁, γ₁, γ₂]. The elimination mirrors Ordinal.solve: partial
    * pivot by `ORDER BY |a| DESC, i` (the driver's strict-> keeps the
    * first max), swap + eliminate rows below, ascending-column back
    * substitution, 1e-300 pivot guards.
    */
  def fitReplaySql: String = {
    val aw = 5 // augmented row width: 4 matrix cols + rhs
    def zp(p: Int, x: String): String = p match {
      case 0 => "1e0"
      case 1 => x
      case 2 => basisSql(x, "k1")
      case 3 => basisSql(x, "k2")
    }
    def fold(body: String): String =
      s"list_reduce(list_prepend(0e0, [$body for i in range(0, ls.cnt)]), (aa, bb) -> aa + bb)"
    val xi = "ls.xs[CAST(i AS INTEGER) + 1]"
    val yi = "ls.ys[CAST(i AS INTEGER) + 1]"
    val augEntries = (0 until 4).flatMap { p =>
      (0 until 4).map(q => fold(s"(${zp(p, xi)}) * (${zp(q, xi)})")) :+
        fold(s"(${zp(p, xi)}) * ($yi)")
    }.mkString(",\n    ")
    def elim(c: Int): String = {
      val prev = if (c == 0) "e0.a" else s"el${c - 1}.e"
      val prevT = if (c == 0) "e0" else s"el${c - 1}"
      val diag = c * aw + c + 1
      s"""pv$c AS (SELECT ii.i AS piv
         |  FROM $prevT, (SELECT unnest(range(0, 4)) AS i) ii
         |  WHERE ii.i >= $c
         |  ORDER BY abs($prev[CAST(ii.i AS INTEGER) * $aw + ${c + 1}]) DESC, ii.i
         |  LIMIT 1),
         |sw$c AS (SELECT [CASE
         |    WHEN i // $aw = $c THEN $prev[CAST(pv$c.piv AS INTEGER) * $aw + (i % $aw) + 1]
         |    WHEN i // $aw = pv$c.piv THEN $prev[$c * $aw + (i % $aw) + 1]
         |    ELSE $prev[i + 1] END for i in range(0, 20)] AS s
         |  FROM $prevT, pv$c),
         |el$c AS (SELECT CASE WHEN abs(sw$c.s[$diag]) > 1e-300 THEN
         |    [CASE WHEN i // $aw > $c AND i % $aw >= $c THEN
         |       sw$c.s[i + 1] - (sw$c.s[(i // $aw) * $aw + ${c + 1}] / sw$c.s[$diag]) * sw$c.s[$c * $aw + (i % $aw) + 1]
         |     ELSE sw$c.s[i + 1] END for i in range(0, 20)]
         |    ELSE sw$c.s END AS e FROM sw$c)""".stripMargin
    }
    val e = "el3.e"
    def back(row: Int): String = {
      val b0 = s"$e[${row * aw + 4 + 1}]"
      val s = (row + 1 until 4).foldLeft(b0)((acc, c) =>
        s"($acc - $e[${row * aw + c + 1}] * xb$c.x)")
      val diag = s"$e[${row * aw + row + 1}]"
      val from = "el3" + (row + 1 until 4).map(c => s", xb$c").mkString
      s"xb$row AS (SELECT CASE WHEN abs($diag) > 1e-300 THEN $s / $diag ELSE 0e0 END AS x FROM $from)"
    }
    s"""bnds AS (SELECT CAST(min(x) AS BIGINT) AS xmin, CAST(max(x) AS BIGINT) AS xmax,
       |    CAST(count(*) AS INTEGER) AS cnt FROM grid),
       |kk AS (SELECT xmin, xmax, cnt,
       |    xmin + (xmax - xmin) * 5 // 100 AS k1,
       |    xmin + (xmax - xmin) * 35 // 100 AS k2,
       |    xmin + (xmax - xmin) * 65 // 100 AS k3,
       |    xmin + (xmax - xmin) * 95 // 100 AS k4
       |  FROM bnds),
       |ls AS (SELECT kk.*, g.xs, g.ys FROM kk,
       |  (SELECT list(CAST(x AS DOUBLE) ORDER BY x) AS xs,
       |          list(CAST(y AS DOUBLE) ORDER BY x) AS ys FROM grid) g),
       |e0 AS (SELECT ls.*, [$augEntries] AS a FROM ls),
       |${(0 until 4).map(elim).mkString(",\n")},
       |${(3 to 0 by -1).map(back).mkString(",\n")},
       |cf AS (SELECT [xb0.x, xb1.x, xb2.x, xb3.x] AS c
       |  FROM xb0, xb1, xb2, xb3)""".stripMargin
  }
}
