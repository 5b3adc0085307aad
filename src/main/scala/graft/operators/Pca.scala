package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the whitening /
  * dimensionality step of the embedding pipeline (SemDeDup clusters
  * on whitened vectors; IVF trains better on decorrelated data).
  *
  * Scale shape: ONE pass builds the d×d scatter matrix — each
  * partition folds its rows into a single local accumulator
  * (count, Σx, flattened Σx·xᵀ) via `mapPartitions` (the documented
  * last-resort case: the declarative alternative is a ×d² per-row
  * explode), so the shuffle carries partitions×(d²+d+1) values, never
  * the data. Accumulators are EXACT: inputs are 1e-6-quantized
  * integer components ([[VectorOps.quantize]]), products are exact
  * longs, sums exact decimals. The d×d eigenproblem then solves in
  * the DRIVER (model-sized, like the IVF centroids): deterministic
  * cyclic Jacobi with a fixed sweep count and sign-canonicalized
  * eigenvectors (largest-|component| positive).
  */
object Pca {

  /** (count, mean vector in micro units, covariance in micro² units)
    * from one pass. `vec` must be an array<long> of quantized
    * components with constant dimension d and per-component magnitude
    * ≤ `maxAbs` (default: raw 1e-6-quantized unit vectors; a
    * factor-f [[VectorOps.rebinQ]] caller must pass f·1e6).
    */
  def scatter(df: DataFrame, vec: Column, d: Int,
              maxAbs: Long = 1000000L): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    // Per-cell products ≤ maxAbs² ⇒ a partition of ≤ Long.Max/maxAbs²
    // rows stays within long range. BOTH bounds are ENFORCED, not
    // assumed — an out-of-range component or an over-long partition
    // fails loudly instead of silently wrapping into a corrupt
    // covariance (the 100 TB failure mode: repartition the input /
    // fix the caller's maxAbs, never trust the data).
    require(maxAbs > 0, "maxAbs must be positive")
    val MaxPartRows = Long.MaxValue / (maxAbs * maxAbs)
    val parts = df.select(vec.as("v")).as[Seq[Long]].mapPartitions { it =>
      var n = 0L
      val s = new Array[Long](d)
      val o = new Array[Long](d * d)
      it.foreach { v =>
        require(v.length == d, s"dimension mismatch: ${v.length} != $d")
        n += 1
        require(n <= MaxPartRows,
          s"Pca.scatter: partition exceeds $MaxPartRows rows — repartition the input " +
            "(long accumulators would overflow)")
        var i = 0
        while (i < d) {
          val xi = v(i)
          require(xi <= maxAbs && xi >= -maxAbs,
            s"Pca.scatter: |component| $xi exceeds declared maxAbs=$maxAbs — " +
              "pass the caller's true magnitude bound")
          s(i) += xi
          var j = 0
          while (j < d) { o(i * d + j) += xi * v(j); j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else Iterator.single((n, s.toSeq, o.toSeq))
    }
    val rows = parts.collect() // one row per non-empty partition — model-sized
    val n = rows.map(_._1).sum
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    val s = Array.fill(d)(BigInt(0))
    val o = Array.fill(d * d)(BigInt(0))
    rows.foreach { case (_, ps, po) =>
      var i = 0
      while (i < d) { s(i) += ps(i); i += 1 }
      var k = 0
      while (k < d * d) { o(k) += po(k); k += 1 }
    }
    val mean = s.map(_.toDouble / n)
    // cov_ij = (n·Σxy − Σx·Σy) / (n·(n−1)) — numerator exact BigInt
    val cov = Array.tabulate(d, d) { (i, j) =>
      (BigInt(n) * o(i * d + j) - s(i) * s(j)).toDouble / (n.toDouble * (n - 1))
    }
    (n, mean, cov)
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix: fixed sweep order (upper triangle row-major), fixed
    * sweep count, no data-dependent pivoting — identical results on
    * every run/JVM. Returns (eigenvalues, eigenvectors as rows)
    * sorted by eigenvalue descending, each vector sign-canonicalized
    * so its largest-|component| is positive.
    */
  def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to sweeps; p <- 0 until d - 1; q <- p + 1 until d) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t = math.signum(theta) match {
          case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        var k = 0
        while (k < d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
          k += 1
        }
        k = 0
        while (k < d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
          val vpk = v(p)(k); val vqk = v(q)(k)
          v(p)(k) = c * vpk - s * vqk
          v(q)(k) = s * vpk + c * vqk
          k += 1
        }
      }
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val row = v(i)
      val m = row.indices.maxBy(k => (math.abs(row(k)), -k))
      if (row(m) < 0) row.map(x => -x) else row.clone()
    }.toArray
    (evals, evecs)
  }

  /** DuckDB oracle prefix replaying [[scatter]] + [[jacobiEigen]]
    * bit-identically over a `qv(vec_id, label, q)` CTE the caller
    * must prepend (q = array<long>, constant dimension `d`): the
    * exact HUGEINT scatter, the mean/cov double conversions in the
    * Scala operation order, and the full cyclic-Jacobi sweep tape as
    * a recursive CTE — one rotation per step, the two sequential
    * update phases composed into nested per-cell formulas with
    * IDENTICAL op order (every +,−,×,÷,sqrt is IEEE
    * correctly-rounded on both engines, the q_holt precedent), the
    * |apq| ≤ 1e-300 skip mirrored as a no-op carry. Defines CTEs:
    * nn (n), mn (mean list), fin (final a, v flat row-major lists),
    * ord (rank → original index, eigenvalue desc, ties by index),
    * evl (sorted eigenvalue list). Cost is data-size-independent
    * (12·d(d−1)/2 steps over d² lists) — tractable for the d = 16
    * rebinned gate inputs, which is why the SQL-gated queries rebin
    * 64 → 16 (the full 64-dim solve stays spec-pinned).
    */
  def jacobiReplaySql(d: Int, sweeps: Int = 12): String = {
    val nd = d * d
    val rps = d * (d - 1) / 2
    s"""nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM qv),
       |og AS MATERIALIZED (
       |  SELECT idx.i AS i,
       |    CAST(sum(CAST(q[(idx.i // $d) + 1] AS HUGEINT) * q[(idx.i % $d) + 1]) AS HUGEINT) AS o
       |  FROM qv, (SELECT unnest(range(0, $nd)) AS i) idx GROUP BY 1),
       |sg AS MATERIALIZED (
       |  SELECT idx.i AS i, CAST(sum(CAST(q[idx.i + 1] AS HUGEINT)) AS HUGEINT) AS s
       |  FROM qv, (SELECT unnest(range(0, $d)) AS i) idx GROUP BY 1),
       |ol AS MATERIALIZED (SELECT list(o ORDER BY i) AS ol FROM og),
       |sl AS MATERIALIZED (SELECT list(s ORDER BY i) AS sl FROM sg),
       |mn AS MATERIALIZED (
       |  SELECT [CAST(sl.sl[i + 1] AS DOUBLE) / nn.n for i in range(0, $d)] AS m FROM sl, nn),
       |cov AS MATERIALIZED (
       |  SELECT [CAST(nn.n * ol.ol[i + 1] - sl.sl[(i // $d) + 1] * sl.sl[(i % $d) + 1] AS DOUBLE)
       |      / (CAST(nn.n AS DOUBLE) * (nn.n - 1)) for i in range(0, $nd)] AS a
       |  FROM nn, ol, sl),
       |rot AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY p, q) - 1 AS sm, p, q
       |  FROM (SELECT a.i AS p, b.i AS q
       |    FROM (SELECT unnest(range(0, $d)) AS i) a, (SELECT unnest(range(0, $d)) AS i) b
       |    WHERE a.i < b.i) z),
       |jac AS (
       |  SELECT 0 AS step, cov.a AS a,
       |    [CASE WHEN i // $d = i % $d THEN CAST(1.0 AS DOUBLE)
       |      ELSE CAST(0.0 AS DOUBLE) END for i in range(0, $nd)] AS v
       |  FROM cov
       |  UNION ALL
       |  SELECT st.step + 1,
       |    CASE WHEN sc.skip THEN st.a ELSE
       |      [CASE
       |        WHEN i // $d = r.p AND i % $d = r.p
       |          THEN sc.c * (sc.c * sc.app - sc.s * sc.apq) - sc.s * (sc.c * sc.aqp - sc.s * sc.aqq)
       |        WHEN i // $d = r.p AND i % $d = r.q
       |          THEN sc.c * (sc.s * sc.app + sc.c * sc.apq) - sc.s * (sc.s * sc.aqp + sc.c * sc.aqq)
       |        WHEN i // $d = r.q AND i % $d = r.p
       |          THEN sc.s * (sc.c * sc.app - sc.s * sc.apq) + sc.c * (sc.c * sc.aqp - sc.s * sc.aqq)
       |        WHEN i // $d = r.q AND i % $d = r.q
       |          THEN sc.s * (sc.s * sc.app + sc.c * sc.apq) + sc.c * (sc.s * sc.aqp + sc.c * sc.aqq)
       |        WHEN i // $d = r.p THEN sc.c * st.a[i + 1] - sc.s * st.a[r.q * $d + (i % $d) + 1]
       |        WHEN i // $d = r.q THEN sc.s * st.a[r.p * $d + (i % $d) + 1] + sc.c * st.a[i + 1]
       |        WHEN i % $d = r.p THEN sc.c * st.a[i + 1] - sc.s * st.a[(i // $d) * $d + r.q + 1]
       |        WHEN i % $d = r.q THEN sc.s * st.a[(i // $d) * $d + r.p + 1] + sc.c * st.a[i + 1]
       |        ELSE st.a[i + 1] END for i in range(0, $nd)] END,
       |    CASE WHEN sc.skip THEN st.v ELSE
       |      [CASE
       |        WHEN i // $d = r.p THEN sc.c * st.v[i + 1] - sc.s * st.v[r.q * $d + (i % $d) + 1]
       |        WHEN i // $d = r.q THEN sc.s * st.v[r.p * $d + (i % $d) + 1] + sc.c * st.v[i + 1]
       |        ELSE st.v[i + 1] END for i in range(0, $nd)] END
       |  FROM jac st
       |  JOIN rot r ON r.sm = st.step % $rps,
       |  LATERAL (
       |    SELECT app, apq, aqp, aqq, skip, c, t * c AS s FROM (
       |      SELECT app, apq, aqp, aqq, skip, t, 1.0 / sqrt(t * t + 1.0) AS c FROM (
       |        SELECT app, apq, aqp, aqq, skip,
       |          CASE WHEN theta > 0 THEN 1.0 / (theta + sqrt(theta * theta + 1.0))
       |               WHEN theta < 0 THEN -1.0 / (-theta + sqrt(theta * theta + 1.0))
       |               ELSE 1.0 / (theta + sqrt(theta * theta + 1.0)) END AS t
       |        FROM (
       |          SELECT app, apq, aqp, aqq, skip,
       |            CASE WHEN skip THEN 0.0 ELSE (aqq - app) / (2.0 * apq) END AS theta
       |          FROM (SELECT
       |              st.a[r.p * $d + r.p + 1] AS app,
       |              st.a[r.p * $d + r.q + 1] AS apq,
       |              st.a[r.q * $d + r.p + 1] AS aqp,
       |              st.a[r.q * $d + r.q + 1] AS aqq,
       |              NOT (abs(st.a[r.p * $d + r.q + 1]) > 1e-300) AS skip) z0
       |        ) z1) z2) z3) sc
       |  WHERE st.step < ${sweeps * rps}),
       |fin AS MATERIALIZED (SELECT a, v FROM jac ORDER BY step DESC LIMIT 1),
       |ord AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY ev DESC, i) AS rk, i, ev
       |  FROM (SELECT i.i AS i, fin.a[i.i * $d + i.i + 1] AS ev
       |    FROM fin, (SELECT unnest(range(0, $d)) AS i) i) z),
       |evl AS MATERIALIZED (SELECT list(ev ORDER BY rk) AS evl FROM ord)""".stripMargin
  }

  /** Projection of the quantized vector column onto the top-k
    * eigenvectors, with the component matrix inlined as literals
    * (the JL-gate pattern: the model ships in the plan, zero join,
    * zero shuffle, one codegen span). Output: array<double> of k
    * mean-centered scores.
    */
  def projectExpr(vec: Column, mean: Array[Double], components: Array[Array[Double]]): Column = {
    val cols = components.map { comp =>
      val terms = comp.indices.map { i =>
        (vec.getItem(i) - lit(mean(i))) * lit(comp(i))
      }
      terms.reduce(_ + _)
    }
    array(cols: _*)
  }
}
