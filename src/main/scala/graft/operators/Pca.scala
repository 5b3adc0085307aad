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
    * from one pass. `vec` must be an array<long> of 1e-6-quantized
    * components with constant dimension d.
    */
  def scatter(df: DataFrame, vec: Column, d: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    // |x| ≤ ~1e6 micro ⇒ per-cell products ≤ 1e12, so a partition of
    // ≤ 9e6 rows stays within long range; the bound is ENFORCED, not
    // assumed — a bigger partition must be repartitioned by the
    // caller, never silently wrapped into a corrupt covariance
    val MaxPartRows = 9000000L
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
