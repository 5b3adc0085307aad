package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** UB-matrix computation from two oriented reflections — the
  * Busing & Levy (1967) construction every diffractometer control
  * system uses (pyspec's diffractometer support derives UB from a
  * lattice plus two reflections, then maps angles→HKL; this repo's
  * `q_hkl_transform` APPLIES a given UB — this operator computes one).
  *
  * Method (all closed-form, per group):
  *  1. `B` from the lattice parameters (reciprocal-cell metric,
  *     B&L eq. 3, 2π-free convention).
  *  2. For reflections r1, r2 with indices h and measured φ-frame
  *     scattering vectors q: build orthonormal triads T_c (from
  *     B·h1, B·h2) and T_φ (from q1, q2).
  *  3. `U = T_φ · T_cᵀ` (a proper rotation when the inputs are
  *     consistent), `UB = U · B`.
  *
  * Execution: `groupByKey(...).mapGroups` like the fit family — one
  * closed-form solve per group, no iteration, no driver data.
  */
object UBMatrix {

  final case class Lattice(a: Double, b: Double, c: Double,
                           alphaDeg: Double, betaDeg: Double, gammaDeg: Double)

  final case class Reflection(g: Long, h: Double, k: Double, l: Double,
                              qx: Double, qy: Double, qz: Double)

  /** Flattened row-major UB (`valid = false` on degenerate input —
    * fewer than two reflections, collinear vectors). */
  final case class UBRow(g: Long, valid: Boolean,
                         ub_11: Double, ub_12: Double, ub_13: Double,
                         ub_21: Double, ub_22: Double, ub_23: Double,
                         ub_31: Double, ub_32: Double, ub_33: Double)

  /** B&L B matrix: columns are the reciprocal basis vectors in the
    * crystal cartesian frame (x ∥ a*, z ∥ c). */
  def bMatrix(lat: Lattice): Array[Array[Double]] = {
    import math._
    val al = toRadians(lat.alphaDeg)
    val be = toRadians(lat.betaDeg)
    val ga = toRadians(lat.gammaDeg)
    val v = lat.a * lat.b * lat.c * sqrt(
      1 - cos(al) * cos(al) - cos(be) * cos(be) - cos(ga) * cos(ga) +
        2 * cos(al) * cos(be) * cos(ga))
    val as = lat.b * lat.c * sin(al) / v
    val bs = lat.a * lat.c * sin(be) / v
    val cs = lat.a * lat.b * sin(ga) / v
    val cosBes = (cos(al) * cos(ga) - cos(be)) / (sin(al) * sin(ga))
    val cosGas = (cos(al) * cos(be) - cos(ga)) / (sin(al) * sin(be))
    val sinBes = sqrt(math.max(0.0, 1 - cosBes * cosBes))
    val sinGas = sqrt(math.max(0.0, 1 - cosGas * cosGas))
    Array(
      Array(as, bs * cosGas, cs * cosBes),
      Array(0.0, bs * sinGas, -cs * sinBes * cos(al)),
      Array(0.0, 0.0, 1.0 / lat.c))
  }

  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
    Array(
      m(0)(0) * v(0) + m(0)(1) * v(1) + m(0)(2) * v(2),
      m(1)(0) * v(0) + m(1)(1) * v(1) + m(1)(2) * v(2),
      m(2)(0) * v(0) + m(2)(1) * v(1) + m(2)(2) * v(2))

  private def cross(a: Array[Double], b: Array[Double]): Array[Double] =
    Array(a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2), a(0) * b(1) - a(1) * b(0))

  private def norm(a: Array[Double]): Double =
    math.sqrt(a(0) * a(0) + a(1) * a(1) + a(2) * a(2))

  private def unit(a: Array[Double]): Array[Double] = {
    val n = norm(a)
    if (n < 1e-12) null else Array(a(0) / n, a(1) / n, a(2) / n)
  }

  /** Orthonormal triad [e1 e2 e3] (as COLUMNS) from two non-collinear
    * vectors: e1 ∥ t1, e3 ∥ t1×t2, e2 = e3×e1. Null when degenerate. */
  private def triad(t1: Array[Double], t2: Array[Double]): Array[Array[Double]] = {
    val e1 = unit(t1)
    if (e1 == null) return null
    val e3 = unit(cross(t1, t2))
    if (e3 == null) return null
    val e2 = cross(e3, e1)
    Array(
      Array(e1(0), e2(0), e3(0)),
      Array(e1(1), e2(1), e3(1)),
      Array(e1(2), e2(2), e3(2)))
  }

  private def matMulT(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
    // a · bᵀ
    Array.tabulate(3, 3)((i, j) =>
      a(i)(0) * b(j)(0) + a(i)(1) * b(j)(1) + a(i)(2) * b(j)(2))

  private def matMul(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(3, 3)((i, j) =>
      a(i)(0) * b(0)(j) + a(i)(1) * b(1)(j) + a(i)(2) * b(2)(j))

  /** UB from two oriented reflections; null on degenerate input. */
  def ubFromTwo(b: Array[Array[Double]],
                h1: Array[Double], q1: Array[Double],
                h2: Array[Double], q2: Array[Double]): Array[Array[Double]] = {
    val tc = triad(matVec(b, h1), matVec(b, h2))
    val tp = triad(q1, q2)
    if (tc == null || tp == null) null
    else matMul(matMulT(tp, tc), b) // U = T_φ·T_cᵀ; UB = U·B
  }

  /** Per-group UB over a reflection table with (group, h, k, l,
    * qx, qy, qz) columns. The two defining reflections are the first
    * two rows in (h, k, l, qx, qy, qz) order — deterministic under
    * any partitioning; extra reflections are ignored (a later
    * refinement step would least-squares them).
    */
  def ubGroups(refl: DataFrame, lattice: Lattice, group: String,
               h: String, k: String, l: String,
               qx: String, qy: String, qz: String): DataFrame = {
    val spark = refl.sparkSession
    import spark.implicits._
    val b = bMatrix(lattice)
    val ds = refl.select(
      col(group).cast("long").as("g"),
      col(h).cast("double").as("h"), col(k).cast("double").as("k"),
      col(l).cast("double").as("l"),
      col(qx).cast("double").as("qx"), col(qy).cast("double").as("qy"),
      col(qz).cast("double").as("qz")).as[Reflection]
    ds.groupByKey(_.g)
      .mapGroups { (g, it) =>
        val rs = it.toArray.sortBy(r => (r.h, r.k, r.l, r.qx, r.qy, r.qz))
        val ub =
          if (rs.length < 2) null
          else ubFromTwo(b,
            Array(rs(0).h, rs(0).k, rs(0).l), Array(rs(0).qx, rs(0).qy, rs(0).qz),
            Array(rs(1).h, rs(1).k, rs(1).l), Array(rs(1).qx, rs(1).qy, rs(1).qz))
        if (ub == null)
          UBRow(g, valid = false, Double.NaN, Double.NaN, Double.NaN,
            Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
        else
          UBRow(g, valid = true,
            ub(0)(0), ub(0)(1), ub(0)(2),
            ub(1)(0), ub(1)(1), ub(1)(2),
            ub(2)(0), ub(2)(1), ub(2)(2))
      }
      .toDF()
  }
}
