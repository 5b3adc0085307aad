package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Six-circle diffractometer angle modes — the angles→q solver behind
  * pyspec's diffractometer support (the full generalization of the
  * fixed UB·v transform in `q_hkl_transform`): given the four sample
  * circles (μ, η, χ, φ) and two detector circles (δ, ν), recover the
  * crystal-frame scattering vector, and inversely position the
  * circles for a target reflection in a named mode. The construction
  * is the standard Busing & Levy (1967) rotation stack extended with
  * the out-of-plane circles of You's 4S+2D geometry (J. Appl. Cryst.
  * 32, 614, 1999) — both public.
  *
  * Conventions (documented here, used consistently everywhere):
  *  - lab frame: x̂ outboard, ŷ along the incident beam, ẑ up;
  *  - k = 1/λ (2π-free, matching [[UBMatrix]]'s B convention, so
  *    q = UB·hkl and |q| = 1/d);
  *  - detector: k̂_f = Rz(δ)·Rx(ν)·ŷ — δ rotates the arm in the
  *    horizontal plane, ν lifts it vertically;
  *  - sample stack (crystal→lab): Z = Rx(μ)·Rz(η)·Ry(χ)·Rz(φ), all
  *    right-handed;
  *  - q_lab = k_f − k_i;  q_φ = Zᵀ·q_lab;  hkl = (UB)⁻¹·q_φ.
  *
  * `qPhi` is pure `sql.functions` trigonometry — whole-stage codegen,
  * no UDF, and a line-for-line SQL mirror for the oracle. The mode
  * solvers are closed-form (no iteration).
  */
object SixCircle {

  /** Crystal-frame (φ-axis) scattering vector components from the six
    * circle angles (radians) and wavelength (Å): Seq(qx, qy, qz).
    * Chain: q_lab, then Rx(−μ), Rz(−η), Ry(−χ), Rz(−φ).
    */
  def qPhi(mu: Column, eta: Column, chi: Column, phi: Column,
           delta: Column, nu: Column, lam: Column): Seq[Column] = {
    val x0 = -sin(delta) * cos(nu) / lam
    val y0 = (cos(delta) * cos(nu) - 1) / lam
    val z0 = sin(nu) / lam
    // Rx(−μ)
    val y1 = cos(mu) * y0 + sin(mu) * z0
    val z1 = -sin(mu) * y0 + cos(mu) * z0
    // Rz(−η)
    val x2 = x0 * cos(eta) + y1 * sin(eta)
    val y2 = -x0 * sin(eta) + y1 * cos(eta)
    // Ry(−χ)
    val x3 = x2 * cos(chi) - z1 * sin(chi)
    val z3 = x2 * sin(chi) + z1 * cos(chi)
    // Rz(−φ)
    Seq(x3 * cos(phi) + y2 * sin(phi),
      -x3 * sin(phi) + y2 * cos(phi),
      z3)
  }

  /** DuckDB SQL mirror of [[qPhi]] — the same expression tree so the
    * doubles agree to the ulp. Returns (qx, qy, qz) expressions over
    * the given angle/λ SQL fragments.
    */
  def qPhiSql(mu: String, eta: String, chi: String, phi: String,
              delta: String, nu: String, lam: String): (String, String, String) = {
    val x0 = s"(-sin($delta) * cos($nu) / $lam)"
    val y0 = s"((cos($delta) * cos($nu) - 1) / $lam)"
    val z0 = s"(sin($nu) / $lam)"
    val y1 = s"(cos($mu) * $y0 + sin($mu) * $z0)"
    val z1 = s"(-sin($mu) * $y0 + cos($mu) * $z0)"
    val x2 = s"($x0 * cos($eta) + $y1 * sin($eta))"
    val y2 = s"(-$x0 * sin($eta) + $y1 * cos($eta))"
    val x3 = s"($x2 * cos($chi) - $z1 * sin($chi))"
    val z3 = s"($x2 * sin($chi) + $z1 * cos($chi))"
    (s"($x3 * cos($phi) + $y2 * sin($phi))",
      s"(-$x3 * sin($phi) + $y2 * cos($phi))",
      z3)
  }

  /** One circle setting: angles in radians. */
  final case class Angles(mu: Double, eta: Double, chi: Double, phi: Double,
                          delta: Double, nu: Double)

  /** Closed-form mode solver: circle angles that put reflection
    * `hkl` (through orientation `ub`, row-major 3×3) into diffraction
    * at wavelength `lam`.
    *
    *  - `"bisecting"`: horizontal scattering (μ = ν = 0), δ = 2θ,
    *    η = θ — the classic four-circle bisecting geometry; χ, φ
    *    rotate q into the −x̂ half of the scattering plane.
    *  - `"vertical"`: vertical scattering (η = δ = 0), ν = 2θ, μ = θ;
    *    χ, φ rotate q to +ẑ.
    *
    * None when the reflection is unreachable (|q|·λ/2 > 1) or q = 0.
    */
  def anglesFor(mode: String, ub: Array[Double], h: Double, k: Double, l: Double,
                lam: Double): Option[Angles] = {
    val qx = ub(0) * h + ub(1) * k + ub(2) * l
    val qy = ub(3) * h + ub(4) * k + ub(5) * l
    val qz = ub(6) * h + ub(7) * k + ub(8) * l
    val q = math.sqrt(qx * qx + qy * qy + qz * qz)
    val sinTheta = q * lam / 2
    if (q < 1e-12 || sinTheta > 1) return None
    val theta = math.asin(sinTheta)
    val (ux, uy, uz) = (qx / q, qy / q, qz / q)
    val r = math.sqrt(ux * ux + uy * uy)
    val phi = math.atan2(-uy, ux) // Rz(φ)·q̂ lands in the x–z plane, x ≥ 0
    mode match {
      case "bisecting" =>
        // need Rz(η)·Ry(χ)·Rz(φ)·q̂ = (−cos θ, −sin θ, 0) with η = θ:
        // after Rz(φ) the vector is (r, 0, uz); Ry(χ) must send it to
        // (−1, 0, 0) ⇒ cos χ = −r, sin χ = −uz
        Some(Angles(0.0, theta, math.atan2(-uz, -r), phi, 2 * theta, 0.0))
      case "vertical" =>
        // q̂_lab = (0, −sin θ, cos θ); with μ = θ the un-rotated target
        // is +ẑ; Ry(χ) must send (r, 0, uz) to ẑ ⇒ cos χ = uz, sin χ = −r
        Some(Angles(theta, 0.0, math.atan2(-r, uz), phi, 0.0, 2 * theta))
      case m => throw new IllegalArgumentException(s"unknown angle mode '$m'")
    }
  }

  /** Azimuth-fixed mode: the 1-DOF freedom left after fixing q — the
    * rotation by ψ about the scattering vector itself — made explicit
    * (the azimuthal scan every six-circle control system offers: sweep
    * ψ at a fixed reflection to probe the azimuthal dependence).
    *
    * Construction: take the bisecting particular solution Z₀ (so
    * ψ = 0 IS bisecting), compose with the right-rotation
    * `R(q̂_c, ψ)` about the crystal-frame scattering direction —
    * `Z = Z₀·R` still maps q̂_c to the same q̂_lab for every ψ — and
    * re-decompose Z into the sample stack's Rz(η)·Ry(χ)·Rz(φ) ZYZ
    * Euler angles (always possible; μ stays 0, detector unchanged).
    */
  def anglesForPsi(ub: Array[Double], h: Double, k: Double, l: Double,
                   lam: Double, psi: Double): Option[Angles] =
    anglesFor("bisecting", ub, h, k, l, lam).map { a0 =>
      import math._
      // crystal-frame unit q
      val qx = ub(0) * h + ub(1) * k + ub(2) * l
      val qy = ub(3) * h + ub(4) * k + ub(5) * l
      val qz = ub(6) * h + ub(7) * k + ub(8) * l
      val qn = sqrt(qx * qx + qy * qy + qz * qz)
      val u = Array(qx / qn, qy / qn, qz / qn)
      def rz(t: Double) = Array(
        Array(cos(t), -sin(t), 0.0), Array(sin(t), cos(t), 0.0), Array(0.0, 0.0, 1.0))
      def ry(t: Double) = Array(
        Array(cos(t), 0.0, sin(t)), Array(0.0, 1.0, 0.0), Array(-sin(t), 0.0, cos(t)))
      def mul(p: Array[Array[Double]], q: Array[Array[Double]]) =
        Array.tabulate(3, 3)((i, j) => p(i)(0) * q(0)(j) + p(i)(1) * q(1)(j) + p(i)(2) * q(2)(j))
      // Rodrigues rotation about û by ψ
      val (c, s) = (cos(psi), sin(psi))
      val rpsi = Array.tabulate(3, 3) { (i, j) =>
        val eps = (i, j) match {
          case (0, 1) => -u(2); case (1, 0) => u(2)
          case (0, 2) => u(1);  case (2, 0) => -u(1)
          case (1, 2) => -u(0); case (2, 1) => u(0)
          case _ => 0.0
        }
        c * (if (i == j) 1.0 else 0.0) + s * eps + (1 - c) * u(i) * u(j)
      }
      val z = mul(mul(rz(a0.eta), ry(a0.chi)), mul(rz(a0.phi), rpsi))
      // ZYZ re-decomposition: Z = Rz(η)·Ry(χ)·Rz(φ)
      // z(0)(2) = cosη·sinχ; z(1)(2) = sinη·sinχ; z(2)(2) = cosχ;
      // z(2)(0) = -sinχ·cosφ; z(2)(1) = sinχ·sinφ
      val chi = acos(max(-1.0, min(1.0, z(2)(2))))
      val (eta, phi) =
        if (abs(sin(chi)) < 1e-12) (atan2(z(1)(0), z(0)(0)), 0.0) // gimbal: fold into η
        else (atan2(z(1)(2), z(0)(2)), atan2(z(2)(1), -z(2)(0)))
      Angles(0.0, eta, chi, phi, a0.delta, 0.0)
    }

  /** Scala-side forward transform (same math as [[qPhi]]) for tests
    * and driver-side mode checks. */
  def qPhiScalar(a: Angles, lam: Double): (Double, Double, Double) = {
    import math._
    val x0 = -sin(a.delta) * cos(a.nu) / lam
    val y0 = (cos(a.delta) * cos(a.nu) - 1) / lam
    val z0 = sin(a.nu) / lam
    val y1 = cos(a.mu) * y0 + sin(a.mu) * z0
    val z1 = -sin(a.mu) * y0 + cos(a.mu) * z0
    val x2 = x0 * cos(a.eta) + y1 * sin(a.eta)
    val y2 = -x0 * sin(a.eta) + y1 * cos(a.eta)
    val x3 = x2 * cos(a.chi) - z1 * sin(a.chi)
    val z3 = x2 * sin(a.chi) + z1 * cos(a.chi)
    (x3 * cos(a.phi) + y2 * sin(a.phi), -x3 * sin(a.phi) + y2 * cos(a.phi), z3)
  }
}
