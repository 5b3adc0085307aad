package graft

import org.apache.spark.sql.functions._
import graft.operators.SixCircle
import graft.operators.SixCircle.Angles

class SixCircleSpec extends SparkSpec {
  import spark.implicits._

  // cubic a = 4 Å with a nontrivial orientation U = Rz(.3)·Ry(.2)·Rx(.1):
  // UB = U/a, so hkl = a·Uᵀ·q
  private val a0 = 4.0
  private val U: Array[Array[Double]] = {
    import math._
    def rz(t: Double) = Array(Array(cos(t), -sin(t), 0.0), Array(sin(t), cos(t), 0.0), Array(0.0, 0.0, 1.0))
    def ry(t: Double) = Array(Array(cos(t), 0.0, sin(t)), Array(0.0, 1.0, 0.0), Array(-sin(t), 0.0, cos(t)))
    def rx(t: Double) = Array(Array(1.0, 0.0, 0.0), Array(0.0, cos(t), -sin(t)), Array(0.0, sin(t), cos(t)))
    def mul(p: Array[Array[Double]], q: Array[Array[Double]]) =
      Array.tabulate(3, 3)((i, j) => p(i)(0) * q(0)(j) + p(i)(1) * q(1)(j) + p(i)(2) * q(2)(j))
    mul(mul(rz(0.3), ry(0.2)), rx(0.1))
  }
  private val ubFlat: Array[Double] =
    Array.tabulate(9)(i => U(i / 3)(i % 3) / a0)
  private val lam = 1.54

  private def hklOf(q: (Double, Double, Double)): (Double, Double, Double) = (
    a0 * (U(0)(0) * q._1 + U(1)(0) * q._2 + U(2)(0) * q._3),
    a0 * (U(0)(1) * q._1 + U(1)(1) * q._2 + U(2)(1) * q._3),
    a0 * (U(0)(2) * q._1 + U(1)(2) * q._2 + U(2)(2) * q._3))

  test("mode solvers round-trip known reflections through the forward transform") {
    val hkls = for {
      h <- -2 to 2; k <- -2 to 2; l <- -2 to 2
      if (h, k, l) != ((0, 0, 0))
    } yield (h.toDouble, k.toDouble, l.toDouble)
    for (mode <- Seq("bisecting", "vertical"); (h, k, l) <- hkls) {
      val ang = SixCircle.anglesFor(mode, ubFlat, h, k, l, lam)
      assert(ang.isDefined, s"$mode should reach ($h,$k,$l)")
      val (h2, k2, l2) = hklOf(SixCircle.qPhiScalar(ang.get, lam))
      assert(math.abs(h2 - h) < 1e-9 && math.abs(k2 - k) < 1e-9 && math.abs(l2 - l) < 1e-9,
        s"$mode round-trip ($h,$k,$l) -> ($h2,$k2,$l2) via $ang")
    }
  }

  test("mode geometry: bisecting keeps mu=nu=0 with delta=2theta; Bragg |q|=2 sin(theta)/lambda") {
    val ang = SixCircle.anglesFor("bisecting", ubFlat, 1, 1, 0, lam).get
    assert(ang.mu == 0.0 && ang.nu == 0.0)
    assert(math.abs(ang.delta - 2 * ang.eta) < 1e-12)
    val q = SixCircle.qPhiScalar(ang, lam)
    val qn = math.sqrt(q._1 * q._1 + q._2 * q._2 + q._3 * q._3)
    // cubic a=4: |q(110)| = sqrt(2)/4
    assert(math.abs(qn - math.sqrt(2) / a0) < 1e-12)
    assert(math.abs(qn - 2 * math.sin(ang.eta) / lam) < 1e-12)
    val v = SixCircle.anglesFor("vertical", ubFlat, 1, 1, 0, lam).get
    assert(v.eta == 0.0 && v.delta == 0.0)
    assert(math.abs(v.nu - 2 * v.mu) < 1e-12)
  }

  test("unreachable and degenerate reflections return None") {
    assert(SixCircle.anglesFor("bisecting", ubFlat, 0, 0, 0, lam).isEmpty)
    // |q| = |(9,9,9)|/4 = 3.9; sin(theta) = 3.9*1.54/2 > 1
    assert(SixCircle.anglesFor("bisecting", ubFlat, 9, 9, 9, lam).isEmpty)
    intercept[IllegalArgumentException] {
      SixCircle.anglesFor("psi_fixed", ubFlat, 1, 0, 0, lam)
    }
  }

  test("round-trip holds for a triclinic lattice UB (full B matrix)") {
    // triclinic cell through the Busing-Levy B, oriented by the same
    // U — exercises the solver off the cubic special case
    import graft.operators.UBMatrix
    val b = UBMatrix.bMatrix(UBMatrix.Lattice(5.2, 6.3, 7.1, 83.0, 97.0, 112.0))
    val ub = Array.tabulate(9) { i =>
      val (r, c) = (i / 3, i % 3)
      U(r)(0) * b(0)(c) + U(r)(1) * b(1)(c) + U(r)(2) * b(2)(c)
    }
    // invert UB (3x3) for the hkl recovery
    val m = Array.tabulate(3, 3)((i, j) => ub(3 * i + j))
    val det = m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
      m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
      m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    def inv(i: Int, j: Int): Double = {
      val (a1, a2) = ((j + 1) % 3, (j + 2) % 3)
      val (b1, b2) = ((i + 1) % 3, (i + 2) % 3)
      (m(a1)(b1) * m(a2)(b2) - m(a1)(b2) * m(a2)(b1)) / det
    }
    for (mode <- Seq("bisecting", "vertical"); (h, k, l) <- Seq((1.0, 0.0, 0.0), (0.0, 2.0, 0.0), (1.0, -1.0, 2.0), (-2.0, 1.0, 1.0))) {
      val ang = SixCircle.anglesFor(mode, ub, h, k, l, lam)
      assert(ang.isDefined, s"$mode unreachable ($h,$k,$l)")
      val q = SixCircle.qPhiScalar(ang.get, lam)
      val qv = Array(q._1, q._2, q._3)
      val got = Array.tabulate(3)(i => inv(i, 0) * qv(0) + inv(i, 1) * qv(1) + inv(i, 2) * qv(2))
      assert(math.abs(got(0) - h) < 1e-9 && math.abs(got(1) - k) < 1e-9 && math.abs(got(2) - l) < 1e-9,
        s"$mode triclinic round-trip ($h,$k,$l) -> ${got.mkString(",")}")
    }
  }

  test("psi-fixed azimuth mode: every psi reaches the same reflection") {
    val (h, k, l) = (1.0, -1.0, 2.0)
    val psis = Seq(-2.5, -1.0, 0.0, 0.7, 1.9, 3.0)
    val angles = psis.map(p => SixCircle.anglesForPsi(ubFlat, h, k, l, lam, p).get)
    for ((ang, psi) <- angles.zip(psis)) {
      val (h2, k2, l2) = hklOf(SixCircle.qPhiScalar(ang, lam))
      assert(math.abs(h2 - h) < 1e-9 && math.abs(k2 - k) < 1e-9 && math.abs(l2 - l) < 1e-9,
        s"psi=$psi lost the reflection: ($h2,$k2,$l2)")
      // detector never moves during an azimuthal scan
      assert(ang.delta == angles.head.delta && ang.nu == 0.0 && ang.mu == 0.0)
    }
    // and the scan genuinely MOVES the sample circles
    val distinctChi = angles.map(a => math.round(a.chi * 1e6)).distinct
    assert(distinctChi.size >= 5, s"azimuth sweep barely moved chi: $distinctChi")
  }

  test("Column qPhi matches the scalar reference on arbitrary angles") {
    val rows = Seq(
      (0.1, 0.4, -0.7, 2.1, 0.9, -0.2),
      (0.0, 0.3, 0.0, 0.0, 0.6, 0.0),
      (-0.5, 1.1, 0.8, -2.9, 1.7, 0.4))
    val df = rows.toDF("mu", "eta", "chi", "phi", "delta", "nu")
    val q = SixCircle.qPhi($"mu", $"eta", $"chi", $"phi", $"delta", $"nu", lit(lam))
    val got = df.select(q(0).as("qx"), q(1).as("qy"), q(2).as("qz")).collect()
    rows.zip(got).foreach { case ((mu, eta, chi, phi, d, nu), r) =>
      val exp = SixCircle.qPhiScalar(Angles(mu, eta, chi, phi, d, nu), lam)
      assert(math.abs(r.getDouble(0) - exp._1) < 1e-15)
      assert(math.abs(r.getDouble(1) - exp._2) < 1e-15)
      assert(math.abs(r.getDouble(2) - exp._3) < 1e-15)
    }
  }
}
