package graft

import graft.operators.UBMatrix
import graft.operators.UBMatrix.Lattice

class UBMatrixSpec extends SparkSpec {
  import spark.implicits._

  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
    Array.tabulate(3)(i => m(i)(0) * v(0) + m(i)(1) * v(1) + m(i)(2) * v(2))

  private def matMul(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(3, 3)((i, j) => a(i)(0) * b(0)(j) + a(i)(1) * b(1)(j) + a(i)(2) * b(2)(j))

  private def rot(axis: Int, deg: Double): Array[Array[Double]] = {
    val t = math.toRadians(deg)
    val (c, s) = (math.cos(t), math.sin(t))
    axis match {
      case 0 => Array(Array(1.0, 0, 0), Array(0, c, -s), Array(0, s, c))
      case 1 => Array(Array(c, 0, s), Array(0, 1.0, 0), Array(-s, 0, c))
      case _ => Array(Array(c, -s, 0), Array(s, c, 0), Array(0, 0, 1.0))
    }
  }

  test("B matrix of a cubic lattice is diag(1/a)") {
    val b = UBMatrix.bMatrix(Lattice(5.0, 5.0, 5.0, 90, 90, 90))
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(b(i)(j) - (if (i == j) 0.2 else 0.0)) < 1e-12, s"b($i)($j)")
  }

  test("UB from two reflections recovers a known orientation (triclinic)") {
    val lat = Lattice(5.43, 6.28, 7.11, 89.0, 92.0, 101.0)
    val b = UBMatrix.bMatrix(lat)
    val u0 = matMul(rot(2, 30), matMul(rot(1, 20), rot(0, 10)))
    val ub0 = matMul(u0, b)
    val h1 = Array(1.0, 0.0, 0.0)
    val h2 = Array(0.0, 1.0, 1.0)
    val ub = UBMatrix.ubFromTwo(b, h1, matVec(ub0, h1), h2, matVec(ub0, h2))
    assert(ub != null)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(ub(i)(j) - ub0(i)(j)) < 1e-10, s"ub($i)($j)")
    // the computed UB maps a THIRD reflection (not used in the
    // construction) to its true scattering vector — orientation is
    // fully determined, not just fitted to the two inputs
    val h3 = Array(1.0, 2.0, 3.0)
    val q3 = matVec(ub0, h3)
    val got = matVec(ub, h3)
    for (i <- 0 until 3) assert(math.abs(got(i) - q3(i)) < 1e-10)
  }

  test("ubGroups computes per-group UB distributed, invariant to partitioning") {
    val lat = Lattice(4.0, 4.0, 6.0, 90, 90, 120) // hexagonal
    val b = UBMatrix.bMatrix(lat)
    val rows = (1L to 40L).flatMap { g =>
      val u = rot(2, g.toDouble * 7)
      val ubg = matMul(u, b)
      Seq(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 1.0)).map { h =>
        val q = matVec(ubg, h)
        (g, h(0), h(1), h(2), q(0), q(1), q(2))
      }
    }
    val df = rows.toDF("g", "h", "k", "l", "qx", "qy", "qz")
    def run(parts: Int) = UBMatrix.ubGroups(df.repartition(parts), lat,
        "g", "h", "k", "l", "qx", "qy", "qz")
      .collect().map(r => r.getLong(0) -> r).toMap
    val out = run(3)
    assert(out.size == 40 && out.values.forall(_.getBoolean(1)))
    // recovered UB equals the constructing U·B
    (1L to 40L).foreach { g =>
      val ubg = matMul(rot(2, g.toDouble * 7), b)
      val r = out(g)
      val vals = (2 to 10).map(r.getDouble)
      val want = for (i <- 0 until 3; j <- 0 until 3) yield ubg(i)(j)
      vals.zip(want).foreach { case (got, w) =>
        assert(math.abs(got - w) < 1e-10, s"group $g") }
    }
    assert(run(11).view.mapValues(_.toString).toMap ==
      out.view.mapValues(_.toString).toMap)
  }

  test("degenerate input (collinear reflections / single row) flags invalid") {
    val lat = Lattice(5.0, 5.0, 5.0, 90, 90, 90)
    val df = Seq(
      (1L, 1.0, 0.0, 0.0, 0.2, 0.0, 0.0),
      (1L, 2.0, 0.0, 0.0, 0.4, 0.0, 0.0), // collinear with the first
      (2L, 1.0, 0.0, 0.0, 0.2, 0.0, 0.0)  // only one reflection
    ).toDF("g", "h", "k", "l", "qx", "qy", "qz")
    val out = UBMatrix.ubGroups(df, lat, "g", "h", "k", "l", "qx", "qy", "qz")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> false, 2L -> false))
  }
}
