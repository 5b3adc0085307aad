package graft

import graft.operators.Ordinal

/** Behavior pins for the proportional-odds full-Newton fit (#420):
  * the J = 2 closed-form logistic reduction, cutpoint monotonicity,
  * model recovery on model-generated counts, rerun determinism, and
  * the rank-deficient degenerate.
  */
class OrdinalSpec extends SparkSpec {

  private def sigma(z: Double) = 1.0 / (1.0 + math.exp(-z))

  test("J = 2 reduces to binary logistic: theta and beta match the 2x2 closed form") {
    // cells (x, j, n): j=0 "success", j=1 "failure" of P(Y<=0|x)=sigma(theta - beta x)
    val cells = Seq((0, 0, 30L), (0, 1, 70L), (1, 0, 60L), (1, 1, 40L))
    val fit = Ordinal.fitPropOdds(cells, iters = 40)
    val theta = math.log(30.0 / 70.0)
    val beta = theta - math.log(60.0 / 40.0)
    assert(math.abs(fit.theta(0) - theta) < 1e-8, s"theta ${fit.theta(0)} vs $theta")
    assert(math.abs(fit.beta - beta) < 1e-8, s"beta ${fit.beta} vs $beta")
  }

  test("recovers the generating model from model-exact expected counts") {
    // theta = (-1, 0.5), beta = 0.8; expected counts at n=100000 per x
    val th = Array(-1.0, 0.5)
    val b = 0.8
    val cells = for {
      x <- Seq(0, 1)
      j <- 0 to 2
    } yield {
      val hi = if (j >= 2) 1.0 else sigma(th(j) - b * x)
      val lo = if (j == 0) 0.0 else sigma(th(j - 1) - b * x)
      (x, j, math.round((hi - lo) * 1000000).max(1L))
    }
    val fit = Ordinal.fitPropOdds(cells, iters = 50)
    assert(math.abs(fit.theta(0) - th(0)) < 1e-3, fit.theta.mkString(","))
    assert(math.abs(fit.theta(1) - th(1)) < 1e-3, fit.theta.mkString(","))
    assert(math.abs(fit.beta - b) < 1e-3, s"beta ${fit.beta}")
  }

  test("cutpoints stay monotone and the fit is deterministic across reruns") {
    val cells = Seq(
      (0, 0, 12L), (0, 1, 40L), (0, 2, 30L), (0, 3, 18L),
      (1, 0, 5L), (1, 1, 25L), (1, 2, 38L), (1, 3, 32L))
    val f1 = Ordinal.fitPropOdds(cells)
    val f2 = Ordinal.fitPropOdds(cells)
    assert(f1.theta.toSeq == f2.theta.toSeq && f1.beta == f2.beta,
      "rerun must be bit-identical")
    assert(f1.theta.sliding(2).forall(p => p(0) < p(1)),
      s"cutpoints not monotone: ${f1.theta.mkString(",")}")
    // a positive beta shifts x=1 mass upward, matching the data
    assert(f1.beta > 0, s"beta ${f1.beta}")
  }

  test("single-x (rank-deficient beta) degrades to a clean cumulative-logit fit") {
    val cells = Seq((0, 0, 20L), (0, 1, 50L), (0, 2, 30L))
    val fit = Ordinal.fitPropOdds(cells, iters = 40)
    // with x identically 0 the cutpoints are the empirical cumulative logits
    assert(math.abs(fit.theta(0) - math.log(20.0 / 80.0)) < 1e-8)
    assert(math.abs(fit.theta(1) - math.log(70.0 / 30.0)) < 1e-8)
    assert(!fit.beta.isNaN)
  }
}
