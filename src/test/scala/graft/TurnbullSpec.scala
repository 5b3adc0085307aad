package graft

import graft.operators.Turnbull

/** Behavior pins for the Turnbull interval-censoring NPMLE (#421):
  * Kaplan–Meier reduction on exact + right-censored data, mass
  * normalization, interval construction, the all-censored
  * degenerate, and rerun determinism.
  */
class TurnbullSpec extends SparkSpec {

  test("exact observations: masses equal empirical frequencies") {
    // deaths observed exactly as (t, t+1]
    val obs = Seq((0L, 1L, 2L), (1L, 2L, 5L), (3L, 4L, 3L))
    val m = Turnbull.npmle(obs)
    assert(m.map(x => (x.q, x.p)) == Seq((0L, 1L), (1L, 2L), (3L, 4L)))
    assert(math.abs(m(0).s - 0.2) < 1e-9)
    assert(math.abs(m(1).s - 0.5) < 1e-9)
    assert(math.abs(m(2).s - 0.3) < 1e-9)
    assert(math.abs(m.map(_.s).sum - 1.0) < 1e-9)
  }

  test("exact + right-censored reduces to Kaplan-Meier") {
    // 10 subjects: 4 die in (1,2], 2 censored at 2 (i.e. (2, inf)),
    // 3 die in (3,4], 1 censored at 4.
    // KM: S(2) = 1 - 4/10 = 0.6; S(4) = 0.6 * (1 - 3/4) = 0.15.
    val obs = Seq(
      (1L, 2L, 4L), (2L, Turnbull.Inf, 2L),
      (3L, 4L, 3L), (4L, Turnbull.Inf, 1L))
    val m = Turnbull.npmle(obs, iters = 500)
    val death = m.filter(_.p != Turnbull.Inf)
    assert(death.map(x => (x.q, x.p)) == Seq((1L, 2L), (3L, 4L)))
    assert(math.abs(death(0).s - 0.4) < 1e-6, s"mass1 ${death(0).s}")
    assert(math.abs(death(1).s - 0.45) < 1e-6, s"mass2 ${death(1).s}")
    // survival just after the second death interval = KM's 0.15
    assert(math.abs(death(1).surv - 0.15) < 1e-6, s"surv ${death(1).surv}")
  }

  test("turnbull intervals exclude spans containing interior endpoints") {
    // observations (0, 10] and (2, 5]: innermost is (2, 5] only —
    // (0, 10] is not a Turnbull interval because 2 and 5 lie inside
    val obs = Seq((0L, 10L, 1L), (2L, 5L, 1L))
    val m = Turnbull.npmle(obs)
    assert(m.map(x => (x.q, x.p)) == Seq((2L, 5L)))
    assert(math.abs(m.head.s - 1.0) < 1e-9)
  }

  test("all right-censored: the single open-ended interval carries all mass") {
    val obs = Seq((3L, Turnbull.Inf, 4L), (7L, Turnbull.Inf, 2L))
    val m = Turnbull.npmle(obs)
    assert(m.map(x => (x.q, x.p)) == Seq((7L, Turnbull.Inf)))
    assert(math.abs(m.head.s - 1.0) < 1e-9)
  }

  test("rerun determinism") {
    val obs = Seq((0L, 7L, 9L), (7L, 14L, 4L), (5L, Turnbull.Inf, 6L))
    val a = Turnbull.npmle(obs)
    val b = Turnbull.npmle(obs)
    assert(a == b)
  }
}
