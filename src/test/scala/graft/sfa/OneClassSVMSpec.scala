package graft.sfa

import org.scalatest.funsuite.AnyFunSuite

/** Invariant suite for the embedded one-class RBF SMO
  * (reference usage: TEASERClassifier.java:197-239,
  * Classifier.java:439-500 — ONE_CLASS, ν = 0.05, γ grid by 10-fold CV).
  *
  * The ν-property (Schölkopf et al. 2001, Prop. 4): ν upper-bounds the
  * fraction of training outliers and lower-bounds the fraction of SVs.
  */
class OneClassSVMSpec extends AnyFunSuite {

  private def cluster(n: Int, dim: Int, seed: Long, shift: Double = 0.0): Array[Array[Double]] = {
    val r = new java.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(shift + r.nextGaussian() * 0.3))
  }

  test("nu-property: training outlier fraction <= ~nu, SV fraction >= nu") {
    val xs = cluster(200, 4, 7L)
    val nu = 0.05
    val m = OneClassSVM.fit(xs, nu, gamma = 1.0)
    val outliers = xs.count(x => !m.accepts(x)) / xs.length.toDouble
    // the bound is asymptotic; allow slack above nu but require it is
    // in the right regime (not ~0, not several x nu)
    assert(outliers <= 3 * nu, s"outlier rate $outliers should be <= ~nu=$nu")
    assert(m.svs.length >= (nu * xs.length).floor.toInt,
      s"SV count ${m.svs.length} must be >= nu*l")
  }

  test("dual feasibility: 0 <= alpha_i <= 1 and sum(alpha) = nu*l") {
    val xs = cluster(150, 3, 11L)
    val nu = 0.1
    val m = OneClassSVM.fit(xs, nu, gamma = 2.0)
    assert(m.coefs.forall(a => a >= -1e-9 && a <= 1.0 + 1e-9))
    assert(math.abs(m.coefs.sum - nu * xs.length) < 1e-6,
      s"sum(alpha)=${m.coefs.sum} != nu*l=${nu * xs.length}")
  }

  test("geometry: cluster center accepted, far outliers rejected") {
    val xs = cluster(200, 4, 13L)
    val m = OneClassSVM.fitGrid(xs, nu = 0.05)
    assert(m.accepts(Array.fill(4)(0.0)), "cluster center must be inside")
    assert(!m.accepts(Array.fill(4)(50.0)), "far point must be outside")
    assert(m.decision(Array.fill(4)(0.0)) > m.decision(Array.fill(4)(50.0)))
  }

  test("fit is deterministic (fixed CV permutation, fixed grid order)") {
    val xs = cluster(120, 3, 17L)
    val a = OneClassSVM.fitGrid(xs, nu = 0.05)
    val b = OneClassSVM.fitGrid(xs, nu = 0.05)
    assert(a.gamma == b.gamma)
    assert(a.rho == b.rho)
    assert(a.coefs.toSeq == b.coefs.toSeq)
  }

  test("two separated modes: one-class region excludes the gap between them") {
    val xs = cluster(100, 2, 19L) ++ cluster(100, 2, 23L, shift = 6.0)
    val m = OneClassSVM.fit(xs, nu = 0.05, gamma = 2.0)
    assert(m.accepts(Array(0.0, 0.0)))
    assert(m.accepts(Array(6.0, 6.0)))
    assert(!m.accepts(Array(3.0, 3.0)), "midpoint of a bimodal problem must be novel")
  }

  test("empty input yields a reject-all model") {
    val m = OneClassSVM.fit(Array.empty[Array[Double]], nu = 0.05, gamma = 1.0)
    assert(!m.accepts(Array(0.0)))
  }
}
