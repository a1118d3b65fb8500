package graft.sfa

/** One-class RBF SVM (Schölkopf ν-formulation), replicating the
  * reference master's libsvm usage (TEASERClassifier.java:197-239,
  * Classifier.java:439-500): ONE_CLASS, RBF kernel, ν = 0.05,
  * eps = 1e-4, γ grid {100, 10, 9, …, 1.5, 1} selected by 10-fold CV
  * on the inside-rate with the reference's own fold permutation
  * (java.util.Random(1), Fisher–Yates with j = i + nextInt(l−i),
  * fold_start[i] = i·l/10).
  *
  * Dual: min ½αᵀQα s.t. 0 ≤ αᵢ ≤ 1, Σαᵢ = νl (libsvm's
  * solve_one_class initialization and box), solved by SMO with
  * maximal-violating-pair working-set selection; ρ from the KKT
  * conditions (mean gradient over free SVs). The problem is
  * model-sized by design — the reference trains libsvm on the
  * driver for exactly this input (≤ trainN vectors of ≤ #classes+1
  * dims), so a driver-side solve is the faithful scale story; only
  * ACCEPTANCE is applied distributedly (a broadcast model in a UDF).
  */
object OneClassSVM {

  final case class Model(
      svs: Array[Array[Double]],
      coefs: Array[Double],
      rho: Double,
      gamma: Double) {

    def decision(x: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < svs.length) {
        val v = svs(i)
        var d = 0.0
        var k = 0
        val n = math.min(v.length, x.length)
        while (k < n) { val t = v(k) - x(k); d += t * t; k += 1 }
        s += coefs(i) * math.exp(-gamma * d)
        i += 1
      }
      s - rho
    }

    /** libsvm svm_predict for ONE_CLASS: +1 inside iff decision > 0. */
    def accepts(x: Array[Double]): Boolean = decision(x) > 0
  }

  /** The reference's γ grid (TEASERClassifier.SVM_GAMMAS). */
  val Gammas: Array[Double] = Array(100, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1.5, 1)

  private def kernel(xs: Array[Array[Double]], gamma: Double): Array[Array[Double]] = {
    val l = xs.length
    val k = Array.ofDim[Double](l, l)
    var i = 0
    while (i < l) {
      var j = 0
      while (j <= i) {
        var d = 0.0
        var c = 0
        val a = xs(i); val b = xs(j)
        while (c < a.length) { val t = a(c) - b(c); d += t * t; c += 1 }
        val v = math.exp(-gamma * d)
        k(i)(j) = v
        k(j)(i) = v
        j += 1
      }
      i += 1
    }
    k
  }

  /** SMO for the one-class dual on a precomputed kernel. Returns
    * (alpha, rho).
    */
  private def solve(k: Array[Array[Double]], nu: Double, eps: Double): (Array[Double], Double) = {
    val l = k.length
    val alpha = new Array[Double](l)
    val n = nu * l
    var i = 0
    while (i < n.toInt) { alpha(i) = 1.0; i += 1 }
    if (i < l) alpha(i) = n - n.toInt
    val g = Array.tabulate(l) { r =>
      var s = 0.0
      var j = 0
      while (j < l) { s += k(r)(j) * alpha(j); j += 1 }
      s
    }
    val maxIter = math.max(100000, 200 * l * l)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      var gi = -1; var gmax = Double.NegativeInfinity
      var gj = -1; var gmin = Double.PositiveInfinity
      var m = 0
      while (m < l) {
        if (alpha(m) < 1.0 - 1e-12 && -g(m) > gmax) { gmax = -g(m); gi = m }
        if (alpha(m) > 1e-12 && -g(m) < gmin) { gmin = -g(m); gj = m }
        m += 1
      }
      if (gi < 0 || gj < 0 || gmax - gmin < eps) converged = true
      else {
        val quad = math.max(k(gi)(gi) + k(gj)(gj) - 2 * k(gi)(gj), 1e-12)
        var t = (g(gj) - g(gi)) / quad
        t = math.min(t, math.min(1.0 - alpha(gi), alpha(gj)))
        alpha(gi) += t
        alpha(gj) -= t
        m = 0
        while (m < l) { g(m) += t * (k(gi)(m) - k(gj)(m)); m += 1 }
      }
      iter += 1
    }
    // rho (libsvm calculate_rho, all labels +1): free-SV mean gradient,
    // else midpoint of the bound-derived interval
    var ub = Double.PositiveInfinity
    var lb = Double.NegativeInfinity
    var sumFree = 0.0
    var nFree = 0
    var m = 0
    while (m < l) {
      if (alpha(m) >= 1.0 - 1e-12) lb = math.max(lb, g(m))
      else if (alpha(m) <= 1e-12) ub = math.min(ub, g(m))
      else { nFree += 1; sumFree += g(m) }
      m += 1
    }
    val rho = if (nFree > 0) sumFree / nFree else (ub + lb) / 2
    (alpha, rho)
  }

  def fit(xs: Array[Array[Double]], nu: Double, gamma: Double, eps: Double = 1e-4): Model = {
    if (xs.isEmpty) return Model(Array.empty, Array.empty, Double.PositiveInfinity, gamma)
    val (alpha, rho) = solve(kernel(xs, gamma), nu, eps)
    val kept = alpha.indices.filter(alpha(_) > 1e-12)
    Model(kept.map(xs).toArray, kept.map(alpha).toArray, rho, gamma)
  }

  /** 10-fold CV inside-rate for one γ with the reference's permutation
    * (Classifier.trainSVMOneClass): each held-out sample is predicted
    * by a model trained on the other folds; score = fraction inside.
    */
  private def cvInsideRate(xs: Array[Array[Double]], nu: Double, gamma: Double): Double = {
    val l = xs.length
    val nrFold = 10
    val rand = new java.util.Random(1)
    val perm = Array.tabulate(l)(identity)
    var i = 0
    while (i < l) {
      val j = i + rand.nextInt(l - i)
      val tmp = perm(i); perm(i) = perm(j); perm(j) = tmp
      i += 1
    }
    val foldStart = Array.tabulate(nrFold + 1)(f => f * l / nrFold)
    var inside = 0
    var f = 0
    while (f < nrFold) {
      val begin = foldStart(f)
      val end = foldStart(f + 1)
      if (end > begin) {
        val trainIdx = (0 until begin) ++ (end until l)
        val sub = trainIdx.map(j => xs(perm(j))).toArray
        val model = fit(sub, nu, gamma)
        var j = begin
        while (j < end) {
          if (model.accepts(xs(perm(j)))) inside += 1
          j += 1
        }
      }
      f += 1
    }
    inside.toDouble / l
  }

  /** Reference master fit: γ grid by CV inside-rate (strict improvement,
    * grid order), final model trained on the full problem.
    */
  def fitGrid(xs: Array[Array[Double]], nu: Double): Model = {
    if (xs.isEmpty) return Model(Array.empty, Array.empty, Double.PositiveInfinity, Gammas.head)
    var bestGamma = Gammas.head
    var bestRate = -1.0
    Gammas.foreach { g =>
      val rate = cvInsideRate(xs, nu, g)
      if (rate > bestRate) { bestRate = rate; bestGamma = g }
    }
    fit(xs, nu, bestGamma)
  }
}
