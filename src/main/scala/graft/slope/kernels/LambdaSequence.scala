package graft.slope.kernels

/** Construction of the SLOPE penalty weight sequence lambda (length
  * m*p, non-increasing) and the sigma (penalty scale) grid.
  *
  * Semantics follow the reference `src/regularizationPath.h:9-72` and
  * `R/owl.R:276-413`. All driver-side: lengths are p*m (feature-sized).
  */
object LambdaSequence {

  /** Benjamini-Hochberg sequence: lambda_i = qnorm(1 - (i+1)*q/(2*nl))
    * for i = 0 .. nl-1 (reference `regularizationPath.h:28-33`). */
  def bh(nLambda: Int, q: Double): Array[Double] =
    Array.tabulate(nLambda)(i => Stats.qnorm(1.0 - (i + 1) * q / (2.0 * nLambda)))

  /** "gaussian" sequence: BH adjusted by the cumulative sum of squares
    * of the *already adjusted* previous entries, then clamped to be
    * non-increasing from the position of the minimum onwards
    * (reference `regularizationPath.h:35-46`). `n` is the row count. */
  def gaussian(nLambda: Int, q: Double, n: Long): Array[Double] = {
    val lam = bh(nLambda, q)
    if (nLambda > 1) {
      var sumSq = 0.0
      var i = 1
      while (i < nLambda) {
        sumSq += lam(i - 1) * lam(i - 1)
        val w = math.max(1.0, n.toDouble - i - 1.0)
        lam(i) *= math.sqrt(1.0 + sumSq / w)
        i += 1
      }
      // ensure non-increasing: from the first argmin onward, hold the min
      var minIdx = 0
      var minVal = lam(0)
      i = 1
      while (i < nLambda) {
        if (lam(i) < minVal) { minVal = lam(i); minIdx = i }
        i += 1
      }
      i = minIdx
      while (i < nLambda) { lam(i) = minVal; i += 1 }
    }
    lam
  }

  /** OSCAR sequence: lambda_i = q*(nl - 1 - i) + 1, linear decreasing
    * (reference `regularizationPath.h:48-50`). */
  def oscar(nLambda: Int, q: Double): Array[Double] =
    Array.tabulate(nLambda)(i => q * (nLambda - 1 - i) + 1.0)

  /** Dispatch by type; "user" lambdas are validated and scaled by n
    * (reference `regularizationPath.h:52-54`, `R/owl.R:405-412`). */
  def build(lambdaType: String, nLambda: Int, q: Double, n: Long,
            user: Option[Array[Double]]): Array[Double] = lambdaType match {
    case "bh"       => bh(nLambda, q)
    case "gaussian" => gaussian(nLambda, q, n)
    case "oscar"    => oscar(nLambda, q)
    case "user" =>
      val lam = user.getOrElse(throw new IllegalArgumentException(
        "lambdaType=user requires an explicit lambda sequence"))
      require(lam.length == nLambda, s"lambda length ${lam.length} != $nLambda")
      require(lam.forall(_ >= 0), "lambda must be non-negative")
      require(lam.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
        "lambda must be non-increasing")
      lam.map(_ * n)
    case other => throw new IllegalArgumentException(s"unknown lambda type: $other")
  }

  /** sigma_max given |lambda_max| gradient entries: the smallest scale at
    * which the null model is optimal (reference `regularizationPath.h:57-60`):
    * max over prefixes of cumsum(sort(|g|, desc)) / cumsum(lambda). */
  def sigmaMax(absGradient: Array[Double], lambda: Array[Double]): Double = {
    val sorted = absGradient.map(math.abs).sortBy(-_)
    var cg = 0.0
    var cl = 0.0
    var best = Double.NegativeInfinity
    var i = 0
    while (i < sorted.length) {
      cg += sorted(i)
      cl += lambda(i)
      val r = cg / cl
      if (r > best) best = r
      i += 1
    }
    best
  }

  /** Log-spaced sigma grid from sigma_max down to
    * sigma_max*minRatio (reference `regularizationPath.h:62-70`). */
  def sigmaGrid(sigMax: Double, minRatio: Double, nSigma: Int): Array[Double] = {
    if (nSigma == 1) return Array(sigMax)
    val lo = math.log(sigMax * minRatio)
    val hi = math.log(sigMax)
    Array.tabulate(nSigma)(i => math.exp(hi + (lo - hi) * i / (nSigma - 1.0)))
  }
}
