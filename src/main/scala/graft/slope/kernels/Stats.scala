package graft.slope.kernels

import org.apache.commons.math3.distribution.{NormalDistribution, TDistribution}

/** Scalar statistical kernels needed by the path construction and the
  * CV summary (reference uses R's `qnorm` / `qt`; we use commons-math3,
  * which agrees to ~1e-9 or better across the needed range).
  */
object Stats {
  private val stdNormal = new NormalDistribution(null, 0.0, 1.0)

  /** Standard normal quantile, qnorm(p). */
  def qnorm(p: Double): Double = stdNormal.inverseCumulativeProbability(p)

  /** Student-t quantile, qt(p, df) — used for the CV 95% CI
    * (reference `R/trainOwl.R:153-156`). */
  def qt(p: Double, df: Double): Double =
    new TDistribution(null, df).inverseCumulativeProbability(p)

  /** exp with overflow trapped to the largest finite double
    * (reference uses Armadillo `trunc_exp`). */
  def truncExp(x: Double): Double = {
    val e = math.exp(x)
    if (e.isInfinity) Double.MaxValue else e
  }

  /** log with zero/negative trapped to log(smallest positive double) and
    * +inf trapped to log(largest double) (Armadillo `trunc_log`). */
  def truncLog(x: Double): Double =
    if (x <= Double.MinPositiveValue) -744.4400719213812 // log(MinPositiveValue)
    else if (x.isInfinity) 709.782712893384 // log(Double.MaxValue); +Inf only
    else math.log(x)
}
