package graft.slope

import org.apache.spark.ml.linalg.{Vector, Vectors}

/** Tiny deterministic SLOPE fixture (n=20, p=5) — the externally-anchored
  * golden's data source, mirroring the role of the reference's bundled
  * real datasets (`/root/reference/data-raw/datasets.R:1-243`,
  * `tests/testthat/test-slope.R:4-23`).
  *
  * The draws come from a 64-bit LCG (integer arithmetic only, scaled by
  * exact powers of two), so the data is bit-identical on every platform —
  * no dependence on `Math.sin`-style 1-ulp-licensed intrinsics or on RNG
  * library versions. `TinyCertificateSpec` certifies the engine's fitted
  * path on this data against an independently-written SLOPE duality-gap
  * certificate and against MLlib's lasso — provenance that does NOT pass
  * through the engine's own kernels.
  */
object TinyProblem {
  val N = 20
  val P = 5

  /** Planted coefficients (two zeros — sparsity the path should find). */
  val TrueBeta: Array[Double] = Array(3.0, -2.0, 0.0, 0.0, 1.5)

  def data(): (Array[Vector], Array[Double]) = {
    var state = 123456789L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      // top 53 bits -> [0,1) exactly, then shift to [-1,1)
      (state >>> 11).toDouble / 9007199254740992.0 * 2.0 - 1.0
    }
    val xs = Array.fill(N) {
      val row = new Array[Double](P)
      var j = 0
      while (j < P) { row(j) = next(); j += 1 }
      Vectors.dense(row): Vector
    }
    val ys = xs.map { x =>
      var s = 0.0
      var j = 0
      while (j < P) { s += TrueBeta(j) * x(j); j += 1 }
      s + 0.1 * next()
    }
    (xs, ys)
  }

  /** The exact params the `q_slope_tiny` golden is fitted with: no
    * intercept / centering / scaling, so the internal problem IS
    *   min 0.5*||y_c - X b||^2 + sigma * sum_i lam_i |b|_(i)
    * (y centered by its mean — the gaussian encoder always does) and the
    * certificate in TinyCertificateSpec applies verbatim. */
  def pathParams: SlopeParams = SlopeParams(family = "gaussian",
    fitIntercept = false, center = Some(false), scale = "none",
    nSigma = 20, lambdaMinRatio = Some(1e-3),
    // tight stopping so the certificate in TinyCertificateSpec can hold
    // the recorded path to a sharp (1e-5) independent optimality bound
    // (tolAbs/tolRel drive the ADMM gaussian branch; tolRelGap FISTA)
    tolRelGap = 1e-8, tolInfeas = 1e-7, tolAbs = 1e-9, tolRel = 1e-8)
}
