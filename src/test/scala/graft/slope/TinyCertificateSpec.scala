package graft.slope

import org.scalatest.funsuite.AnyFunSuite

/** Engine-independent anchors for the `q_slope_tiny` golden (the analog
  * of the reference's bundled-dataset differential tests,
  * `tests/testthat/test-slope.R:4-23`):
  *
  *  1. every step of the exact path the golden records is certified
  *     optimal for the published SLOPE objective via a duality-gap bound
  *     whose math is written here from Bogdan et al. (2015), §2 — not
  *     via the engine's own primal/dual kernels;
  *  2. the constant-lambda (lasso) special case on the same fixture is
  *     checked against MLlib's LinearRegression L1 solver — a different
  *     library entirely.
  *
  * Together these give the committed golden parquet provenance that does
  * not pass through the engine: if a solver kernel were wrong from day
  * one, (1) would show a macroscopic gap and (2) would diverge from
  * MLlib.
  */
class TinyCertificateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q_slope_tiny path: independent duality-gap certificate per step") {
    val (xs, ys) = TinyProblem.data()
    val n = TinyProblem.N; val p = TinyProblem.P
    val fit = Slope.fitLocal(xs, ys.map(v => v: Any), TinyProblem.pathParams)
    assert(fit.nSteps > 5, s"path too short (${fit.nSteps}) to anchor anything")
    // internal problem (fitIntercept=false, center=false, scale=none):
    //   min_b 0.5*||y_c - X b||^2 + sum_i lamInt_i |b|_(i)
    // with y_c = y - mean(y) and lamInt_i = model.lambda_i * n * sigma_s
    val yMean = ys.sum / n
    val yc = ys.map(_ - yMean)
    for (s <- 0 until fit.nSteps) {
      val beta = fit.coefs(s)
      val lam = fit.lambda.map(_ * n * fit.sigma(s))
      // residual r = y_c - X b, gradient magnitude |X'r|
      val resid = Array.tabulate(n) { i =>
        var lp = 0.0
        xs(i).foreachActive((j, v) => lp += beta(j) * v)
        yc(i) - lp
      }
      val absG = Array.tabulate(p) { j =>
        var g = 0.0
        var i = 0
        while (i < n) { g += xs(i)(j) * resid(i); i += 1 }
        math.abs(g)
      }.sortBy(-(_: Double))
      // primal
      var primal = 0.0
      for (i <- 0 until n) primal += 0.5 * resid(i) * resid(i)
      val absB = beta.map(math.abs).sortBy(-(_: Double))
      for (j <- 0 until p) primal += lam(j) * absB(j)
      // scale residual into the dual-feasible polytope
      // {v : cumsum(sort|X'v|) <= cumsum(lam)} and evaluate the dual
      var cg = 0.0; var cl = 0.0; var alpha = 0.0
      for (j <- 0 until p) {
        cg += absG(j); cl += lam(j)
        if (cl > 0) alpha = math.max(alpha, cg / cl)
      }
      val scaleT = 1.0 / math.max(1.0, alpha)
      var dual = 0.0
      for (i <- 0 until n) {
        val y = yc(i); val th = scaleT * resid(i)
        dual += 0.5 * y * y - 0.5 * (y - th) * (y - th)
      }
      val gap = primal - dual
      assert(gap >= -1e-8, s"step $s: negative gap $gap — certificate broken")
      assert(gap / math.max(1e-12, primal) < 1e-5,
        s"step $s: relative gap ${gap / primal} — recorded path not optimal " +
          s"for the published objective")
    }
    // the path should also recover the planted sparsity pattern at the end
    val last = fit.coefs(fit.nSteps - 1)
    assert(math.abs(last(0)) > 1.0 && math.abs(last(1)) > 0.5 &&
      math.abs(last(4)) > 0.3, s"planted signals missed: ${last.toList}")
  }

  test("tiny fixture, constant lambda: engine lasso == MLlib lasso") {
    val (xs, ys) = TinyProblem.data()
    val n = TinyProblem.N; val p = TinyProblem.P
    val c = 0.1
    val fit = Slope.fitLocal(xs, ys.map(v => v: Any),
      SlopeParams(family = "gaussian", fitIntercept = true,
        center = Some(false), scale = "none", lambdaType = "user",
        userLambda = Some(Array.fill(p)(c)), sigma = Some(Array(1.0)),
        screening = false, tolRelGap = 1e-10, tolInfeas = 1e-8))
    // engine objective (x n^-1): (1/2n)||y - b0 - Xb||^2 + c * ||b||_1
    // == MLlib squaredError + L1 with regParam = c, standardization off
    import spark.implicits._
    val df = xs.indices.map(i => (xs(i), ys(i))).toDF("features", "label")
    val lr = new org.apache.spark.ml.regression.LinearRegression()
      .setElasticNetParam(1.0).setRegParam(c)
      .setStandardization(false).setFitIntercept(true)
      .setMaxIter(10000).setTol(1e-12)
    val mllib = lr.fit(df)
    val mlCoef = mllib.coefficients.toArray
    for (j <- 0 until p)
      assert(math.abs(fit.coefs(0)(j) - mlCoef(j)) < 1e-4,
        s"coef $j: engine ${fit.coefs(0)(j)} vs MLlib ${mlCoef(j)}")
    assert(math.abs(fit.intercepts(0)(0) - mllib.intercept) < 1e-4,
      s"intercept: engine ${fit.intercepts(0)(0)} vs MLlib ${mllib.intercept}")
    // and the L1 shrinkage must actually bind (not an unregularized tie)
    val (_, olsCoef) = {
      val spec = new SlopeFitSpec
      spec.ols(xs, ys)
    }
    assert(fit.coefs(0).map(math.abs).sum < olsCoef.map(math.abs).sum - 1e-3,
      "lambda did not shrink anything — the comparison would be vacuous")
  }
}
