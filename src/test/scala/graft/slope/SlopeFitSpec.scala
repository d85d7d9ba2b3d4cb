package graft.slope

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests mirroring the reference's testthat suite
  * (test-gaussian.R, test-binomial.R, test-poisson.R,
  * test-screening-rules.R, test-sparsity.R): unregularized fits vs
  * closed-form OLS / IRLS oracles computed in-test, plus metamorphic
  * equivalences. All pure-local (LocalBackend) — no SparkSession.
  */
class SlopeFitSpec extends AnyFunSuite {

  /** Port of the reference fixture factory `randomProblem`
    * (R/utils.R:15-76): X ~ N(0,1), planted +-amplitude signals. */
  def randomProblem(seed: Int, n: Int, p: Int, qSignal: Double = 0.2,
                    amplitude: Double = 3.0, family: String = "gaussian",
                    nClasses: Int = 3): (Array[Vector], Array[Any]) = {
    val rng = new scala.util.Random(seed)
    val m = if (family == "multinomial") nClasses - 1 else 1
    val beta = Array.fill(p * m)(0.0)
    val nSignal = math.max(1, (qSignal * p * m).toInt)
    val idx = rng.shuffle((0 until p * m).toList).take(nSignal)
    idx.foreach(j => beta(j) = (if (rng.nextBoolean()) 1 else -1) * amplitude)
    val xs = Array.fill(n)(Vectors.dense(Array.fill(p)(rng.nextGaussian())))
    val ys: Array[Any] = family match {
      case "gaussian" =>
        xs.map { x => (dot(x, beta, 0, p) + rng.nextGaussian()): Any }
      case "binomial" =>
        xs.map { x =>
          (if (dot(x, beta, 0, p) + rng.nextGaussian() > 0) "b" else "a"): Any
        }
      case "poisson" =>
        xs.map { x =>
          val lp = 0.2 * dot(x, beta, 0, p)
          val lam = math.exp(lp)
          // Knuth poisson sampler
          var l = math.exp(-lam); var k = 0; var pp = 1.0
          while ({ pp *= rng.nextDouble(); pp > l }) k += 1
          k.toDouble: Any
        }
      case "multinomial" =>
        xs.map { x =>
          val logits = Array.tabulate(m)(k => dot(x, beta, k, p)) :+ 0.0
          val mx = logits.max
          val ex = logits.map(v => math.exp(v - mx))
          val tot = ex.sum
          var r = rng.nextDouble() * tot
          var k = 0
          while (k < m && r > ex(k)) { r -= ex(k); k += 1 }
          ("c" + k): Any
        }
    }
    (xs, ys)
  }

  private def dot(x: Vector, beta: Array[Double], k: Int, p: Int): Double = {
    var s = 0.0
    x.foreachActive((j, v) => s += v * beta(k * p + j))
    s
  }

  /** OLS via normal equations with intercept: returns (b0, coefs). */
  def ols(xs: Array[Vector], ys: Array[Double]): (Double, Array[Double]) = {
    val p = xs(0).size
    val a = p + 1
    val g = new Array[Double](a * a)
    val xty = new Array[Double](a)
    for (i <- xs.indices) {
      val row = new Array[Double](a)
      row(0) = 1.0
      xs(i).foreachActive((j, v) => row(j + 1) = v)
      for (j1 <- 0 until a; j2 <- 0 until a) g(j1 * a + j2) += row(j1) * row(j2)
      for (j1 <- 0 until a) xty(j1) += row(j1) * ys(i)
    }
    val l = Admm.cholesky(g, a)
    val sol = Admm.cholSolve(l, a, xty)
    (sol(0), sol.drop(1))
  }

  /** Newton-IRLS GLM oracle for binomial {0,1} / poisson with intercept. */
  def irls(xs: Array[Vector], ys: Array[Double], family: String,
           iters: Int = 50): Array[Double] = {
    val p = xs(0).size
    val a = p + 1
    var beta = new Array[Double](a)
    for (_ <- 1 to iters) {
      val h = new Array[Double](a * a)
      val gvec = new Array[Double](a)
      for (i <- xs.indices) {
        val row = new Array[Double](a)
        row(0) = 1.0
        xs(i).foreachActive((j, v) => row(j + 1) = v)
        var lp = 0.0
        for (j <- 0 until a) lp += row(j) * beta(j)
        val (mu, w) = family match {
          case "binomial" => val e = 1.0 / (1.0 + math.exp(-lp)); (e, e * (1 - e))
          case "poisson"  => val e = math.exp(lp); (e, e)
        }
        for (j <- 0 until a) gvec(j) += row(j) * (ys(i) - mu)
        for (j1 <- 0 until a; j2 <- 0 until a)
          h(j1 * a + j2) += w * row(j1) * row(j2)
      }
      val l = Admm.cholesky(h, a)
      val step = Admm.cholSolve(l, a, gvec)
      beta = beta.zip(step).map { case (b, s) => b + s }
    }
    beta
  }

  def maxAbsDiff(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  test("unregularized gaussian matches OLS (mirrors test-gaussian.R:1-17)") {
    val (xs, ysAny) = randomProblem(42, 200, 8)
    val ys = ysAny.map(_.asInstanceOf[Double])
    val (b0, coef) = ols(xs, ys)
    for (scale <- Seq("l2", "sd", "none"); admm <- Seq(true, false)) {
      val params = SlopeParams(family = "gaussian", scale = scale,
        sigma = Some(Array(1e-9)), screening = false,
        admmMaxActive = if (admm) 4096 else 0)
      val fit = Slope.fitLocal(xs, ysAny, params)
      assert(maxAbsDiff(fit.coefs(0), coef) < 1e-3,
        s"scale=$scale admm=$admm: ${fit.coefs(0).toList} vs ${coef.toList}")
      assert(math.abs(fit.intercepts(0)(0) - b0) < 1e-3, s"scale=$scale admm=$admm")
    }
  }

  test("unregularized binomial matches IRLS glm (mirrors test-binomial.R:1-22)") {
    val (xs, ysAny) = randomProblem(11, 400, 3, family = "binomial")
    val y01 = ysAny.map(a => if (a == "b") 1.0 else 0.0)
    val oracle = irls(xs, y01, "binomial")
    val fit = Slope.fitLocal(xs, ysAny,
      SlopeParams(family = "binomial", sigma = Some(Array(1e-5)), screening = false))
    assert(math.abs(fit.intercepts(0)(0) - oracle(0)) < 1e-3)
    assert(maxAbsDiff(fit.coefs(0), oracle.drop(1)) < 1e-3,
      s"${fit.coefs(0).toList} vs ${oracle.toList}")
  }

  test("unregularized poisson matches IRLS glm (mirrors test-poisson.R:1-27)") {
    val (xs, ysAny) = randomProblem(5, 300, 4, family = "poisson")
    val ys = ysAny.map(_.asInstanceOf[Double])
    val oracle = irls(xs, ys, "poisson")
    for (interceptFlag <- Seq(true, false)) {
      val fit = Slope.fitLocal(xs, ysAny,
        SlopeParams(family = "poisson", fitIntercept = interceptFlag,
          sigma = Some(Array(1e-6)), screening = false,
          tolRelGap = 1e-8, tolInfeas = 1e-6))
      if (interceptFlag) {
        assert(math.abs(fit.intercepts(0)(0) - oracle(0)) < 1e-2)
        assert(maxAbsDiff(fit.coefs(0), oracle.drop(1)) < 1e-2,
          s"${fit.coefs(0).toList} vs ${oracle.toList}")
      } else {
        // oracle without intercept
        val a = xs(0).size
        assert(fit.coefs(0).length == a)
      }
    }
  }

  test("unregularized multinomial gradient vanishes at solution") {
    val (xs, ysAny) = randomProblem(3, 300, 3, family = "multinomial")
    val fit = Slope.fitLocal(xs, ysAny,
      SlopeParams(family = "multinomial", sigma = Some(Array(1e-5)),
        screening = false))
    assert(fit.m == 2 && fit.nClasses == 3)
    assert(fit.classNames.sameElements(Array("c0", "c1", "c2")))
    // check the probability-weighted residual is ~0 per class on average
    val m = fit.m
    val probs = xs.indices.map { i =>
      val lp = fit.linearPredictor(xs(i), 0) :+ 0.0
      val mx = lp.max
      val ex = lp.map(v => math.exp(v - mx))
      ex.map(_ / ex.sum)
    }
    for (k <- 0 until m) {
      val resid = xs.indices.map { i =>
        val yk = if (ysAny(i) == s"c$k") 1.0 else 0.0
        probs(i)(k) - yk
      }.sum / xs.length
      assert(math.abs(resid) < 1e-3, s"class $k mean residual $resid")
    }
  }

  test("screening on == screening off (mirrors test-screening-rules.R)") {
    for (family <- Seq("gaussian", "binomial", "poisson", "multinomial")) {
      val (xs, ysAny) = randomProblem(216, 100, 20, family = family)
      val base = SlopeParams(family = family, nSigma = 20)
      val on = Slope.fitLocal(xs, ysAny, base.copy(screening = true))
      val offF = Slope.fitLocal(xs, ysAny, base.copy(screening = false))
      assert(on.nSteps == offF.nSteps, s"$family path lengths differ")
      // Both runs stop on the same relative criteria (duality gap 1e-5 /
      // ADMM residuals), which bounds OBJECTIVE agreement, not pointwise
      // coefficients: in flat directions ~1e-3 coefficient fuzz is
      // inherent to the solver, independent of screening. Assert a tight
      // deviance (objective) match plus a loose coefficient match.
      for (s <- 0 until on.nSteps) {
        val devRel = math.abs(on.deviances(s) - offF.deviances(s)) /
          math.max(1e-12, math.abs(offF.deviances(s)))
        assert(devRel < 5e-4, s"$family step $s objective diverges ($devRel)")
        assert(maxAbsDiff(on.coefs(s), offF.coefs(s)) < 5e-3,
          s"$family step $s coefficients diverge")
      }
    }
  }

  test("sparse == dense (mirrors test-sparsity.R)") {
    val rng = new scala.util.Random(33)
    val n = 100; val p = 5
    val dense = Array.fill(n) {
      Vectors.dense(Array.fill(p)(if (rng.nextDouble() < 0.5) rng.nextGaussian() else 0.0))
    }
    val sparse = dense.map(v => v.toSparse: Vector)
    val ys: Array[Any] = dense.map(v => (v(0) * 2 - v(2) + rng.nextGaussian()): Any)
    val pd = SlopeParams(center = Some(false), nSigma = 10)
    val fd = Slope.fitLocal(dense, ys, pd)
    val fs = Slope.fitLocal(sparse, ys, pd)
    assert(fd.nSteps == fs.nSteps)
    for (s <- 0 until fd.nSteps)
      assert(maxAbsDiff(fd.coefs(s), fs.coefs(s)) < 1e-4, s"step $s")
  }

  test("ragged feature rows fail fast with a descriptive error") {
    val xs: Array[Vector] = Array(
      Vectors.dense(1.0, 2.0, 3.0),
      Vectors.dense(1.0, 2.0), // short row: would silently truncate dots
      Vectors.dense(0.5, 1.5, 2.5))
    val ys: Array[Any] = Array(1.0, 2.0, 3.0)
    val e = intercept[IllegalArgumentException] {
      Slope.fitLocal(xs, ys, SlopeParams(family = "gaussian"))
    }
    assert(e.getMessage.contains("length 2"), e.getMessage)
    assert(e.getMessage.contains("3"), e.getMessage)
  }

  test("path: first step is the null model, deviance ratio increases") {
    val (xs, ysAny) = randomProblem(8, 150, 10)
    val fit = Slope.fitLocal(xs, ysAny, SlopeParams(nSigma = 30))
    assert(fit.coefs(0).forall(_ == 0.0), "sigma_max step must be null model")
    assert(fit.devianceRatios.head < 1e-9)
    assert(fit.devianceRatios.last > 0.5, "path should explain variance")
    assert(fit.devianceRatios.sliding(2).forall(w => w.length < 2 || w(1) >= w(0) - 1e-9))
  }

  test("constant-lambda SLOPE == lasso KKT (mirrors test-lasso.R)") {
    // with all lambda equal, SLOPE == lasso; verify lasso KKT conditions:
    // |X_s^T r| = lam for active, <= lam for inactive (standardized scale)
    val (xs, ysAny) = randomProblem(21, 120, 8)
    val lamConst = 0.4
    val fit = Slope.fitLocal(xs, ysAny,
      SlopeParams(scale = "none", center = Some(true),
        lambdaType = "user", userLambda = Some(Array.fill(8)(lamConst)),
        sigma = Some(Array(1.0)), screening = false))
    val ys = ysAny.map(_.asInstanceOf[Double])
    val n = xs.length
    val coef = fit.coefs(0)
    val b0 = fit.intercepts(0)(0)
    for (j <- 0 until 8) {
      var g = 0.0
      for (i <- 0 until n) {
        var lp = b0
        xs(i).foreachActive((jj, v) => lp += coef(jj) * v)
        g += (ys(i) - lp) * xs(i)(j)
      }
      // user lambda scaled by n internally; gradient here is unnormalized
      val lamEff = lamConst * n
      if (coef(j) != 0.0)
        assert(math.abs(math.abs(g) - lamEff) < lamEff * 0.05 + 1e-6,
          s"active KKT |g|=${math.abs(g)} vs $lamEff at $j")
      else
        assert(math.abs(g) <= lamEff * 1.05 + 1e-6,
          s"inactive KKT |g|=${math.abs(g)} vs $lamEff at $j")
    }
  }
}
