package graft.slope

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.scalatest.funsuite.AnyFunSuite

/** Wide-ADMM Woodbury branch (reference `src/families/gaussian.h:88-92`):
  * (X'X + rho I)^-1 q == (q - X'((rho I + X X')^-1 X q)) / rho. The
  * identity is exact, so the two factorizations must agree to numerical
  * precision on the same rho, and full fits through either x-update must
  * land on the same SLOPE optimum.
  */
class WideAdmmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def maxAbsDiff(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  test("Woodbury solve == normal-equation solve (pinned rho)") {
    val rng = new scala.util.Random(17)
    val n = 12; val a = 20
    val xmat = Array.fill(n * a)(rng.nextGaussian())
    val rho = 2.5
    // gram = X'X, K = X X'
    val gram = new Array[Double](a * a)
    for (j1 <- 0 until a; j2 <- 0 until a; i <- 0 until n)
      gram(j1 * a + j2) += xmat(i * a + j1) * xmat(i * a + j2)
    val k = new Array[Double](n * n)
    for (i1 <- 0 until n; i2 <- 0 until n; j <- 0 until a)
      k(i1 * n + i2) += xmat(i1 * a + j) * xmat(i2 * a + j)
    val gRho = gram.clone(); for (j <- 0 until a) gRho(j * a + j) += rho
    val kRho = k.clone(); for (i <- 0 until n) kRho(i * n + i) += rho
    val xty = Array.fill(a)(rng.nextGaussian())
    val tall = Admm.Factorization(Admm.cholesky(gRho, a), gram, xty, rho)
    val wide = Admm.Factorization(Admm.cholesky(kRho, n), null, xty, rho,
      xmat = xmat, nRows = n)
    for (_ <- 1 to 5) {
      val q = Array.fill(a)(rng.nextGaussian())
      assert(maxAbsDiff(tall.solve(q), wide.solve(q)) < 1e-9)
    }
    // and the quadratic form agrees: z'Gz == ||Xz||^2
    val z = Array.fill(a)(rng.nextGaussian())
    assert(math.abs(tall.gramQuad(z) - wide.gramQuad(z)) < 1e-9)
  }

  test("wide local fit (Woodbury ADMM) == FISTA on p > n gaussian") {
    val rng = new scala.util.Random(23)
    val n = 30; val p = 60
    val xs: Array[Vector] =
      Array.fill(n)(Vectors.dense(Array.fill(p)(rng.nextGaussian())))
    val ys: Array[Any] = xs.map(x =>
      (2.0 * x(0) - 3.0 * x(7) + 1.5 * x(42) + 0.2 * rng.nextGaussian()): Any)
    // screening off => full 61-row active set > n = 30 rows -> Woodbury
    val base = SlopeParams(family = "gaussian", nSigma = 10,
      screening = false, tolRelGap = 1e-8, tolInfeas = 1e-6,
      tolAbs = 1e-8, tolRel = 1e-7)
    val admm = Slope.fitLocal(xs, ys, base)
    val fista = Slope.fitLocal(xs, ys, base.copy(admmMaxActive = 0))
    assert(admm.nSteps == fista.nSteps)
    for (s <- 0 until admm.nSteps)
      assert(maxAbsDiff(admm.coefs(s), fista.coefs(s)) < 1e-4,
        s"step $s: ADMM-Woodbury and FISTA disagree")
  }

  test("wide distributed (Gram form) == wide local (Woodbury form)") {
    val rng = new scala.util.Random(29)
    val n = 25; val p = 40
    val rows = Array.fill(n)(
      (Array.fill(p)(rng.nextGaussian()).toSeq,
        rng.nextGaussian()))
    import spark.implicits._
    val df = rows.toSeq.toDF("features", "label")
    val params = SlopeParams(family = "gaussian", nSigma = 6,
      screening = false, tolAbs = 1e-8, tolRel = 1e-7)
    val local = Slope.fit(df, "features", "label", params)
    val dist = Slope.fit(df, "features", "label",
      params.copy(localCellLimit = 0))
    assert(local.nSteps == dist.nSteps)
    for (s <- 0 until local.nSteps)
      assert(maxAbsDiff(local.coefs(s), dist.coefs(s)) < 1e-4, s"step $s")
  }
}
