package graft.slope

import graft.slope.kernels.{LambdaSequence, Prox, Screening, Stats}
import org.scalatest.funsuite.AnyFunSuite

class KernelsSpec extends AnyFunSuite {

  def sortedL1Objective(x: Array[Double], v: Array[Double], lam: Array[Double]): Double = {
    var f = 0.0
    for (i <- x.indices) { val d = x(i) - v(i); f += 0.5 * d * d }
    val absSorted = x.map(math.abs).sorted(Ordering[Double].reverse)
    for (i <- x.indices) f += lam(i) * absSorted(i)
    f
  }

  test("prox: hand cases") {
    // lambda all zero -> identity
    val v = Array(3.0, -1.0, 2.0)
    assert(Prox.sortedL1(v, Array(0.0, 0.0, 0.0)).sameElements(v))
    // scalar case: soft threshold
    assert(Prox.sortedL1(Array(5.0), Array(2.0)).sameElements(Array(3.0)))
    assert(Prox.sortedL1(Array(-5.0), Array(2.0)).sameElements(Array(-3.0)))
    assert(Prox.sortedL1(Array(1.0), Array(2.0)).sameElements(Array(0.0)))
  }

  test("prox: output is argmin (random perturbation check)") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val p = 1 + rng.nextInt(20)
      val v = Array.fill(p)(rng.nextGaussian() * 3)
      val lam = Array.fill(p)(math.abs(rng.nextGaussian()))
        .sorted(Ordering[Double].reverse)
      val x = Prox.sortedL1(v, lam)
      val f0 = sortedL1Objective(x, v, lam)
      for (_ <- 1 to 30) {
        val xp = x.clone()
        val j = rng.nextInt(p)
        xp(j) += (rng.nextGaussian()) * 0.1
        assert(sortedL1Objective(xp, v, lam) >= f0 - 1e-9,
          s"perturbation improved objective: v=${v.toList} lam=${lam.toList}")
      }
    }
  }

  test("prox: ties pool to common magnitude") {
    // v = (2, 2), lambda = (3, 1): soft-thresholding separately would give
    // (-1 -> 0, 1) violating the sorted-L1 structure; pooling gives (1, 1) / 2 = avg
    val out = Prox.sortedL1(Array(2.0, 2.0), Array(3.0, 1.0))
    assert(math.abs(out(0) - out(1)) < 1e-12)
    assert(math.abs(out(0) - 0.0) < 1e-12) // (2-3 + 2-1)/2 = 0
  }

  test("qnorm matches known quantiles") {
    assert(math.abs(Stats.qnorm(0.975) - 1.959963984540054) < 1e-9)
    assert(math.abs(Stats.qnorm(0.5)) < 1e-12)
    assert(math.abs(Stats.qnorm(0.9) - 1.2815515655446004) < 1e-9)
  }

  test("bh lambda sequence formula") {
    val lam = LambdaSequence.bh(4, 0.2)
    // lambda_i = qnorm(1 - (i+1)*0.2/8)
    for (i <- 0 until 4)
      assert(math.abs(lam(i) - Stats.qnorm(1.0 - (i + 1) * 0.2 / 8.0)) < 1e-12)
    assert(lam.sliding(2).forall(w => w(0) >= w(1)))
  }

  test("gaussian lambda sequence is non-increasing and >= 0") {
    for (n <- Seq(10L, 100L, 1000L); nl <- Seq(5, 50); q <- Seq(0.05, 0.2)) {
      val lam = LambdaSequence.gaussian(nl, q, n)
      assert(lam.sliding(2).forall(w => w.length < 2 || w(0) >= w(1) - 1e-12),
        s"not non-increasing for n=$n nl=$nl q=$q: ${lam.toList}")
      assert(lam.forall(_ > 0))
    }
  }

  test("oscar lambda sequence") {
    val lam = LambdaSequence.oscar(4, 0.5)
    assert(lam.sameElements(Array(2.5, 2.0, 1.5, 1.0)))
  }

  test("sigmaMax null-model optimality boundary") {
    // at sigma slightly above sigmaMax the zero vector is prox-stable
    val g = Array(3.0, 1.0, 0.5)
    val lam = Array(2.0, 1.5, 1.0)
    val sm = LambdaSequence.sigmaMax(g, lam)
    val eps = 1e-9
    val above = Prox.sortedL1(g, lam.map(_ * sm * (1 + eps)))
    assert(above.forall(x => math.abs(x) < 1e-6))
    val below = Prox.sortedL1(g, lam.map(_ * sm * 0.9))
    assert(below.exists(x => math.abs(x) > 1e-6))
  }

  test("infeasibility zero inside the dual ball") {
    assert(Screening.infeasibility(Array(0.5, -0.3), Array(1.0, 0.8)) == 0.0)
    assert(Screening.infeasibility(Array(2.0, 0.1), Array(1.0, 0.8)) == 1.0)
  }

  test("set operations") {
    assert(Screening.union(Array(1, 3), Array(2, 3)).sameElements(Array(1, 2, 3)))
    assert(Screening.diff(Array(1, 2, 3), Array(2)).sameElements(Array(1, 3)))
    assert(Screening.intersect(Array(3, 1, 2), Array(2, 3)).sameElements(Array(2, 3)))
  }
}
