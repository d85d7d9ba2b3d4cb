package graft.slope.kernels

/** Proximal operator of the sorted-L1 (OWL / SLOPE) norm.
  *
  * Semantics follow the reference implementation (jolars/golem
  * `src/prox.h:8-56`): given a vector `v` and a non-increasing,
  * non-negative weight sequence `lambda` of the same length, solve
  *
  *   argmin_x  0.5 * ||x - v||^2  +  sum_i lambda_i * |x|_(i)
  *
  * where |x|_(i) is the i-th largest absolute value of x. The algorithm
  * is the stack-based pool-adjacent-violators (isotonic regression) pass
  * over the descending-sorted |v| - lambda, O(p log p) total.
  *
  * Driver-side kernel: p must fit in memory (p- and m-dimensional state
  * only, never n-dimensional).
  */
object Prox {

  /** Returns a new array; does not modify inputs. */
  def sortedL1(v: Array[Double], lambda: Array[Double]): Array[Double] = {
    val p = v.length
    require(lambda.length == p, s"lambda length ${lambda.length} != v length $p")
    if (p == 0) return new Array[Double](0)

    // indices of |v| in descending order of magnitude
    val order = Array.range(0, p)
      .sortBy(j => -math.abs(v(j)))

    // block partial sums / averages for the PAVA stack
    val s = new Array[Double](p)
    val w = new Array[Double](p)
    val blockStart = new Array[Int](p)
    val blockEnd = new Array[Int](p)

    var k = 0 // number of blocks on the stack
    var i = 0
    while (i < p) {
      blockStart(k) = i
      blockEnd(k) = i
      s(k) = math.abs(v(order(i))) - lambda(i)
      w(k) = s(k)
      // merge while the running block averages are non-decreasing
      while (k > 0 && w(k - 1) <= w(k)) {
        k -= 1
        blockEnd(k) = i
        s(k) += s(k + 1)
        w(k) = s(k) / (i - blockStart(k) + 1.0)
      }
      k += 1
      i += 1
    }

    val out = new Array[Double](p)
    var b = 0
    while (b < k) {
      val d = math.max(w(b), 0.0)
      var t = blockStart(b)
      while (t <= blockEnd(b)) {
        val j = order(t)
        out(j) = d * math.signum(v(j))
        t += 1
      }
      b += 1
    }
    out
  }
}
