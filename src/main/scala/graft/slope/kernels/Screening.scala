package graft.slope.kernels

/** Driver-side optimality / screening kernels.
  *
  * All operate on p*m-sized state (never n-sized): the full gradient
  * matrix arrives from one distributed X^T·pseudoGradient pass.
  *
  * Layout convention: gradients and coefficients are stored as
  * column-major flattened (p rows x m targets) arrays, matching the
  * reference's Armadillo `vectorise` semantics.
  */
object Screening {

  /** Dual infeasibility of a gradient w.r.t. the sorted-L1 ball:
    * max(0, max_k cumsum_k(sort(|g|, desc) - lambda))
    * (reference `src/infeasibility.h:8-12`). `g` excludes the intercept. */
  def infeasibility(g: Array[Double], lambda: Array[Double]): Double = {
    if (g.length == 0) return 0.0
    val sorted = g.map(math.abs).sortBy(-_)
    var c = 0.0
    var best = Double.NegativeInfinity
    var i = 0
    while (i < sorted.length) {
      c += sorted(i) - lambda(i)
      if (c > best) best = c
      i += 1
    }
    math.max(best, 0.0)
  }

  /** KKT violation check (reference `src/kktCheck.h:8-37`).
    *
    * @param gradient  full gradient, p x m column-major (row 0 = intercept
    *                  when `intercept`)
    * @param beta      current coefficients, same shape
    * @param lambda    penalty weights, length (p - intercept)*m
    * @param tol       `tol_infeas`
    * @return indices of feature rows (0-based, counting the intercept row
    *         if present) that violate optimality and are not already active
    */
  def kktCheck(gradient: Array[Double], beta: Array[Double], p: Int, m: Int,
               lambda: Array[Double], tol: Double, intercept: Boolean): Array[Int] = {
    val off = if (intercept) 1 else 0
    val pf = p - off // penalized feature rows
    val q = pf * m
    // slice out the intercept row from each target column
    val g = new Array[Double](q)
    val b = new Array[Double](q)
    var k = 0
    var col = 0
    while (col < m) {
      var r = off
      while (r < p) {
        g(k) = gradient(col * p + r)
        b(k) = beta(col * p + r)
        k += 1
        r += 1
      }
      col += 1
    }

    val ord = Array.range(0, q).sortBy(j => -math.abs(g(j)))
    val rh = math.max(math.sqrt(2.220446049250313e-16), tol * lambda(0))

    val flag = new Array[Boolean](q)
    var c = 0.0
    var i = 0
    while (i < q) {
      c += math.abs(g(ord(i))) - lambda(i)
      flag(ord(i)) = c > rh
      i += 1
    }
    // already-nonzero coefficients are never violations
    i = 0
    while (i < q) { if (b(i) != 0.0) flag(i) = false; i += 1 }

    // any violation across targets -> feature row flagged
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var r = 0
    while (r < pf) {
      var anyV = false
      var cc = 0
      while (cc < m && !anyV) { anyV = flag(cc * pf + r); cc += 1 }
      if (anyV) out += (r + off)
      r += 1
    }
    out.toArray
  }

  /** Strong-rule screening for SLOPE (reference `src/screening.h:7-53`):
    * predicts the active set at penalty `lambda` from the gradient at the
    * previous penalty `lambdaPrev`. Returns sorted feature-row indices
    * (including the intercept row index 0 when `intercept`).
    */
  def strongSet(gradientPrev: Array[Double], p: Int, m: Int,
                lambda: Array[Double], lambdaPrev: Array[Double],
                intercept: Boolean): Array[Int] = {
    val off = if (intercept) 1 else 0
    val pf = p - off
    val q = pf * m
    val g = new Array[Double](q)
    var k = 0
    var col = 0
    while (col < m) {
      var r = off
      while (r < p) {
        g(k) = math.abs(gradientPrev(col * p + r))
        k += 1
        r += 1
      }
      col += 1
    }

    val ord = Array.range(0, q).sortBy(j => -g(j))
    // tmp_i = |g|_(i) + lambdaPrev_i - 2*lambda_i, scanned sequentially:
    // the kept prefix grows to k+i+1 whenever the running sum turns >= 0.
    var i = 0
    var kept = 0
    var s = 0.0
    while (i + kept < q) {
      s += g(ord(kept + i)) + lambdaPrev(kept + i) - 2.0 * lambda(kept + i)
      if (s >= 0) { kept = kept + i + 1; i = 0; s = 0.0 } else i += 1
    }

    val inSet = new Array[Boolean](q)
    i = 0
    while (i < kept) { inSet(ord(i)) = true; i += 1 }

    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (intercept) out += 0
    var r = 0
    while (r < pf) {
      var anyV = false
      var cc = 0
      while (cc < m && !anyV) { anyV = inSet(cc * pf + r); cc += 1 }
      if (anyV) out += (r + off)
      r += 1
    }
    out.toArray
  }

  /** Union of two sorted index arrays. */
  def union(a: Array[Int], b: Array[Int]): Array[Int] =
    (a.toSet ++ b.toSet).toArray.sorted

  /** a \ b for sorted index arrays. */
  def diff(a: Array[Int], b: Array[Int]): Array[Int] = {
    val bs = b.toSet
    a.filterNot(bs.contains)
  }

  /** Intersection of two index arrays, sorted. */
  def intersect(a: Array[Int], b: Array[Int]): Array[Int] = {
    val bs = b.toSet
    a.filter(bs.contains).sorted
  }
}
