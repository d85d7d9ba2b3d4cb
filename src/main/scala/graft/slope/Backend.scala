package graft.slope

import org.apache.spark.ml.linalg.{Vector, DenseVector, SparseVector}
import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

/** Data-access layer for the SLOPE solvers.
  *
  * Everything n-dimensional (rows, residuals, linear predictors) stays
  * behind this interface; the solvers above it only ever see p- and
  * m-dimensional state (coefficients, gradients, Gram matrices). That is
  * the key architectural change vs the reference, which holds X in RAM
  * and mutates it (`src/standardize.h:20,37`): here standardization is
  * *folded into the row kernels* — the data is never rewritten, which
  * also keeps sparse rows sparse.
  *
  * Coefficient-row numbering: when `fitIntercept`, row 0 is the
  * intercept (the reference's `cbind(1, x)` ones column, `R/owl.R:444-448`)
  * and rows 1..p are features; otherwise rows 0..p-1 are features.
  * `xCenter`/`xScale` use the same numbering with center 0 / scale 1 for
  * the intercept row.
  *
  * Pass results are sums over rows, so a distributed `treeAggregate`
  * and a local loop produce the same quantities (up to FP reorder).
  */
trait SlopeBackend {
  def n: Long
  def pRaw: Int // feature count, excluding intercept
  def m: Int // internal targets
  def fitIntercept: Boolean
  final def pInt: Int = pRaw + (if (fitIntercept) 1 else 0)

  /** Per-feature raw means (for centering, length pRaw) plus whether any
    * row uses a sparse representation — detected exactly in the same
    * aggregate (not a sample), since the flag steers the centering
    * default. This pass also validates per-row vector lengths, so the
    * later fused kernels can assume well-shaped rows. */
  def featureMeansAndSparsity(): (Array[Double], Boolean)

  /** Scale statistic per feature given centers (0s if no centering):
    * "l1" | "l2" | "sd" | "max" | "none", reference `src/standardize.h`. */
  def scaleStats(center: Array[Double], scale: String): Array[Double]

  /** Per-target label mean and population sd (multinomial lambdaMax
    * needs stddev(y, 1) — reference `src/lambdaMax.h:30-31`). */
  def yMoments(): (Array[Double], Array[Double])

  /** Install standardization vectors (coefficient-row numbering). */
  def setStandardization(xCenter: Array[Double], xScale: Array[Double]): Unit

  /** Fused pass at coefficients `betaActive` (|active| x m, column-major)
    * over standardized active columns: returns
    * (sum primal, sum dual (0 unless needDual), gradient |active| x m).
    */
  def evalActive(active: Array[Int], betaActive: Array[Double], family: Family,
                 needDual: Boolean, needGrad: Boolean): (Double, Double, Array[Double])

  /** Primal-only pass (line-search probes). */
  final def primalActive(active: Array[Int], betaActive: Array[Double],
                         family: Family): Double =
    evalActive(active, betaActive, family, needDual = false, needGrad = false)._1

  /** Fused TWO-POINT pass for the speculative FISTA step: primal at
    * the line-search candidate `candActive` PLUS the full
    * (primal, dual, gradient) at the momentum point `nextActive`, so
    * the accepted-step case costs ONE data scan per pass instead of
    * two. Values are identical to composing [[primalActive]] +
    * [[evalActive]] (each accumulator sums the same per-row terms in
    * the same order); the default does exactly that — distributed
    * backends override with one fused aggregation.
    * Returns (gCand, gNext, dualNext, gradNext). */
  def evalPairActive(active: Array[Int], candActive: Array[Double],
                     nextActive: Array[Double], family: Family)
    : (Double, Double, Double, Array[Double]) = {
    val gCand = primalActive(active, candActive, family)
    val (gNext, dualNext, gradNext) =
      evalActive(active, nextActive, family, needDual = true, needGrad = true)
    (gCand, gNext, dualNext, gradNext)
  }

  /** Gram matrix of standardized active columns (|a| x |a|, column-major)
    * and Xs_active^T y (|a| x m). One pass; |a| must be driver-sized. */
  def gramXty(active: Array[Int]): (Array[Double], Array[Double])

  /** Standardized active matrix (row-major n x |a|) + Xs^T y, for the
    * wide-ADMM Woodbury branch (m = 1 only). None when the rows are not
    * driver-resident — the distributed backend keeps the Gram form so
    * the cluster stays out of the ADMM inner loop. */
  def activeMatrixXty(active: Array[Int])
    : Option[(Array[Double], Array[Double])] = None

  /** Xs^T v over all pInt rows, where v_row = rowV(y_row) (length m).
    * Used by lambdaMax (`src/lambdaMax.h`). */
  def xtv(rowV: Array[Double] => Array[Double]): Array[Double]
}

private[slope] object BackendKernels extends Serializable {

  /** lp_k = b_k + sum_j w_jk x_j computed over nnz only. */
  def linPred(x: Vector, w: Array[Array[Double]], b: Array[Double],
              out: Array[Double]): Unit = {
    val m = b.length
    var k = 0
    while (k < m) { out(k) = b(k); k += 1 }
    x match {
      case d: DenseVector =>
        val v = d.values
        k = 0
        while (k < m) {
          val wk = w(k)
          var j = 0
          var s = 0.0
          while (j < v.length) { s += wk(j) * v(j); j += 1 }
          out(k) += s
          k += 1
        }
      case s: SparseVector =>
        val idx = s.indices; val v = s.values
        k = 0
        while (k < m) {
          val wk = w(k)
          var t = 0
          var acc = 0.0
          while (t < idx.length) { acc += wk(idx(t)) * v(t); t += 1 }
          out(k) += acc
          k += 1
        }
    }
  }

  /** Effective dense weights/offsets so that
    * lp = W^T x + b  ==  sum_{j active} beta_j * (x_j - c_j)/s_j
    *                     + beta_0 / s_0.
    * Returns (w: m arrays of length pRaw, b: length m).
    *
    * The intercept coordinate carries its own scale s_0 (set to sqrt(n)
    * by the orchestrator): the raw ones-column has squared norm n, which
    * would dominate the Lipschitz constant and make first-order solver
    * pass counts grow with n. Dividing by sqrt(n) is an exact
    * reparameterization (the intercept is unpenalized) that pins its
    * curvature at 1 regardless of data size. */
  def effectiveWeights(active: Array[Int], betaActive: Array[Double],
                       m: Int, pRaw: Int, fitIntercept: Boolean,
                       xCenter: Array[Double], xScale: Array[Double])
    : (Array[Array[Double]], Array[Double]) = {
    val a = active.length
    val w = Array.fill(m)(new Array[Double](pRaw))
    val b = new Array[Double](m)
    var k = 0
    while (k < m) {
      var i = 0
      while (i < a) {
        val row = active(i)
        val beta = betaActive(k * a + i)
        if (fitIntercept && row == 0) b(k) += beta / xScale(0)
        else {
          val j = if (fitIntercept) row - 1 else row
          val wv = beta / xScale(row)
          w(k)(j) = wv
          b(k) -= wv * xCenter(row)
        }
        i += 1
      }
      k += 1
    }
    (w, b)
  }

  /** Raw-feature-index -> active-slot map (-1 = inactive). */
  def slotMap(active: Array[Int], pRaw: Int, fitIntercept: Boolean): Array[Int] = {
    val s = Array.fill(pRaw)(-1)
    var i = 0
    while (i < active.length) {
      val row = active(i)
      if (!(fitIntercept && row == 0)) s(if (fitIntercept) row - 1 else row) = i
      i += 1
    }
    s
  }

  /** Per-row raw accumulation for the Gram pass. Buffer layout:
    * [G_raw(a*a), colSum(a), xty_raw(a*m), ySum(m)]. */
  def gramRowUpdate(x: Vector, y: Array[Double], slots: Array[Int],
                    buf: Array[Double], a: Int, m: Int,
                    tmpSlot: Array[Int], tmpVal: Array[Double]): Unit = {
    val gLen = a * a
    var cnt = 0
    x.foreachActive { (j, v) =>
      val s = slots(j)
      if (s >= 0 && v != 0.0) { tmpSlot(cnt) = s; tmpVal(cnt) = v; cnt += 1 }
    }
    var t1 = 0
    while (t1 < cnt) {
      val s1 = tmpSlot(t1); val v1 = tmpVal(t1)
      buf(gLen + s1) += v1
      var k = 0
      while (k < m) { buf(gLen + a + k * a + s1) += v1 * y(k); k += 1 }
      var t2 = 0
      while (t2 < cnt) { buf(tmpSlot(t2) * a + s1) += v1 * tmpVal(t2); t2 += 1 }
      t1 += 1
    }
    var k = 0
    while (k < m) { buf(gLen + a + a * m + k) += y(k); k += 1 }
  }

  /** Fold the raw Gram-pass buffer into the standardized Gram and
    * Xs^T y (both column-major). */
  def assembleGram(active: Array[Int], res: Array[Double], a: Int, m: Int,
                   n: Long, fitIntercept: Boolean, xCenter: Array[Double],
                   xScale: Array[Double]): (Array[Double], Array[Double]) = {
    val gLen = a * a
    val colSum = java.util.Arrays.copyOfRange(res, gLen, gLen + a)
    val xtyRaw = java.util.Arrays.copyOfRange(res, gLen + a, gLen + a + a * m)
    val ySum = java.util.Arrays.copyOfRange(res, gLen + a + a * m, res.length)
    val nn = n.toDouble
    val gram = new Array[Double](a * a)
    val xty = new Array[Double](a * m)
    var i = 0
    while (i < a) {
      val ri = active(i)
      val iIsInt = fitIntercept && ri == 0
      val ci = xCenter(ri); val si = xScale(ri)
      var j = 0
      while (j < a) {
        val rj = active(j)
        val jIsInt = fitIntercept && rj == 0
        val cj = xCenter(rj); val sj = xScale(rj)
        gram(j * a + i) =
          if (iIsInt && jIsInt) nn / (si * sj)
          else if (iIsInt) (colSum(j) - nn * cj) / (si * sj)
          else if (jIsInt) (colSum(i) - nn * ci) / (si * sj)
          else (res(j * a + i) - ci * colSum(j) - cj * colSum(i) + nn * ci * cj) / (si * sj)
        j += 1
      }
      var k = 0
      while (k < m) {
        xty(k * a + i) =
          if (iIsInt) ySum(k) / si
          else (xtyRaw(k * a + i) - ci * ySum(k)) / si
        k += 1
      }
      i += 1
    }
    (gram, xty)
  }

  /** Fold a raw accumulation (A = sum x_j * pg_k over active feature slots,
    * s0 = sum pg_k) into the standardized-space gradient. */
  def standardizeGrad(active: Array[Int], rawA: Array[Double], s0: Array[Double],
                      m: Int, fitIntercept: Boolean,
                      xCenter: Array[Double], xScale: Array[Double]): Array[Double] = {
    val a = active.length
    val g = new Array[Double](a * m)
    var k = 0
    while (k < m) {
      var i = 0
      while (i < a) {
        val row = active(i)
        g(k * a + i) =
          if (fitIntercept && row == 0) s0(k) / xScale(0)
          else (rawA(k * a + i) - xCenter(row) * s0(k)) / xScale(row)
        i += 1
      }
      k += 1
    }
    g
  }
}

/** Distributed backend over an RDD of (features, preprocessed labels).
  * All passes are single `treeAggregate`s (depth 2) with broadcast
  * coefficient state — the MLlib pattern (cf. Spark's
  * `LeastSquaresAggregator`). Designed so a 1000-executor cluster does
  * one shuffle-free map + tree reduction per solver pass.
  */
class DistributedBackend(
    rowsIn: RDD[(Vector, Array[Double])],
    val pRaw: Int,
    val m: Int,
    val fitIntercept: Boolean,
    treeDepth: Int = 2,
    knownN: Long = -1L) extends SlopeBackend {

  // Size-aware task sizing: every solver pass is ONE treeAggregate job
  // over these rows, so a small fit forced down the distributed path
  // pays the per-job floor (task launch + result collection — ~110 ms
  // on the bench box when the pass runs 32 near-empty tasks; see
  // PERF_DISTRIBUTED.md). Give each task a meaningful slab of work
  // (~1M feature cells) instead of inheriting the scan/shuffle layout,
  // floored at 8 tasks so the pass still exercises real parallelism.
  // At cluster scale the policy never binds — 100 TB of cells over 1M
  // cells/task wants far more tasks than any scan layout provides —
  // so it only ever COALESCES waste (narrow, no shuffle). Inputs with
  // no prior count (knownN < 0) keep their layout: sizing is not
  // worth an extra full pass.
  val rows: RDD[(Vector, Array[Double])] =
    if (knownN < 0) rowsIn
    else {
      val cells = knownN.toDouble * math.max(1, pRaw) * math.max(1, m)
      val target = math.max(8, math.ceil(cells / 1e6).toInt)
      if (target < rowsIn.getNumPartitions) rowsIn.coalesce(target)
      else rowsIn
    }

  rows.persist(StorageLevel.MEMORY_AND_DISK)

  // shallow trees for small fan-in: depth 2 inserts an extra stage per
  // job; with <= 64 tiny partials the driver combine is faster than a
  // scheduled intermediate stage
  private val effDepth =
    if (rows.getNumPartitions <= 64) 1 else treeDepth
  // callers that already counted (Slope.fit does, for the backend
  // decision) pass n in — saves a full scan per fit
  lazy val n: Long = if (knownN >= 0) knownN else rows.count()

  private var xCenter: Array[Double] = new Array[Double](pInt)
  private var xScale: Array[Double] = Array.fill(pInt)(1.0)
  def setStandardization(c: Array[Double], s: Array[Double]): Unit = {
    xCenter = c; xScale = s
  }

  private def sc = rows.sparkContext

  def featureMeansAndSparsity(): (Array[Double], Boolean) = {
    val p = pRaw
    val (sum, cnt, sparse) = rows.treeAggregate(
      (new Array[Double](p), 0L, false))(
      seqOp = { case ((acc, c, sp), (x, _)) =>
        // row shapes were validated at ingest (Slope.fit's row mapper)
        x.foreachActive((j, v) => acc(j) += v)
        (acc, c + 1, sp || x.isInstanceOf[SparseVector])
      },
      combOp = { case ((a1, c1, s1), (a2, c2, s2)) =>
        var j = 0; while (j < p) { a1(j) += a2(j); j += 1 }
        (a1, c1 + c2, s1 || s2)
      }, depth = effDepth)
    (sum.map(_ / cnt), sparse)
  }

  def scaleStats(center: Array[Double], scale: String): Array[Double] = {
    val p = pRaw
    val bc = sc.broadcast(center)
    scale match {
      case "none" => Array.fill(p)(1.0)
      case "l1" =>
        rows.treeAggregate(new Array[Double](p))(
          { case (acc, (x, _)) =>
            // sum |x_j - c_j|: centered l1 needs every slot when centered;
            // if centers are all zero (sparse path) nnz iteration suffices
            val c = bc.value
            if (c.forall(_ == 0.0)) x.foreachActive((j, v) => acc(j) += math.abs(v))
            else { var j = 0; while (j < p) { acc(j) += math.abs(x(j) - c(j)); j += 1 } }
            acc
          },
          { (a1, a2) => var j = 0; while (j < p) { a1(j) += a2(j); j += 1 }; a1 },
          depth = effDepth)
      case "l2" | "sd" | "max" =>
        // sufficient stats: sumsq, max (centered l2/sd derive from moments)
        val (sumsq, mx, cnt) = rows.treeAggregate(
          (new Array[Double](p), Array.fill(p)(Double.NegativeInfinity), 0L))(
          { case ((sq, mxa, c), (x, _)) =>
            val ctr = bc.value
            x.foreachActive { (j, v) => sq(j) += v * v }
            x match {
              case d: DenseVector =>
                var j = 0
                while (j < p) { if (d.values(j) > mxa(j)) mxa(j) = d.values(j); j += 1 }
              case s: SparseVector =>
                // implicit zeros participate in max
                var j = 0
                while (j < p) { if (0.0 > mxa(j)) mxa(j) = 0.0; j += 1 }
                s.foreachActive((j, v) => if (v > mxa(j)) mxa(j) = v)
            }
            (sq, mxa, c + 1)
          },
          { case ((q1, m1, c1), (q2, m2, c2)) =>
            var j = 0
            while (j < p) {
              q1(j) += q2(j); if (m2(j) > m1(j)) m1(j) = m2(j); j += 1
            }
            (q1, m1, c1 + c2)
          }, depth = effDepth)
        scale match {
          case "l2" =>
            Array.tabulate(p)(j => math.sqrt(math.max(0.0, sumsq(j) - cnt * center(j) * center(j))))
          case "sd" =>
            Array.tabulate(p)(j =>
              math.sqrt(math.max(0.0, sumsq(j) - cnt * center(j) * center(j)) / (cnt - 1.0)))
          case "max" =>
            Array.tabulate(p)(j => mx(j) - center(j))
        }
    }
  }

  def yMoments(): (Array[Double], Array[Double]) = {
    val mm = m
    val (sum, sumsq, cnt) = rows.treeAggregate(
      (new Array[Double](mm), new Array[Double](mm), 0L))(
      { case ((s, q, c), (_, y)) =>
        var k = 0; while (k < mm) { s(k) += y(k); q(k) += y(k) * y(k); k += 1 }
        (s, q, c + 1)
      },
      { case ((s1, q1, c1), (s2, q2, c2)) =>
        var k = 0; while (k < mm) { s1(k) += s2(k); q1(k) += q2(k); k += 1 }
        (s1, q1, c1 + c2)
      }, depth = effDepth)
    val mean = sum.map(_ / cnt)
    val sd = Array.tabulate(mm)(k =>
      math.sqrt(math.max(0.0, sumsq(k) / cnt - mean(k) * mean(k))))
    (mean, sd)
  }

  def evalActive(active: Array[Int], betaActive: Array[Double], family: Family,
                 needDual: Boolean, needGrad: Boolean): (Double, Double, Array[Double]) = {
    val a = active.length
    val mm = m
    val (w, b) = BackendKernels.effectiveWeights(
      active, betaActive, mm, pRaw, fitIntercept, xCenter, xScale)
    val bcW = sc.broadcast(w)
    val bcB = sc.broadcast(b)
    val fi = fitIntercept
    val bcSlot = sc.broadcast(BackendKernels.slotMap(active, pRaw, fi))

    // buffer: [primal, dual, s0(m), A(a*m)]
    val bufLen = 2 + mm + (if (needGrad) a * mm else 0)
    val result = rows.treeAggregate(new Array[Double](bufLen))(
      { (buf, row) =>
        val (x, y) = row
        val lp = new Array[Double](mm)
        BackendKernels.linPred(x, bcW.value, bcB.value, lp)
        buf(0) += family.primalRow(y, lp)
        if (needDual) buf(1) += family.dualRow(y, lp)
        if (needGrad) {
          val pg = new Array[Double](mm)
          family.pseudoGradientRow(y, lp, pg)
          var k = 0
          while (k < mm) { buf(2 + k) += pg(k); k += 1 }
          val slots = bcSlot.value
          x.foreachActive { (j, v) =>
            val slot = slots(j)
            if (slot >= 0) {
              var kk = 0
              while (kk < mm) { buf(2 + mm + kk * a + slot) += v * pg(kk); kk += 1 }
            }
          }
        }
        buf
      },
      { (b1, b2) =>
        var i = 0; while (i < bufLen) { b1(i) += b2(i); i += 1 }; b1
      }, depth = effDepth)

    bcW.destroy(); bcB.destroy(); bcSlot.destroy()

    val grad = if (needGrad) {
      val s0 = java.util.Arrays.copyOfRange(result, 2, 2 + mm)
      val rawA = java.util.Arrays.copyOfRange(result, 2 + mm, bufLen)
      BackendKernels.standardizeGrad(active, rawA, s0, mm, fi, xCenter, xScale)
    } else new Array[Double](0)
    (result(0), result(1), grad)
  }

  /** ONE treeAggregate for the speculative FISTA step: candidate primal
    * + full next-point evaluation share the row scan (the per-pass job
    * count drops from 2 to 1 — at 100 TB that halves both scheduling
    * latency AND data I/O for every non-gaussian solver pass). Each
    * accumulator slot sums exactly the per-row terms the two separate
    * jobs would; values agree with the composed form up to
    * treeAggregate's combine-order noise (sub-ULP), the same variance
    * any two runs of the separate jobs already have. */
  override def evalPairActive(active: Array[Int], candActive: Array[Double],
                              nextActive: Array[Double], family: Family)
    : (Double, Double, Double, Array[Double]) = {
    val a = active.length
    val mm = m
    val (wc, bc) = BackendKernels.effectiveWeights(
      active, candActive, mm, pRaw, fitIntercept, xCenter, xScale)
    val (wn, bn) = BackendKernels.effectiveWeights(
      active, nextActive, mm, pRaw, fitIntercept, xCenter, xScale)
    val bcWc = sc.broadcast(wc)
    val bcBc = sc.broadcast(bc)
    val bcWn = sc.broadcast(wn)
    val bcBn = sc.broadcast(bn)
    val fi = fitIntercept
    val bcSlot = sc.broadcast(BackendKernels.slotMap(active, pRaw, fi))

    // buffer: [gCand, gNext, dualNext, s0(m), A(a*m)]  (grad terms at next)
    val bufLen = 3 + mm + a * mm
    val result = rows.treeAggregate(new Array[Double](bufLen))(
      { (buf, row) =>
        val (x, y) = row
        val lp = new Array[Double](mm)
        BackendKernels.linPred(x, bcWc.value, bcBc.value, lp)
        buf(0) += family.primalRow(y, lp)
        BackendKernels.linPred(x, bcWn.value, bcBn.value, lp)
        buf(1) += family.primalRow(y, lp)
        buf(2) += family.dualRow(y, lp)
        val pg = new Array[Double](mm)
        family.pseudoGradientRow(y, lp, pg)
        var k = 0
        while (k < mm) { buf(3 + k) += pg(k); k += 1 }
        val slots = bcSlot.value
        x.foreachActive { (j, v) =>
          val slot = slots(j)
          if (slot >= 0) {
            var kk = 0
            while (kk < mm) { buf(3 + mm + kk * a + slot) += v * pg(kk); kk += 1 }
          }
        }
        buf
      },
      { (b1, b2) =>
        var i = 0; while (i < bufLen) { b1(i) += b2(i); i += 1 }; b1
      }, depth = effDepth)

    bcWc.destroy(); bcBc.destroy(); bcWn.destroy(); bcBn.destroy()
    bcSlot.destroy()

    val s0 = java.util.Arrays.copyOfRange(result, 3, 3 + mm)
    val rawA = java.util.Arrays.copyOfRange(result, 3 + mm, bufLen)
    val grad = BackendKernels.standardizeGrad(active, rawA, s0, mm, fi,
      xCenter, xScale)
    (result(0), result(1), result(2), grad)
  }

  def gramXty(active: Array[Int]): (Array[Double], Array[Double]) = {
    val a = active.length
    val mm = m
    val bcSlot = sc.broadcast(BackendKernels.slotMap(active, pRaw, fitIntercept))
    val bufLen = a * a + a + a * mm + mm
    val res = rows.treeAggregate(new Array[Double](bufLen))(
      { (buf, row) =>
        BackendKernels.gramRowUpdate(row._1, row._2, bcSlot.value, buf, a, mm,
          new Array[Int](a), new Array[Double](a))
        buf
      },
      { (b1, b2) =>
        var i = 0; while (i < bufLen) { b1(i) += b2(i); i += 1 }; b1
      }, depth = effDepth)
    bcSlot.destroy()
    BackendKernels.assembleGram(active, res, a, mm, n, fitIntercept, xCenter, xScale)
  }

  def xtv(rowV: Array[Double] => Array[Double]): Array[Double] = {
    val a = pInt
    val mm = m
    val p = pRaw
    val fi = fitIntercept
    val bufLen = a * mm + mm
    val res = rows.treeAggregate(new Array[Double](bufLen))(
      { (buf, row) =>
        val (x, y) = row
        val v = rowV(y)
        var k = 0
        while (k < mm) { buf(a * mm + k) += v(k); k += 1 }
        x.foreachActive { (j, vx) =>
          val slot = if (fi) j + 1 else j
          var kk = 0
          while (kk < mm) { buf(kk * a + slot) += vx * v(kk); kk += 1 }
        }
        buf
      },
      { (b1, b2) =>
        var i = 0; while (i < bufLen) { b1(i) += b2(i); i += 1 }; b1
      }, depth = effDepth)
    val out = new Array[Double](a * mm)
    var k = 0
    while (k < mm) {
      val vSum = res(a * mm + k)
      var r = 0
      while (r < a) {
        out(k * a + r) =
          if (fi && r == 0) vSum / xScale(0)
          else (res(k * a + r) - xCenter(r) * vSum) / xScale(r)
        r += 1
      }
      k += 1
    }
    out
  }

  def unpersist(): Unit = rows.unpersist()
}

/** Local backend over collected rows — used when n*p is driver-sized
  * (all reference-scale problems). Identical formulas, zero job overhead:
  * this is what makes the path loop (up to 100 sigma steps x thousands of
  * FISTA passes) feasible without 10^5 Spark jobs on small data, exactly
  * mirroring the reference's single-node execution.
  */
class LocalBackend(
    val xs: Array[Vector], // raw feature rows
    val ys: Array[Array[Double]],
    val pRaw: Int,
    val m: Int,
    val fitIntercept: Boolean) extends SlopeBackend {

  val n: Long = xs.length.toLong

  private var xCenter: Array[Double] = new Array[Double](pInt)
  private var xScale: Array[Double] = Array.fill(pInt)(1.0)
  def setStandardization(c: Array[Double], s: Array[Double]): Unit = {
    xCenter = c; xScale = s
  }

  def featureMeansAndSparsity(): (Array[Double], Boolean) = {
    val sum = new Array[Double](pRaw)
    var sparse = false
    var i = 0
    while (i < xs.length) {
      xs(i).foreachActive((j, v) => sum(j) += v)
      sparse ||= xs(i).isInstanceOf[SparseVector]
      i += 1
    }
    (sum.map(_ / n), sparse)
  }

  def scaleStats(center: Array[Double], scale: String): Array[Double] = {
    val p = pRaw
    scale match {
      case "none" => Array.fill(p)(1.0)
      case "l1" =>
        val acc = new Array[Double](p)
        val centered = center.exists(_ != 0.0)
        var i = 0
        while (i < xs.length) {
          if (!centered) xs(i).foreachActive((j, v) => acc(j) += math.abs(v))
          else { var j = 0; while (j < p) { acc(j) += math.abs(xs(i)(j) - center(j)); j += 1 } }
          i += 1
        }
        acc
      case "l2" | "sd" | "max" =>
        val sumsq = new Array[Double](p)
        val mx = Array.fill(p)(Double.NegativeInfinity)
        var i = 0
        while (i < xs.length) {
          xs(i) match {
            case d: DenseVector =>
              var j = 0
              while (j < p) {
                val v = d.values(j); sumsq(j) += v * v
                if (v > mx(j)) mx(j) = v
                j += 1
              }
            case s: SparseVector =>
              var j = 0
              while (j < p) { if (0.0 > mx(j)) mx(j) = 0.0; j += 1 }
              s.foreachActive { (j, v) => sumsq(j) += v * v; if (v > mx(j)) mx(j) = v }
          }
          i += 1
        }
        scale match {
          case "l2" =>
            Array.tabulate(p)(j => math.sqrt(math.max(0.0, sumsq(j) - n * center(j) * center(j))))
          case "sd" =>
            Array.tabulate(p)(j =>
              math.sqrt(math.max(0.0, sumsq(j) - n * center(j) * center(j)) / (n - 1.0)))
          case "max" =>
            Array.tabulate(p)(j => mx(j) - center(j))
        }
    }
  }

  def yMoments(): (Array[Double], Array[Double]) = {
    val sum = new Array[Double](m)
    val sumsq = new Array[Double](m)
    var i = 0
    while (i < ys.length) {
      var k = 0
      while (k < m) { sum(k) += ys(i)(k); sumsq(k) += ys(i)(k) * ys(i)(k); k += 1 }
      i += 1
    }
    val mean = sum.map(_ / n)
    val sd = Array.tabulate(m)(k => math.sqrt(math.max(0.0, sumsq(k) / n - mean(k) * mean(k))))
    (mean, sd)
  }

  /** Split [0, n) into chunks, run `body(chunkBuf, start, end)` in
    * parallel (common ForkJoin pool), merge the per-chunk buffers. */
  private def parallelChunks(bufLen: Int)(
      body: (Array[Double], Int, Int) => Unit): Array[Double] = {
    val nRows = xs.length
    // fixed chunk count (not availableProcessors): the per-chunk merge
    // order below is already deterministic, and pinning the chunk count
    // makes the FP summation order identical across hosts — required for
    // the golden-file oracle checks to hash-match
    val nChunks = if (nRows < 16384) 1 else 32
    if (nChunks == 1) {
      val buf = new Array[Double](bufLen)
      body(buf, 0, nRows)
      buf
    } else {
      val bufs = Array.fill(nChunks)(new Array[Double](bufLen))
      val chunk = (nRows + nChunks - 1) / nChunks
      java.util.stream.IntStream.range(0, nChunks).parallel().forEach { c =>
        body(bufs(c), c * chunk, math.min(nRows, (c + 1) * chunk))
      }
      val out = bufs(0)
      var c = 1
      while (c < nChunks) {
        val src = bufs(c)
        var i = 0
        while (i < bufLen) { out(i) += src(i); i += 1 }
        c += 1
      }
      out
    }
  }

  def evalActive(active: Array[Int], betaActive: Array[Double], family: Family,
                 needDual: Boolean, needGrad: Boolean): (Double, Double, Array[Double]) = {
    val a = active.length
    val (w, b) = BackendKernels.effectiveWeights(
      active, betaActive, m, pRaw, fitIntercept, xCenter, xScale)
    val slotOf = BackendKernels.slotMap(active, pRaw, fitIntercept)
    // buffer: [primal, dual, s0(m), rawA(a*m)]
    val bufLen = 2 + m + a * m
    val res = parallelChunks(bufLen) { (buf, start, end) =>
      val lp = new Array[Double](m)
      val pg = new Array[Double](m)
      var i = start
      while (i < end) {
        val x = xs(i); val y = ys(i)
        BackendKernels.linPred(x, w, b, lp)
        buf(0) += family.primalRow(y, lp)
        if (needDual) buf(1) += family.dualRow(y, lp)
        if (needGrad) {
          family.pseudoGradientRow(y, lp, pg)
          var k = 0
          while (k < m) { buf(2 + k) += pg(k); k += 1 }
          x.foreachActive { (j, v) =>
            val slot = slotOf(j)
            if (slot >= 0) {
              var kk = 0
              while (kk < m) { buf(2 + m + kk * a + slot) += v * pg(kk); kk += 1 }
            }
          }
        }
        i += 1
      }
    }
    val grad = if (needGrad) {
      val s0 = java.util.Arrays.copyOfRange(res, 2, 2 + m)
      val rawA = java.util.Arrays.copyOfRange(res, 2 + m, bufLen)
      BackendKernels.standardizeGrad(active, rawA, s0, m, fitIntercept, xCenter, xScale)
    } else new Array[Double](0)
    (res(0), res(1), grad)
  }

  def gramXty(active: Array[Int]): (Array[Double], Array[Double]) = {
    val a = active.length
    val slotOf = BackendKernels.slotMap(active, pRaw, fitIntercept)
    val buf = parallelChunks(a * a + a + a * m + m) { (chunkBuf, start, end) =>
      val tmpSlot = new Array[Int](a)
      val tmpVal = new Array[Double](a)
      var i = start
      while (i < end) {
        BackendKernels.gramRowUpdate(xs(i), ys(i), slotOf, chunkBuf, a, m,
          tmpSlot, tmpVal)
        i += 1
      }
    }
    BackendKernels.assembleGram(active, buf, a, m, n, fitIntercept, xCenter, xScale)
  }

  /** Rows are driver-resident: materialize the standardized active
    * matrix directly (standardization folded in, same formulas as the
    * row kernels). */
  override def activeMatrixXty(active: Array[Int])
    : Option[(Array[Double], Array[Double])] = {
    val a = active.length
    val nR = xs.length
    val xmat = new Array[Double](nR * a)
    val xty = new Array[Double](a)
    val off = if (fitIntercept) 1 else 0
    var i = 0
    while (i < nR) {
      val x = xs(i)
      val y = ys(i)(0)
      var s = 0
      while (s < a) {
        val row = active(s)
        val v =
          if (fitIntercept && row == 0) 1.0 / xScale(0)
          else (x(row - off) - xCenter(row)) / xScale(row)
        xmat(i * a + s) = v
        xty(s) += v * y
        s += 1
      }
      i += 1
    }
    Some((xmat, xty))
  }

  def xtv(rowV: Array[Double] => Array[Double]): Array[Double] = {
    val a = pInt
    val fi = fitIntercept
    val acc = new Array[Double](a * m)
    val vSum = new Array[Double](m)
    var i = 0
    while (i < xs.length) {
      val v = rowV(ys(i))
      var k = 0
      while (k < m) { vSum(k) += v(k); k += 1 }
      xs(i).foreachActive { (j, vx) =>
        val slot = if (fi) j + 1 else j
        var kk = 0
        while (kk < m) { acc(kk * a + slot) += vx * v(kk); kk += 1 }
      }
      i += 1
    }
    val out = new Array[Double](a * m)
    var k = 0
    while (k < m) {
      var r = 0
      while (r < a) {
        out(k * a + r) =
          if (fi && r == 0) vSum(k) / xScale(0)
          else (acc(k * a + r) - xCenter(r) * vSum(k)) / xScale(r)
        r += 1
      }
      k += 1
    }
    out
  }
}
