package graft.slope

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.scalatest.funsuite.AnyFunSuite

/** Multi-task gaussian (matrix response, m > 1) — an EXTENSION beyond
  * the reference, which rejects matrix gaussian responses
  * (`R/preProcessResponse.R:7-8`: "response for Gaussian regression
  * must be one-dimensional"). Because there is no reference behavior to
  * differ against, the anchors here are engine-independent: with a
  * CONSTANT lambda sequence the joint p*m sorted-L1 penalty separates
  * per target, so the multi-task fit must equal the per-target
  * single-task fits stacked; plus a joint duality-gap certificate.
  */
class MultiTaskSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def problem(seed: Int, n: Int, p: Int)
    : (Array[Vector], Array[Array[Double]]) = {
    val rng = new scala.util.Random(seed)
    val xs = Array.fill(n)(Vectors.dense(Array.fill(p)(rng.nextGaussian())))
    // two planted signals with different supports per target
    val ys = xs.map { x =>
      Array(2.0 * x(0) - 1.5 * x(2) + 0.3 * rng.nextGaussian() + 1.0,
        -3.0 * x(1) + 0.5 * x(p - 1) + 0.3 * rng.nextGaussian() - 2.0)
    }
    (xs, ys)
  }

  def maxAbsDiff(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  test("constant-lambda multi-task == stacked single-task fits") {
    val p = 6
    val (xs, ys) = problem(101, 250, p)
    val lamConst = 0.3
    val common = SlopeParams(family = "gaussian", lambdaType = "user",
      sigma = Some(Array(1.0)), screening = false,
      tolRelGap = 1e-9, tolInfeas = 1e-6)
    val multi = Slope.fitLocal(xs, ys.map(a => a: Any),
      common.copy(userLambda = Some(Array.fill(p * 2)(lamConst))))
    assert(multi.m == 2 && multi.p == p)
    for (k <- 0 to 1) {
      val single = Slope.fitLocal(xs, ys.map(a => a(k): Any),
        common.copy(userLambda = Some(Array.fill(p)(lamConst))))
      val multiCol = Array.tabulate(p)(j => multi.coefs(0)(k * p + j))
      assert(maxAbsDiff(multiCol, single.coefs(0)) < 1e-4,
        s"target $k: ${multiCol.toList} vs ${single.coefs(0).toList}")
      assert(math.abs(multi.intercepts(0)(k) - single.intercepts(0)(0)) < 1e-4,
        s"target $k intercept")
    }
  }

  test("multi-task joint objective: independent duality-gap certificate") {
    // With a strictly DECREASING lambda the sorted-L1 penalty couples all
    // p*m coefficients: the joint problem is
    //   min_B 0.5*sum_k ||y_k - X b_k||^2 + sum_i lam_i |B|_(i)
    // over the flattened p*m vector. Certify the returned B is optimal
    // for THAT objective via the SLOPE dual (Bogdan et al. 2015, eq. 2.5
    // form): theta = residual scaled into the dual-feasible polytope
    // {v : cumsum(sort|X'v|) <= cumsum(lam)}, gap = P(B) - D(theta).
    // All certificate math is written here from the paper, independent of
    // the engine's kernels; a per-target (separable) fit would leave a
    // macroscopic gap.
    val p = 6; val n = 200
    val (xs, ys) = problem(7, n, p)
    val mT = 2
    // strictly decreasing user lambda over the flattened p*m entries
    val lamUser = Array.tabulate(p * mT)(i => 1.0 - i.toDouble / (p * mT) * 0.9)
    val fit = Slope.fitLocal(xs, ys.map(a => a: Any),
      SlopeParams(family = "gaussian", fitIntercept = false,
        center = Some(false), scale = "none", lambdaType = "user",
        userLambda = Some(lamUser), sigma = Some(Array(0.2)),
        screening = false, tolRelGap = 1e-10, tolInfeas = 1e-8))
    assert(fit.m == mT)
    val beta = fit.coefs(0) // p x m column-major, internal == original units
    // internal user lambda is scaled by n, then by sigma
    val lam = lamUser.map(_ * n * 0.2)
    // centered responses (gaussian encoder always centers per target)
    val yMean = Array.tabulate(mT)(k => ys.map(_(k)).sum / n)
    val yc = Array.tabulate(mT, n)((k, i) => ys(i)(k) - yMean(k))
    // residuals r_k = y_k - X b_k and gradient g = -X'r (flattened)
    val resid = Array.tabulate(mT, n) { (k, i) =>
      var lp = 0.0
      xs(i).foreachActive((j, v) => lp += beta(k * p + j) * v)
      yc(k)(i) - lp
    }
    val xtR = Array.tabulate(mT, p) { (k, j) =>
      var s = 0.0
      var i = 0
      while (i < n) { s += xs(i)(j) * resid(k)(i); i += 1 }
      s
    }
    // primal P = 0.5 sum ||r||^2 + sorted-L1
    var primal = 0.0
    for (k <- 0 until mT; i <- 0 until n) primal += 0.5 * resid(k)(i) * resid(k)(i)
    val absB = beta.map(math.abs).sortBy(-(_: Double))
    for (i <- absB.indices) primal += lam(i) * absB(i)
    // dual-feasibility scale: alpha = max_i cumsum(sort|X'r|)_i / cumsum(lam)_i
    val absG = (0 until mT).flatMap(k => xtR(k)).map(math.abs).toArray
      .sortBy(-(_: Double))
    var cg = 0.0; var cl = 0.0; var alpha = 0.0
    for (i <- absG.indices) {
      cg += absG(i); cl += lam(i)
      alpha = math.max(alpha, cg / cl)
    }
    val scaleT = 1.0 / math.max(1.0, alpha)
    // D(theta) = 0.5||y||^2 - 0.5||y - theta||^2, theta = scaleT * r
    var dual = 0.0
    for (k <- 0 until mT; i <- 0 until n) {
      val y = yc(k)(i); val th = scaleT * resid(k)(i)
      dual += 0.5 * y * y - 0.5 * (y - th) * (y - th)
    }
    val gap = primal - dual
    assert(gap >= -1e-8, s"negative gap $gap — certificate math broken")
    assert(gap / math.max(1e-12, primal) < 1e-6,
      s"relative duality gap ${gap / primal} too large: joint optimum not reached")
    // and the joint solution must differ from per-target fits sharing the
    // top-p lambda slice (separability would make them equal)
    val perTarget = (0 until mT).map(k => Slope.fitLocal(xs, ys.map(a => a(k): Any),
      SlopeParams(family = "gaussian", fitIntercept = false,
        center = Some(false), scale = "none", lambdaType = "user",
        userLambda = Some(lamUser.take(p)), sigma = Some(Array(0.2)),
        screening = false, tolRelGap = 1e-10, tolInfeas = 1e-8)))
    val stacked = Array.tabulate(p * mT)(i => perTarget(i / p).coefs(0)(i % p))
    assert(maxAbsDiff(beta, stacked) > 1e-4,
      "joint fit identical to independent per-target fits — penalty not coupling")
  }

  test("multi-task sparse == dense (m = 2)") {
    val rng = new scala.util.Random(55)
    val n = 120; val p = 5
    val dense = Array.fill(n)(Vectors.dense(
      Array.fill(p)(if (rng.nextDouble() < 0.5) rng.nextGaussian() else 0.0)))
    val sparse = dense.map(v => v.toSparse: Vector)
    val ys = dense.map(v =>
      Array(v(0) * 2 + 0.1 * rng.nextGaussian(),
        -v(2) + 0.1 * rng.nextGaussian()))
    val pd = SlopeParams(family = "gaussian", center = Some(false), nSigma = 10)
    val fd = Slope.fitLocal(dense, ys.map(a => a: Any), pd)
    val fs = Slope.fitLocal(sparse, ys.map(a => a: Any), pd)
    assert(fd.m == 2 && fd.nSteps == fs.nSteps)
    for (s <- 0 until fd.nSteps)
      assert(maxAbsDiff(fd.coefs(s), fs.coefs(s)) < 1e-4, s"step $s")
  }

  test("multi-task distributed == local (m = 2)") {
    import scala.jdk.CollectionConverters._
    val (xs, ys) = problem(31, 300, 4)
    val rows = xs.indices.map { i =>
      org.apache.spark.sql.Row(xs(i).toArray.toSeq, ys(i).toSeq)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("features",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    val df = spark.createDataFrame(rows.asJava, schema)
    val local = Slope.fit(df, "features", "label",
      SlopeParams(family = "gaussian", nSigma = 10))
    val dist = Slope.fit(df, "features", "label",
      SlopeParams(family = "gaussian", nSigma = 10, localCellLimit = 0))
    assert(local.m == 2 && dist.m == 2)
    assert(local.nSteps == dist.nSteps)
    for (s <- 0 until local.nSteps) {
      assert(maxAbsDiff(local.coefs(s), dist.coefs(s)) < 1e-4, s"coefs step $s")
      assert(maxAbsDiff(local.intercepts(s), dist.intercepts(s)) < 1e-4,
        s"intercepts step $s")
    }

    // serving: response for m > 1 is the full length-m linear predictor,
    // and mse decreases from the null step along the path
    val served = SlopeServe.predictions(local, df, "features", Seq("response"))
    val r0 = served.select("response").head()
      .getSeq[scala.collection.Seq[Double]](0)
    assert(r0.head.length == 2, "response rows must carry m=2 entries")
    val mse = SlopeScore.score(local, df, "features", "label", "mse")
    assert(mse.head > mse.last, s"mse path should improve: ${mse.toList}")
  }

  test("multi-task cross-validation runs end-to-end (m = 2)") {
    import scala.jdk.CollectionConverters._
    val (xs, ys) = problem(13, 240, 4)
    val rows = xs.indices.map { i =>
      org.apache.spark.sql.Row(xs(i).toArray.toSeq, ys(i).toSeq)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("features",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    val df = spark.createDataFrame(rows.asJava, schema)
    val cv = SlopeCv.trainSlope(df, "features", "label",
      SlopeParams(family = "gaussian", nSigma = 6),
      qs = Seq(0.2), number = 3, repeats = 1, measures = Seq("mse"))
    assert(cv.summary.nonEmpty && cv.optima.nonEmpty)
    // CV mse means must be finite and the optimum <= the null-step mean
    assert(cv.summary.forall(c => !c.mean.isNaN && !c.mean.isInfinite))
    val nullStep = cv.summary.maxBy(_.sigma)
    assert(cv.optima.head.mean <= nullStep.mean + 1e-9,
      s"optimum ${cv.optima.head.mean} worse than null ${nullStep.mean}")
  }

  test("ml Estimator: array prediction column and persistence at m = 2") {
    import scala.jdk.CollectionConverters._
    val (xs, ys) = problem(3, 200, 4)
    val rows = xs.indices.map { i =>
      org.apache.spark.sql.Row(xs(i).toArray.toSeq, ys(i).toSeq)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("features",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    val df = spark.createDataFrame(rows.asJava, schema)
    val model = new SlopeRegression().setFamily("gaussian").setNSigma(8).fit(df)
    assert(model.slopeModel.m == 2)
    val out = model.transform(df)
    // m > 1 emits `predictions` (array<double>), never a non-double
    // `prediction` column (MlApi class doc)
    assert(!out.columns.contains("prediction"),
      "multi-task must not emit a non-double 'prediction' column")
    val pred = out.select("predictions").head()
      .getSeq[Double](0)
    assert(pred.length == 2, s"predictions must be length-2, got $pred")
    // save/load preserves the multi-target cube
    val dir = java.nio.file.Files.createTempDirectory("slope_mt").toString
    SlopeModelIO.save(model.slopeModel, spark, dir)
    val loaded = SlopeModelIO.load(spark, dir)
    assert(loaded.m == 2 && loaded.p == 4)
    for (s <- 0 until model.slopeModel.nSteps)
      assert(loaded.coefs(s).sameElements(model.slopeModel.coefs(s)))
  }

  test("length-1 array<double> labels fit like scalar labels (m = 1)") {
    val (xs, ys) = problem(7, 80, 4)
    val y1 = ys.map(_(0))
    val p = SlopeParams(family = "gaussian", nSigma = 5)
    val scalar = Slope.fitLocal(xs, y1.map(v => v: Any), p)
    val wrapped = Slope.fitLocal(xs, y1.map(v => Array(v): Any), p)
    assert(wrapped.m == 1)
    assert(wrapped.nSteps == scalar.nSteps)
    for (s <- 0 until scalar.nSteps) {
      assert(maxAbsDiff(wrapped.coefs(s), scalar.coefs(s)) < 1e-10)
      assert(maxAbsDiff(wrapped.intercepts(s), scalar.intercepts(s)) < 1e-10)
    }
  }

  test("array labels rejected for non-gaussian families") {
    val (xs, ys) = problem(1, 30, 3)
    val e = intercept[IllegalArgumentException] {
      Slope.fitLocal(xs, ys.map(a => a: Any), SlopeParams(family = "binomial"))
    }
    assert(e.getMessage.contains("gaussian"), e.getMessage)
  }

  test("ragged label rows fail fast") {
    val xs: Array[Vector] =
      Array(Vectors.dense(1.0, 2.0), Vectors.dense(0.5, 1.5))
    val ys: Array[Any] = Array(Array(1.0, 2.0), Array(1.0))
    val e = intercept[IllegalArgumentException] {
      Slope.fitLocal(xs, ys, SlopeParams(family = "gaussian"))
    }
    assert(e.getMessage.contains("targets"), e.getMessage)
  }
}
