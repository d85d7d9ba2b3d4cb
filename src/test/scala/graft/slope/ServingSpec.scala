package graft.slope

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    // saveAsTable (bucketed-layout tests) must never write into the
    // repo working tree — the default warehouse is ./spark-warehouse
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()
}

/** Serving + scoring + CV over DataFrames (reference predict/score/
  * trainOwl semantics: R/predict.R, R/score.R, R/trainOwl.R). */
class ServingSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  def fixture(seed: Int, n: Int, p: Int, family: String) = {
    val gen = new SlopeFitSpec
    gen.randomProblem(seed, n, p, family = family)
  }

  test("gaussian predictions: linpred matches driver-side dot product") {
    val (xs, ys) = fixture(1, 100, 4, "gaussian")
    val model = Slope.fitLocal(xs, ys, SlopeParams(nSigma = 8))
    import spark.implicits._
    val df = xs.zip(ys).map { case (x, y) =>
      (x.toArray, y.asInstanceOf[Double])
    }.toSeq.toDF("features", "label")
    val pred = SlopeServe.predictions(model, df, "features")
      .select("linpred").collect()
    for (i <- 0 until 20) {
      val row = pred(i).getSeq[scala.collection.Seq[Double]](0)
      for (s <- 0 until model.nSteps) {
        val expect = model.linearPredictor(xs(i), s)(0)
        assert(math.abs(row(s).head - expect) < 1e-10, s"row $i step $s")
      }
    }
  }

  test("binomial response/class semantics (predict.R:91-121)") {
    val (xs, ys) = fixture(2, 200, 3, "binomial")
    val model = Slope.fitLocal(xs, ys, SlopeParams(family = "binomial", nSigma = 6))
    import spark.implicits._
    val df = xs.zip(ys).map { case (x, y) => (x.toArray, y.toString) }
      .toSeq.toDF("features", "label")
    val out = SlopeServe.predictions(model, df, "features",
      Seq("response", "class")).select("linpred", "response", "predicted_class")
      .collect()
    out.take(50).foreach { r =>
      val lps = r.getSeq[scala.collection.Seq[Double]](0)
      val resp = r.getSeq[scala.collection.Seq[Double]](1)
      val cls = r.getSeq[String](2)
      for (s <- lps.indices) {
        val sigmoid = 1.0 / (1.0 + math.exp(-lps(s).head))
        assert(math.abs(resp(s).head - sigmoid) < 1e-12)
        val expectClass =
          if (lps(s).head > 0) model.classNames(1) else model.classNames(0)
        assert(cls(s) == expectClass)
      }
    }
  }

  test("multinomial response sums to one; class is argmax") {
    val (xs, ys) = fixture(3, 200, 3, "multinomial")
    val model = Slope.fitLocal(xs, ys,
      SlopeParams(family = "multinomial", nSigma = 5))
    import spark.implicits._
    val df = xs.zip(ys).map { case (x, y) => (x.toArray, y.toString) }
      .toSeq.toDF("features", "label")
    val out = SlopeServe.predictions(model, df, "features",
      Seq("response", "class")).select("response", "predicted_class").collect()
    out.take(30).foreach { r =>
      val resp = r.getSeq[scala.collection.Seq[Double]](0)
      val cls = r.getSeq[String](1)
      for (s <- resp.indices) {
        assert(math.abs(resp(s).sum - 1.0) < 1e-9)
        val am = resp(s).indexOf(resp(s).max)
        assert(cls(s) == model.classNames(am))
      }
    }
  }

  test("coefAt: exact on path, interpolated between, clamped outside") {
    val (xs, ys) = fixture(4, 150, 4, "gaussian")
    val model = Slope.fitLocal(xs, ys, SlopeParams(nSigma = 10))
    assert(model.nSteps >= 3)
    val (i1, c1) = SlopeServe.coefAt(model, model.sigma(1))
    assert(c1.sameElements(model.coefs(1)) && i1.sameElements(model.intercepts(1)))
    // midpoint: between neighbors elementwise
    val mid = (model.sigma(1) + model.sigma(2)) / 2
    val (_, cm) = SlopeServe.coefAt(model, mid)
    for (j <- cm.indices) {
      val lo = math.min(model.coefs(1)(j), model.coefs(2)(j))
      val hi = math.max(model.coefs(1)(j), model.coefs(2)(j))
      assert(cm(j) >= lo - 1e-12 && cm(j) <= hi + 1e-12, s"coef $j out of bracket")
    }
    // clamping
    val (_, cBig) = SlopeServe.coefAt(model, model.sigma.head * 10)
    assert(cBig.sameElements(model.coefs.head))
    val (_, cSmall) = SlopeServe.coefAt(model, model.sigma.last / 10)
    assert(cSmall.sameElements(model.coefs.last))
  }

  test("coefExact: refit matches path on-path, beats interpolation off-path") {
    val (xs, ys) = fixture(14, 150, 4, "gaussian")
    val model = Slope.fitLocal(xs, ys, SlopeParams(nSigma = 10))
    assert(model.nSteps >= 4)
    import spark.implicits._
    val df = xs.zip(ys).map { case (x, y) => (x.toArray, y.asInstanceOf[Double]) }
      .toSeq.toDF("features", "label")

    // on-path sigma: exact refit reproduces the path solution
    val onPath = model.sigma(2)
    val Array((icOn, cfOn)) = SlopeServe.coefExact(df, "features", "label",
      SlopeParams(), Array(onPath))
    for (j <- cfOn.indices)
      assert(math.abs(cfOn(j) - model.coefs(2)(j)) < 1e-4,
        s"on-path coef $j: ${cfOn(j)} vs ${model.coefs(2)(j)}")

    // off-path midpoint: exact equals a direct single-sigma fit
    // (test-coef.R exact branch), and differs from the interpolation
    // where the path bends
    val mid = (model.sigma(2) + model.sigma(3)) / 2
    val Array((_, cfExact)) = SlopeServe.coefExact(df, "features", "label",
      SlopeParams(), Array(mid))
    val direct = Slope.fitLocal(xs, ys, SlopeParams(sigma = Some(Array(mid))))
    for (j <- cfExact.indices)
      assert(math.abs(cfExact(j) - direct.coefs(0)(j)) < 1e-6,
        s"exact-vs-direct coef $j")
    val (_, cfInterp) = SlopeServe.coefAt(model, mid)
    val maxGap = cfExact.indices.map(j => math.abs(cfExact(j) - cfInterp(j))).max
    // interpolation is an approximation: close, but not the solver answer
    assert(maxGap < 1.0, "interpolation should be in the right ballpark")
    // caller order is preserved for multiple sigmas
    val two = SlopeServe.coefExact(df, "features", "label",
      SlopeParams(), Array(mid, onPath))
    assert(two(1)._2.zip(cfOn).forall { case (a, b) => math.abs(a - b) < 1e-6 })
  }

  test("weightedAuc: weights=1 equals unweighted midrank; ties get half credit") {
    import spark.implicits._
    // hand-computed: pos scores {3, 2}, neg scores {2, 1}
    //   pairs: (3>2)=1, (3>1)=1, (2=2)=.5, (2>1)=1  => auc = 3.5/4
    val tied = Seq((1.0, 3.0, 1.0), (1.0, 2.0, 1.0), (0.0, 2.0, 1.0),
      (0.0, 1.0, 1.0)).toDF("y", "s", "w")
    val a = SlopeScore.weightedAuc(tied, "y", "s", "w").head().getDouble(0)
    assert(math.abs(a - 3.5 / 4.0) < 1e-12, s"tied auc $a")
    // doubling one weight doubles that row's pair contributions:
    //   w(pos,3)=2: pairs (3>2)*2, (3>1)*2, (2=2)*.5, (2>1)*1 / (3*2)
    val w2 = Seq((1.0, 3.0, 2.0), (1.0, 2.0, 1.0), (0.0, 2.0, 1.0),
      (0.0, 1.0, 1.0)).toDF("y", "s", "w")
    val aw = SlopeScore.weightedAuc(w2, "y", "s", "w").head().getDouble(0)
    assert(math.abs(aw - 5.5 / 6.0) < 1e-12, s"weighted auc $aw")
    // weights=1 reduces to the unweighted midrank AUC on a real fit
    val (xs, ys) = fixture(15, 300, 3, "binomial")
    val model = Slope.fitLocal(xs, ys, SlopeParams(family = "binomial", nSigma = 4))
    val df = xs.zip(ys).map { case (x, y) => (x.toArray, y.toString) }
      .toSeq.toDF("features", "label")
    val unweighted = SlopeScore.score(model, df, "features", "label", "auc")
    val lastStep = model.nSteps - 1
    val probs = SlopeServe.predictions(model, df, "features", Seq("response"))
      .select(org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.col("response"), lastStep + 1), 1).as("p"),
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("label") === model.classNames(1), 1.0)
          .otherwise(0.0).as("y"),
        org.apache.spark.sql.functions.lit(1.0).as("w"))
    val aOne = SlopeScore.weightedAuc(probs, "y", "p", "w").head().getDouble(0)
    assert(math.abs(aOne - unweighted(lastStep)) < 1e-10,
      s"weights=1: $aOne vs ${unweighted(lastStep)}")
  }

  test("score: gaussian mse matches manual computation") {
    val (xs, ys) = fixture(5, 120, 3, "gaussian")
    val model = Slope.fitLocal(xs, ys, SlopeParams(nSigma = 6))
    import spark.implicits._
    val df = xs.zip(ys).map { case (x, y) => (x.toArray, y.asInstanceOf[Double]) }
      .toSeq.toDF("features", "label")
    val mse = SlopeScore.score(model, df, "features", "label", "mse")
    assert(mse.length == model.nSteps)
    for (s <- 0 until model.nSteps) {
      val manual = xs.indices.map { i =>
        val e = model.linearPredictor(xs(i), s)(0) - ys(i).asInstanceOf[Double]
        e * e
      }.sum / xs.length
      assert(math.abs(mse(s) - manual) < 1e-9, s"step $s: ${mse(s)} vs $manual")
    }
    assert(mse.last < mse.head, "mse should improve along the path")
  }

  test("score: binomial auc in [0.5, 1] and improves; invalid measure rejected") {
    val (xs, ys) = fixture(6, 300, 3, "binomial")
    val model = Slope.fitLocal(xs, ys, SlopeParams(family = "binomial", nSigma = 8))
    import spark.implicits._
    val df = xs.zip(ys).map { case (x, y) => (x.toArray, y.toString) }
      .toSeq.toDF("features", "label")
    val auc = SlopeScore.score(model, df, "features", "label", "auc")
    assert(auc.forall(a => a >= 0.0 && a <= 1.0))
    assert(auc.last > 0.7, s"final auc ${auc.last} too low for planted signal")
    val mis = SlopeScore.score(model, df, "features", "label", "misclass")
    assert(mis.forall(v => v >= 0 && v <= 1))
    intercept[IllegalArgumentException] {
      SlopeScore.score(model, df, "features", "label", "auc_bogus")
    }
    // auc invalid for gaussian
    val gm = Slope.fitLocal(xs, ys.map(_ => 1.0: Any), SlopeParams(nSigma = 2))
    intercept[IllegalArgumentException] {
      SlopeScore.score(gm, df, "features", "label", "auc")
    }
  }

  test("cross-validation: summary shape, optima minimality (trainOwl.R)") {
    val (xs, ys) = fixture(7, 200, 4, "gaussian")
    import spark.implicits._
    val df = xs.zip(ys).map { case (x, y) => (x.toArray, y.asInstanceOf[Double]) }
      .toSeq.toDF("features", "label")
    val cv = SlopeCv.trainSlope(df, "features", "label",
      SlopeParams(nSigma = 8), qs = Seq(0.2), number = 4, repeats = 1,
      measures = Seq("mse", "mae"), parallelism = 2)
    val nSteps = cv.model.nSteps
    assert(cv.summary.size == 2 * nSteps)
    assert(cv.summary.forall(c => c.se >= 0 && c.lo <= c.mean && c.mean <= c.hi))
    for (m <- Seq("mse", "mae")) {
      val cells = cv.summary.filter(_.measure == m)
      val opt = cv.optima.find(_.measure == m).get
      assert(opt.mean == cells.map(_.mean).min)
    }
  }

  test("calibration: bin math, perfect-calibration zero ECE, hand-computed gaps") {
    import spark.implicits._
    // perfectly calibrated by construction: in the 0.25 bucket (bin 2),
    // exactly 1 of 4 rows is positive, etc.
    val perfect = Seq.fill(4)(0.25).zipWithIndex.map { case (s, i) =>
      (s, if (i == 0) 1 else 0)
    } ++ Seq.fill(4)(0.75).zipWithIndex.map { case (s, i) =>
      (s, if (i < 3) 1 else 0)
    }
    val p = graft.slope.SlopeScore.calibration(
      perfect.toDF("score", "label"), "score", "label", bins = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(p.keySet == Set(1L, 3L))
    assert(p(1L) == ((4L, 0.25, 0.0, 0.0)), "bin 1: frac_pos 1/4, gap 0")
    assert(p(3L) == ((4L, 0.75, 0.0, 0.0)))
    // skewed: scores say 0.9 but only half are positive; score 1.0
    // clamps into the LAST bin; nulls drop
    val skew = Seq((0.9, 1), (0.9, 0), (1.0, 1), (1.0, 1))
      .toDF("score", "label")
      .union(Seq((null.asInstanceOf[java.lang.Double], 1))
        .toDF("score", "label"))
    val sRows = graft.slope.SlopeScore.calibration(
      skew, "score", "label", bins = 10).collect()
    assert(sRows.map(_.getLong(1)).sum == 4, "null score dropped")
    val bin9 = sRows.find(_.getLong(0) == 9L).get
    assert(bin9.getLong(1) == 4, "score 1.0 clamps into bin 9")
    assert(math.abs(bin9.getDouble(2) - 0.95) < 1e-12) // mean score
    assert(math.abs(bin9.getDouble(3) - 0.75) < 1e-12) // frac pos
    assert(math.abs(bin9.getDouble(4) - 0.2) < 1e-12)  // gap
    assert(math.abs(bin9.getDouble(5) - 0.2) < 1e-12,
      "single-bin ECE equals its gap")
  }
}
