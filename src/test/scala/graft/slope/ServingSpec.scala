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
}
