package graft.slope

import org.scalatest.funsuite.AnyFunSuite

/** SVG plot renderers (reference plot.Owl / plotDiagnostics /
  * plot.TrainedOwl surfaces): structural validity + series counts. */
class PlotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fitSmall(diagnostics: Boolean = false) = {
    val gen = new SlopeFitSpec().randomProblem(31, 120, 6)
    Slope.fitLocal(gen._1, gen._2,
      SlopeParams(family = "gaussian", nSigma = 8, diagnostics = diagnostics))
  }

  private def assertWellFormed(svg: String): Unit = {
    assert(svg.startsWith("<svg ") || svg.startsWith("<svg\n"))
    assert(svg.endsWith("</svg>"))
    assert(!svg.contains("NaN") && !svg.contains("Infinity"), "non-finite coords")
    // every opened polyline closes
    assert(svg.sliding(9).count(_ == "<polyline") ==
      svg.sliding(11).count(_ == "</polyline>"))
  }

  test("pathSvg: one polyline per ever-nonzero feature, zero refline") {
    val m = fitSmall()
    val nz = (0 until m.p).count(j =>
      (0 until m.nSteps).exists(s => m.coefs(s)(j) != 0.0))
    assert(nz > 0, "fixture must select features")
    val svg = SlopePlots.pathSvg(m)
    assertWellFormed(svg)
    assert(svg.sliding(9).count(_ == "<polyline") == nz)
    assert(svg.contains("stroke-dasharray"), "zero refline present")
    // intercept=true adds exactly one series
    val svgI = SlopePlots.pathSvg(m, intercept = true)
    assert(svgI.sliding(9).count(_ == "<polyline") == nz + 1)
  }

  test("diagnosticsSvg: primal + dual series; requires diagnostics") {
    val m = fitSmall(diagnostics = true)
    val svg = SlopePlots.diagnosticsSvg(m)
    assertWellFormed(svg)
    assert(svg.contains(">primal<") && svg.contains(">dual<"))
    val bare = fitSmall()
    val e = intercept[IllegalArgumentException] {
      SlopePlots.diagnosticsSvg(bare)
    }
    assert(e.getMessage.contains("diagnostics"))
    // time axis variant renders too
    assertWellFormed(SlopePlots.diagnosticsSvg(m, xvar = "time"))
  }

  test("cvSvg: one line per q with CI whiskers") {
    val gen = RandomProblem.generate(spark, 200, 4, family = "gaussian",
      seed = 5)
    val cv = SlopeCv.trainSlope(gen.df, "features", "label",
      SlopeParams(family = "gaussian", nSigma = 5), qs = Seq(0.1, 0.2),
      number = 3, measures = Seq("mse"))
    val svg = SlopePlots.cvSvg(cv, "mse")
    assertWellFormed(svg)
    assert(svg.sliding(9).count(_ == "<polyline") == 2) // one per q
    assert(svg.contains("q=0.1") && svg.contains("q=0.2"))
    val e = intercept[IllegalArgumentException] {
      SlopePlots.cvSvg(cv, "auc")
    }
    assert(e.getMessage.contains("no CV cells"))
  }
}
