package graft.slope

import java.util.Locale

/** Dependency-free SVG renderers for the reference's plot surfaces —
  * `plot.Owl` (coefficient paths vs σ, one line per ever-nonzero
  * feature, one panel per target for m > 1, zero refline;
  * `/root/reference/R/plot.R:19-109`), `plotDiagnostics` (primal/dual
  * objective vs iteration or time for one path step;
  * `R/plotDiagnostics.R:22-73`) and `plot.TrainedOwl` (CV mean ± CI
  * vs σ per measure). Pure deterministic string building on
  * driver-sized state (p·m coefficients) — no plotting library, no
  * cluster work; the DataFrame "tidy frame" surfaces these plots
  * consume remain available for external tooling.
  */
object SlopePlots {

  private val Palette = Seq(
    "#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#3ca951",
    "#ff8ab7", "#a463f2", "#97bbf5", "#9c6b4e", "#9498a0")

  private def f(v: Double): String = "%.4f".formatLocal(Locale.ROOT, v)

  /** Map data points to an SVG polyline "x1,y1 x2,y2 ..." string. */
  private def polyline(xs: Seq[Double], ys: Seq[Double],
                       xMin: Double, xMax: Double, yMin: Double, yMax: Double,
                       x0: Double, y0: Double, w: Double, h: Double): String = {
    def sx(x: Double) =
      if (xMax == xMin) x0 + w / 2 else x0 + (x - xMin) / (xMax - xMin) * w
    def sy(y: Double) =
      if (yMax == yMin) y0 + h / 2 else y0 + h - (y - yMin) / (yMax - yMin) * h
    xs.zip(ys).map { case (x, y) => s"${f(sx(x))},${f(sy(y))}" }.mkString(" ")
  }

  private def svgOpen(w: Int, h: Int, title: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h" font-family="sans-serif" font-size="10">
       |<title>$title</title>
       |<rect width="$w" height="$h" fill="white"/>""".stripMargin

  /** Coefficient paths vs σ (`plot.Owl`): one polyline per feature that
    * is nonzero anywhere on the path, one panel per target. σ descends
    * left→right like the reference's path ordering. */
  def pathSvg(model: SlopeModel, intercept: Boolean = false,
              width: Int = 640, height: Int = 360): String = {
    require(model.nSteps > 0, "nothing to plot since model is yet to be fit")
    val p = model.p
    val m = model.m
    // ever-nonzero features (reference's `nz` selection)
    val nz = (0 until p).filter(j =>
      (0 until model.nSteps).exists(s =>
        (0 until m).exists(k => model.coefs(s)(k * p + j) != 0.0)))
    val margin = 34.0
    val panelW = (width - margin * 2 - (m - 1) * 12.0) / m
    val panelH = height - margin * 2
    val xs = model.sigma.toSeq
    val xMin = xs.min; val xMax = xs.max
    val sb = new StringBuilder(svgOpen(width, height,
      s"SLOPE coefficient paths (${model.family})"))
    for (k <- 0 until m) {
      val x0 = margin + k * (panelW + 12.0)
      val featSeries: Seq[(Int, Seq[Double])] = nz.map { j =>
        (j, (0 until model.nSteps).map(s => model.coefs(s)(k * p + j)))
      }
      val icSeries: Seq[(Int, Seq[Double])] =
        if (intercept && model.fitIntercept)
          Seq((-1, (0 until model.nSteps).map(s => model.intercepts(s)(k))))
        else Nil
      val series = featSeries ++ icSeries
      val allY = series.flatMap(_._2) :+ 0.0
      val yMin = allY.min; val yMax = allY.max
      // panel frame + zero refline (reference's abline h = 0)
      sb.append(s"""\n<rect x="${f(x0)}" y="${f(margin)}" width="${f(panelW)}" height="${f(panelH)}" fill="none" stroke="#888"/>""")
      val zy = if (yMax == yMin) margin + panelH / 2
        else margin + panelH - (0.0 - yMin) / (yMax - yMin) * panelH
      sb.append(s"""\n<line x1="${f(x0)}" y1="${f(zy)}" x2="${f(x0 + panelW)}" y2="${f(zy)}" stroke="#bbb" stroke-dasharray="3,3"/>""")
      series.zipWithIndex.foreach { case ((j, ys), i) =>
        val color = Palette(i % Palette.length)
        // σ descends left→right: plot against -σ
        val pts = polyline(xs.map(-_), ys, -xMax, -xMin, yMin, yMax,
          x0, margin, panelW, panelH)
        val name = if (j < 0) "(Intercept)" else s"f$j"
        sb.append(s"""\n<polyline points="$pts" fill="none" stroke="$color" stroke-width="1.5"><title>$name</title></polyline>""")
      }
      if (m > 1)
        sb.append(s"""\n<text x="${f(x0 + panelW / 2)}" y="${f(margin - 8)}" text-anchor="middle">target $k</text>""")
    }
    sb.append(s"""\n<text x="${f(width / 2.0)}" y="${f(height - 6.0)}" text-anchor="middle">sigma (decreasing)</text>""")
    sb.append(s"""\n<text x="12" y="${f(height / 2.0)}" text-anchor="middle" transform="rotate(-90 12 ${f(height / 2.0)})">beta</text>""")
    sb.append("\n</svg>")
    sb.toString
  }

  /** Primal/dual objective vs iteration or time for one path step
    * (`plotDiagnostics`; requires `SlopeParams(diagnostics = true)`). */
  def diagnosticsSvg(model: SlopeModel, step: Int = -1,
                     xvar: String = "iteration",
                     width: Int = 480, height: Int = 320): String = {
    require(model.diagnostics.nonEmpty,
      "no diagnostics found in fit; did you fit with diagnostics = true?")
    require(xvar == "iteration" || xvar == "time",
      s"xvar must be iteration|time, got $xvar")
    val s0 = if (step < 0) model.diagnostics.length - 1 else step
    val d = model.diagnostics(s0)
    require(d.primals.nonEmpty, s"no diagnostics recorded for step $s0")
    val xs: Seq[Double] =
      if (xvar == "time") d.times.toSeq
      else d.primals.indices.map(_.toDouble)
    val margin = 34.0
    val w = width - margin * 2; val h = height - margin * 2
    val allY = (d.primals ++ d.duals).toSeq
    val yMin = allY.min; val yMax = allY.max
    val sb = new StringBuilder(svgOpen(width, height,
      s"solver diagnostics, path step $s0"))
    sb.append(s"""\n<rect x="${f(margin)}" y="${f(margin)}" width="${f(w)}" height="${f(h)}" fill="none" stroke="#888"/>""")
    for ((ys, color, name) <- Seq(
      (d.primals.toSeq, Palette(0), "primal"),
      (d.duals.toSeq, Palette(2), "dual"))) {
      val pts = polyline(xs, ys, xs.min, xs.max, yMin, yMax,
        margin, margin, w, h)
      sb.append(s"""\n<polyline points="$pts" fill="none" stroke="$color" stroke-width="1.5"><title>$name</title></polyline>""")
    }
    sb.append(s"""\n<text x="${f(width / 2.0)}" y="${f(height - 6.0)}" text-anchor="middle">${if (xvar == "time") "time (seconds)" else "iteration"}</text>""")
    sb.append(s"""\n<text x="12" y="${f(height / 2.0)}" text-anchor="middle" transform="rotate(-90 12 ${f(height / 2.0)})">objective</text>""")
    sb.append("\n</svg>")
    sb.toString
  }

  /** CV mean ± CI vs σ for one measure (`plot.TrainedOwl` analog):
    * one polyline per q with a CI whisker at every σ. */
  def cvSvg(cv: SlopeCvResult, measure: String,
            width: Int = 480, height: Int = 320): String = {
    val cells = cv.summary.filter(_.measure == measure)
    require(cells.nonEmpty, s"no CV cells for measure $measure")
    val qs = cells.map(_.q).distinct.sorted
    val margin = 34.0
    val w = width - margin * 2; val h = height - margin * 2
    val xMin = cells.map(_.sigma).min; val xMax = cells.map(_.sigma).max
    val allY = cells.flatMap(c => Seq(c.lo, c.hi, c.mean))
    val yMin = allY.min; val yMax = allY.max
    def sx(x: Double) =
      if (xMax == xMin) margin + w / 2 else margin + (-x - (-xMax)) / (xMax - xMin) * w
    def sy(y: Double) =
      if (yMax == yMin) margin + h / 2 else margin + h - (y - yMin) / (yMax - yMin) * h
    val sb = new StringBuilder(svgOpen(width, height, s"CV $measure vs sigma"))
    sb.append(s"""\n<rect x="${f(margin)}" y="${f(margin)}" width="${f(w)}" height="${f(h)}" fill="none" stroke="#888"/>""")
    qs.zipWithIndex.foreach { case (q, i) =>
      val color = Palette(i % Palette.length)
      val line = cells.filter(_.q == q).sortBy(c => -c.sigma)
      val pts = line.map(c => s"${f(sx(c.sigma))},${f(sy(c.mean))}").mkString(" ")
      sb.append(s"""\n<polyline points="$pts" fill="none" stroke="$color" stroke-width="1.5"><title>q=$q</title></polyline>""")
      line.foreach { c =>
        sb.append(s"""\n<line x1="${f(sx(c.sigma))}" y1="${f(sy(c.lo))}" x2="${f(sx(c.sigma))}" y2="${f(sy(c.hi))}" stroke="$color" stroke-width="0.75"/>""")
      }
    }
    sb.append(s"""\n<text x="${f(width / 2.0)}" y="${f(height - 6.0)}" text-anchor="middle">sigma (decreasing)</text>""")
    sb.append(s"""\n<text x="12" y="${f(height / 2.0)}" text-anchor="middle" transform="rotate(-90 12 ${f(height / 2.0)})">$measure</text>""")
    sb.append("\n</svg>")
    sb.toString
  }
}
