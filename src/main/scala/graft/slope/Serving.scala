package graft.slope

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.functions.vector_to_array

/** Prediction / coefficient-serving layer (reference `R/predict.R`,
  * `R/coef.R`, `R/interpolatePenalty.R`, `R/interpolateCoefficients.R`).
  *
  * The coefficient cube is p/m/steps-dimensional (driver state) and is
  * broadcast into one narrow map stage — predictions never shuffle.
  */
object SlopeServe {

  /** Coefficients at an arbitrary penalty scale: exact slice when sigma
    * is on the path, else glmnet-style linear interpolation with
    * clamping to the path range (`R/interpolatePenalty.R:10-37`).
    * Returns (intercepts length m, coefs p x m column-major). */
  def coefAt(model: SlopeModel, sigma: Double): (Array[Double], Array[Double]) = {
    val path = model.sigma
    val exact = path.indexWhere(s => s == sigma)
    if (exact >= 0) return (model.intercepts(exact), model.coefs(exact))
    require(sigma >= 0, "sigma must be non-negative")
    if (path.length == 1) return (model.intercepts(0), model.coefs(0))

    val k = path.length
    val x = math.min(math.max(sigma, path.min), path.max)
    // normalized positions: penalty[0] -> 0, penalty[k-1] -> 1
    val denom = path(0) - path(k - 1)
    val xfrac0 = (path(0) - x) / denom
    val pn = path.map(p => (path(0) - p) / denom)
    // locate bracketing indices on the normalized grid (pn is increasing)
    var right = pn.indexWhere(_ >= xfrac0)
    if (right < 0) right = k - 1
    val left = if (pn(right) == xfrac0) right else math.max(0, right - 1)
    val frac =
      if (left == right || math.abs(pn(left) - pn(right)) < 2.3e-16) 1.0
      else (xfrac0 - pn(right)) / (pn(left) - pn(right))

    val ic = Array.tabulate(model.m)(j =>
      model.intercepts(left)(j) * frac + model.intercepts(right)(j) * (1 - frac))
    val cf = Array.tabulate(model.p * model.m)(j =>
      model.coefs(left)(j) * frac + model.coefs(right)(j) * (1 - frac))
    (ic, cf)
  }

  /** Exact coefficients at arbitrary penalty scales — the reference's
    * `coef(..., exact = TRUE)` branch (`R/coef.R:43-48`), which re-solves
    * via `stats::update()` instead of interpolating. The requested
    * sigmas are solved as ONE descending user-sigma path, so each point
    * warm-starts from the previous (the same mechanics `update()` gets
    * from the path loop). Returns (intercepts length m, coefs p x m),
    * one entry per requested sigma, in the caller's order. */
  def coefExact(df: DataFrame, featuresCol: String, labelCol: String,
                params: SlopeParams, sigmas: Array[Double])
    : Array[(Array[Double], Array[Double])] = {
    require(sigmas.nonEmpty, "sigmas must be non-empty")
    require(sigmas.forall(_ >= 0), "sigma must be non-negative")
    val sorted = sigmas.distinct.sortBy(-(_: Double))
    val m = Slope.fit(df, featuresCol, labelCol,
      params.copy(sigma = Some(sorted)))
    sigmas.map { s =>
      val i = sorted.indexWhere(_ == s)
      (m.intercepts(i), m.coefs(i))
    }
  }

  private def toArrayCol(df: DataFrame, featuresCol: String): Column =
    df.schema(featuresCol).dataType match {
      case _: org.apache.spark.sql.types.ArrayType =>
        col(featuresCol).cast("array<double>")
      case _ => // ml VectorUDT
        vector_to_array(col(featuresCol)).cast("array<double>")
    }

  /** Linear predictors for every path step: adds `linpred` =
    * array(steps) of array(m). Pure Catalyst expressions — the
    * coefficient cube is inlined as literals (p and nSteps are
    * driver-sized by design), so the stage stays codegen'd. */
  def withLinearPredictors(model: SlopeModel, df: DataFrame,
                           featuresCol: String): DataFrame = {
    val f = toArrayCol(df, featuresCol)
    // small cubes unroll to plain element_at arithmetic (whole-stage
    // codegen, no higher-order functions — HOFs evaluate interpreted
    // and cost ~10x on wide scoring passes); big cubes fall back to the
    // HOF form to keep the expression tree bounded
    val unroll = model.nSteps.toLong * model.m * model.p <= 20000
    val steps = (0 until model.nSteps).map { s =>
      val perTarget = (0 until model.m).map { k =>
        if (unroll) {
          val terms = (0 until model.p).collect {
            case j if model.coefs(s)(k * model.p + j) != 0.0 =>
              element_at(f, j + 1) * lit(model.coefs(s)(k * model.p + j))
          }
          terms.foldLeft(lit(model.intercepts(s)(k)): Column)(_ + _)
        } else {
          val coefArr = array((0 until model.p)
            .map(j => lit(model.coefs(s)(k * model.p + j))): _*)
          aggregate(zip_with(f, coefArr, (x, c) => x * c), lit(0.0),
            (acc, v) => acc + v) + lit(model.intercepts(s)(k))
        }
      }
      array(perTarget: _*)
    }
    df.withColumn("linpred", array(steps: _*))
  }

  /** Family response map applied to a length-m linear predictor column
    * entry (reference `R/predict.R:73-197`). For multinomial the result
    * is the full K-class softmax (implicit 0 logit appended). */
  private def responseOf(model: SlopeModel, lp: Column): Column =
    model.family match {
      // multi-task (m > 1): response IS the length-m linear predictor;
      // the m = 1 form is kept verbatim so existing plans are unchanged
      case "gaussian" =>
        if (model.m == 1) array(element_at(lp, 1)) else lp
      case "poisson"  => array(exp(element_at(lp, 1)))
      case "binomial" => array(lit(1.0) / (lit(1.0) + exp(-element_at(lp, 1))))
      case "multinomial" =>
        val withRef = concat(lp, array(lit(0.0)))
        val mx = array_max(withRef)
        val ex = transform(withRef, v => exp(v - mx))
        val tot = aggregate(ex, lit(0.0), (a, v) => a + v)
        transform(ex, v => v / tot)
    }

  /** Class label for one step (binomial: lin_pred > 0 picks the second
    * level, `R/predict.R:107`; multinomial: argmax with the reference
    * class appended, `R/predict.R:179-190`). */
  private def classOf(model: SlopeModel, lp: Column): Column =
    model.family match {
      case "binomial" =>
        when(element_at(lp, 1) > 0.0, lit(model.classNames(1)))
          .otherwise(lit(model.classNames(0)))
      case "multinomial" =>
        val withRef = concat(lp, array(lit(0.0)))
        val names = array(model.classNames.map(lit(_)): _*)
        element_at(names, array_position(withRef, array_max(withRef)).cast("int"))
      case other =>
        throw new IllegalArgumentException(s"class prediction undefined for $other")
    }

  /** Full transform: adds `linpred` plus, per requested type,
    * `response` (array per step) and/or `predicted_class` (string per
    * step). */
  def predictions(model: SlopeModel, df: DataFrame, featuresCol: String,
                  types: Seq[String] = Seq("link")): DataFrame = {
    var out = withLinearPredictors(model, df, featuresCol)
    if (types.contains("response"))
      out = out.withColumn("response",
        transform(col("linpred"), lp => responseOf(model, lp)))
    if (types.contains("class"))
      out = out.withColumn("predicted_class",
        transform(col("linpred"), lp => classOf(model, lp)))
    out
  }

  /** Path summary table (reference `print.Owl`, `R/print.R:14-31`):
    * one row per step with sigma, deviance ratio, nonzero count. */
  def pathSummary(model: SlopeModel, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (0 until model.nSteps).map { s =>
      val nz = model.coefs(s).count(_ != 0.0)
      (s, model.sigma(s), model.devianceRatios(s), nz, model.deviances(s))
    }.toDF("step", "sigma", "deviance_ratio", "n_nonzero", "deviance")
  }

  /** Long-form coefficient table for SQL access over the fitted cube. */
  def coefTable(model: SlopeModel, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for {
      s <- 0 until model.nSteps
      k <- 0 until model.m
      j <- 0 until model.p
    } yield (s, model.sigma(s), k, j, model.coefs(s)(k * model.p + j))
    rows.toDF("step", "sigma", "target", "feature_idx", "coefficient")
  }
}
