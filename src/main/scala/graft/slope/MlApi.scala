package graft.slope

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Spark ML Pipeline integration: `SlopeRegression` is a standard
  * `Estimator` so the engine slots into `Pipeline`, `ParamGridBuilder`
  * and `CrossValidator` (the role the caret adapter plays for the
  * reference, `R/caretOwl.R:15-269`).
  */
class SlopeRegression(override val uid: String)
    extends Estimator[SlopeRegressionModel] {

  def this() = this(Identifiable.randomUID("slopeReg"))

  final val featuresCol = new Param[String](this, "featuresCol", "features column")
  final val labelCol = new Param[String](this, "labelCol", "label column")
  final val family = new Param[String](this, "family",
    "gaussian | binomial | poisson | multinomial",
    ParamValidators.inArray(Array("gaussian", "binomial", "poisson", "multinomial")))
  final val fitIntercept = new BooleanParam(this, "fitIntercept", "fit intercept")
  final val scale = new Param[String](this, "scale", "l1 | l2 | sd | max | none")
  final val nSigma = new IntParam(this, "nSigma", "path length",
    ParamValidators.gt(0))
  final val q = new DoubleParam(this, "q", "lambda sequence shape parameter")
  final val lambdaType = new Param[String](this, "lambdaType",
    "gaussian | bh | oscar | user")
  final val screening = new BooleanParam(this, "screening", "strong-rule screening")

  setDefault(featuresCol -> "features", labelCol -> "label",
    family -> "gaussian", fitIntercept -> true, scale -> "l2",
    nSigma -> 100, lambdaType -> "gaussian", screening -> true)

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setFamily(v: String): this.type = set(family, v)
  def setFitIntercept(v: Boolean): this.type = set(fitIntercept, v)
  def setScale(v: String): this.type = set(scale, v)
  def setNSigma(v: Int): this.type = set(nSigma, v)
  def setQ(v: Double): this.type = set(q, v)
  def setLambdaType(v: String): this.type = set(lambdaType, v)
  def setScreening(v: Boolean): this.type = set(screening, v)

  def toParams: SlopeParams = SlopeParams(
    family = $(family), fitIntercept = $(fitIntercept), scale = $(scale),
    nSigma = $(nSigma), q = get(q), lambdaType = $(lambdaType),
    screening = $(screening))

  override def fit(dataset: Dataset[_]): SlopeRegressionModel = {
    val m = Slope.fit(dataset.toDF(), $(featuresCol), $(labelCol), toParams)
    new SlopeRegressionModel(uid, m)
      .setParent(this)
      .setFeaturesColName($(featuresCol))
  }

  override def copy(extra: ParamMap): SlopeRegression = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(featuresCol)),
      s"missing features column ${$(featuresCol)}")
    schema
  }
}

/** Fitted model: `transform` adds linpred / response / predicted_class
  * columns plus a scalar `prediction` from the LAST path step (most
  * regularized-to-least; pick another sigma via `predictionStep` or
  * interpolation through [[SlopeServe.coefAt]]).
  *
  * Multi-task gaussian (m > 1) emits `predictions` — an
  * `array<double>` of length m — INSTEAD of `prediction`, so the
  * DoubleType contract of the standard column (assumed by e.g.
  * `RegressionEvaluator`) is never silently broken by a type change
  * under the same name. */
class SlopeRegressionModel(override val uid: String, val slopeModel: SlopeModel)
    extends Model[SlopeRegressionModel] {

  private var featuresColName: String = "features"
  def setFeaturesColName(v: String): this.type = { featuresColName = v; this }

  final val predictionStep = new IntParam(this, "predictionStep",
    "path step used for the scalar prediction column (-1 = last)")
  setDefault(predictionStep -> -1)
  def setPredictionStep(v: Int): this.type = set(predictionStep, v)

  override def transform(dataset: Dataset[_]): DataFrame = {
    val types =
      if (slopeModel.family == "binomial" || slopeModel.family == "multinomial")
        Seq("response", "class")
      else Seq("link")
    val withAll = SlopeServe.predictions(slopeModel, dataset.toDF(),
      featuresColName, types)
    val step = if ($(predictionStep) < 0) slopeModel.nSteps else $(predictionStep) + 1
    slopeModel.family match {
      case "gaussian" =>
        // multi-task (m > 1): length-m array under a DIFFERENT name so
        // `prediction` stays DoubleType wherever it exists (see class doc)
        val lpStep = element_at(col("linpred"), step)
        if (slopeModel.m == 1)
          withAll.withColumn("prediction", element_at(lpStep, 1))
        else withAll.withColumn("predictions", lpStep)
      case "poisson" =>
        withAll.withColumn("prediction",
          exp(element_at(element_at(col("linpred"), step), 1)))
      case _ =>
        withAll.withColumn("prediction",
          element_at(col("predicted_class"), step))
    }
  }

  override def copy(extra: ParamMap): SlopeRegressionModel =
    copyValues(new SlopeRegressionModel(uid, slopeModel)
      .setFeaturesColName(featuresColName), extra).setParent(parent)

  override def transformSchema(schema: StructType): StructType = schema

  def save(path: String): Unit = SlopeModelIO.save(slopeModel,
    SparkSession.active, path)
}

/** Model persistence: coefficient cube as parquet + JSON metadata (the
  * MLWritable role without the MLlib reader boilerplate). */
object SlopeModelIO {

  def save(m: SlopeModel, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      s <- 0 until m.nSteps
      k <- 0 until m.m
    } yield (s, k, m.intercepts(s)(k),
      (0 until m.p).map(j => m.coefs(s)(k * m.p + j)))
    rows.toDF("step", "target", "intercept", "coefs")
      .repartition(1).write.mode("overwrite").parquet(s"$path/coefficients")
    val meta = Map(
      "family" -> m.family,
      "fitIntercept" -> m.fitIntercept.toString,
      "p" -> m.p.toString, "m" -> m.m.toString,
      "nClasses" -> m.nClasses.toString,
      "classNames" -> m.classNames.mkString(","),
      "sigma" -> m.sigma.mkString(","),
      "lambda" -> m.lambda.mkString(","),
      "nullDeviance" -> m.nullDeviance.toString,
      "deviances" -> m.deviances.mkString(","),
      "devianceRatios" -> m.devianceRatios.mkString(","),
      "passes" -> m.passes.mkString(","),
      "nUnique" -> m.nUnique.mkString(","),
      "xCenter" -> m.xCenter.mkString(","),
      "xScale" -> m.xScale.mkString(","))
    meta.toSeq.toDF("key", "value")
      .repartition(1).write.mode("overwrite").json(s"$path/metadata")
  }

  def load(spark: SparkSession, path: String): SlopeModel = {
    val meta = spark.read.json(s"$path/metadata").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    def darr(k: String): Array[Double] =
      if (meta(k).isEmpty) Array.empty else meta(k).split(",").map(_.toDouble)
    val p = meta("p").toInt
    val m = meta("m").toInt
    val coefRows = spark.read.parquet(s"$path/coefficients").collect()
    val nSteps = darr("sigma").length
    val intercepts = Array.fill(nSteps)(new Array[Double](m))
    val coefs = Array.fill(nSteps)(new Array[Double](p * m))
    coefRows.foreach { r =>
      val s = r.getAs[Int]("step"); val k = r.getAs[Int]("target")
      intercepts(s)(k) = r.getAs[Double]("intercept")
      val cs = r.getSeq[Double](r.fieldIndex("coefs"))
      for (j <- 0 until p) coefs(s)(k * p + j) = cs(j)
    }
    SlopeModel(
      family = meta("family"),
      fitIntercept = meta("fitIntercept").toBoolean,
      p = p, m = m,
      nClasses = meta("nClasses").toInt,
      classNames = if (meta("classNames").isEmpty) Array.empty
        else meta("classNames").split(","),
      intercepts = intercepts, coefs = coefs,
      sigma = darr("sigma"), lambda = darr("lambda"),
      nullDeviance = meta("nullDeviance").toDouble,
      deviances = darr("deviances"),
      devianceRatios = darr("devianceRatios"),
      passes = meta("passes").split(",").filter(_.nonEmpty).map(_.toInt),
      nUnique = meta("nUnique").split(",").filter(_.nonEmpty).map(_.toInt),
      activeSets = Array.fill(nSteps)(Array.empty[Int]),
      xCenter = darr("xCenter"), xScale = darr("xScale"),
      diagnostics = Array.empty)
  }
}

/** Port of the reference's fixture factory `randomProblem`
  * (`R/utils.R:15-76`) as a distributed generator: X ~ N(0,1) via
  * seeded `randn` columns, planted +-amplitude coefficients, per-family
  * response simulation — all inside Spark expressions (no driver data).
  *
  * Design knobs from the reference:
  *  - `density < 1`: sparse X — each cell independently nonzero with
  *    probability `density`, N(0,1) value when nonzero (the distributed
  *    analogue of `Matrix::rsparsematrix`, whose cells are iid-sparse
  *    up to its exact-nnz draw).
  *  - `rho > 0`: equicorrelated design — the reference adds ONE shared
  *    N(0,1) draw per row, scaled by sqrt(rho/(1-rho)), to every
  *    column (`utils.R:37-38`), giving pairwise column correlation rho.
  *    Same construction here: one extra randn column mixed into all
  *    features; no Cholesky needed for the equicorrelated case.
  *  - `family = "multinomial"`: `nTargets` classes, beta of length
  *    p*nTargets, softmax probabilities, label sampled by inverse-CDF
  *    on a seeded uniform (`utils.R:57-62`). Labels are 1.0..m.
  */
object RandomProblem {

  case class Generated(df: DataFrame, beta: Array[Double], nonzero: Array[Int])

  /** `slices > 0` pins the range partitioning: `randn(seed)` draws are a
    * function of (seed, partition, offset), so a fixed slice count makes
    * the generated fixture identical regardless of default parallelism —
    * required when the fixture feeds a golden-file comparison. Default
    * knobs (`density = 1, rho = 0`) produce expressions identical to the
    * pre-knob generator, so existing goldens built on it are unchanged. */
  def generate(spark: SparkSession, n: Long, p: Int, qSignal: Double = 0.2,
               amplitude: Double = 3.0, family: String = "gaussian",
               seed: Long = 42L, slices: Int = 0,
               density: Double = 1.0, rho: Double = 0.0,
               nTargets: Int = 3): Generated = {
    require(density > 0 && density <= 1, s"density $density outside (0,1]")
    require(rho >= 0 && rho < 1, s"rho $rho outside [0,1)")
    val m = if (family == "multinomial") nTargets else 1
    val rng = new scala.util.Random(seed)
    val beta = new Array[Double](p * m)
    val k = math.max(1, (qSignal * p * m).toInt)
    val idx = rng.shuffle((0 until p * m).toList).take(k).toArray
    idx.foreach(j => beta(j) = (if (rng.nextBoolean()) 1 else -1) * amplitude)

    // iid N(0,1) cells; density < 1 zeroes each cell independently
    // (mask seeds disjoint from the value seeds: seed+p+2+j)
    def cell(j: Int): Column = {
      val v = randn(seed + j + 1)
      if (density >= 1.0) v
      else when(rand(seed + p + 2 + j) < density, v).otherwise(lit(0.0))
    }
    // equicorrelated mix: one shared draw per row across all columns
    val sharedSeed = seed + 2L * p + 7
    def feat(j: Int): Column =
      if (rho > 0)
        cell(j) + randn(sharedSeed) * math.sqrt(rho / (1 - rho))
      else cell(j)

    val base = (if (slices > 0) spark.range(0, n, 1, slices) else spark.range(n))
      .select(col("id") +: (0 until p).map(j => feat(j).as(s"x$j")): _*)
    def lpFor(t: Int): Column =
      (0 until p).map(j => col(s"x$j") * beta(t * p + j)).reduce(_ + _)
    val lp = lpFor(0)
    val noise = randn(seed + p + 1)
    val withLabel = family match {
      case "gaussian" => base.withColumn("label", lp + noise)
      case "binomial" =>
        base.withColumn("label", when(lp + noise > 0, 1.0).otherwise(0.0))
      case "poisson" =>
        // inverse-CDF-free approximation: rounded exp-rate (fixture only)
        base.withColumn("label",
          greatest(round(exp(lp * 0.2) + noise * 0.5), lit(0.0)))
      case "multinomial" =>
        // softmax probabilities over m classes, inverse-CDF sample on a
        // seeded uniform (reference utils.R:57-62); max-shift for
        // numerical stability of the exp
        val lps = (0 until m).map(lpFor)
        val mx = greatest(lps: _*)
        val es = lps.map(l => exp(l - mx))
        val tot = es.reduce(_ + _)
        val cums = es.scanLeft(lit(0.0))(_ + _).drop(1).map(_ / tot)
        val u = rand(seed + 3L * p + 13)
        val label = cums.init.zipWithIndex.foldRight(
          lit(m.toDouble): Column) { case ((c, i), acc) =>
          when(u <= c, lit(i + 1.0)).otherwise(acc)
        }
        base.withColumn("label", label)
      case other => throw new IllegalArgumentException(s"family $other")
    }
    val df = withLabel.select(
      array((0 until p).map(j => col(s"x$j")): _*).as("features"),
      col("label"))
    Generated(df, beta, idx.sorted)
  }
}
