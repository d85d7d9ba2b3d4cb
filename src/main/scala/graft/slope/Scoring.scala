package graft.slope

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model scoring over a DataFrame (reference `R/score.R`): per-path-step
  * mse / mae / deviance / misclass / AUC with the reference's
  * family-measure validity matrix (`R/trainOwl.R:74-79`).
  *
  * Plan shape: one narrow map producing per-step contributions, an
  * explode to (step, ...) rows, then a groupBy(step) aggregation —
  * map-side combine reduces every partition to nSteps rows, so the
  * shuffle is tiny at any scale. AUC aggregates per distinct
  * probability first (midrank identity), never a global row rank.
  */
object SlopeScore {

  val ValidMeasures: Map[String, Seq[String]] = Map(
    "gaussian" -> Seq("mse", "mae"),
    "binomial" -> Seq("mse", "mae", "deviance", "misclass", "auc"),
    "poisson" -> Seq("mse", "mae"),
    "multinomial" -> Seq("mse", "mae", "deviance"))

  /** Score several measures in ONE data pass each family allows
    * (AUC needs its own ranked aggregation and runs separately).
    * Returns measure -> one value per path step. */
  def scoreMany(model: SlopeModel, df: DataFrame, featuresCol: String,
                labelCol: String, measures: Seq[String]): Map[String, Array[Double]] = {
    val valid = ValidMeasures(model.family)
    measures.foreach(m => require(valid.contains(m),
      s"measure $m invalid for family ${model.family}; valid: ${valid.mkString(", ")}"))
    val (aucMs, aggMs) = measures.distinct.partition(_ == "auc")
    val aggResults: Map[String, Array[Double]] =
      if (aggMs.isEmpty) Map.empty
      else {
        val scored = SlopeServe.predictions(model, df, featuresCol,
          if (model.family == "gaussian" || model.family == "poisson") Seq("link")
          else Seq("response"))
        val e = explodedErrors(model, scored, labelCol)
        val aggCols = aggMs.map(m => measureAgg(model, m).as(m))
        val rows = e.groupBy("step").agg(aggCols.head, aggCols.tail: _*)
          .orderBy("step").collect()
        aggMs.map(m => m -> rows.map(_.getAs[Double](m))).toMap
      }
    aggResults ++
      aucMs.map(m => m -> scoreAuc(model, df, featuresCol, labelCol))
  }

  /** Per-row exploded (step, ...) frame feeding [[measureAgg]]. */
  private def explodedErrors(model: SlopeModel, scored: DataFrame,
                             labelCol: String): DataFrame = model.family match {
    case "gaussian" if model.m > 1 =>
      // multi-task: per-row length-m error vector; measures below
      // average over all n*m cells (mean over the error matrix)
      val y = col(labelCol).cast("array<double>")
      scored.select(y.as("ya"), posexplode(col("linpred")).as(Seq("step", "lp")))
        .select(col("step"),
          zip_with(col("lp"), col("ya"), (l, t) => l - t).as("errs"))
    case "gaussian" | "poisson" =>
      val y = col(labelCol).cast("double")
      scored.select(y.as("y"), posexplode(col("linpred")).as(Seq("step", "lp")))
        .select(col("step"), (element_at(col("lp"), 1) - col("y")).as("err"))
    case "binomial" =>
      val y2 = when(col(labelCol).cast("string") === model.classNames(1), 1.0)
        .otherwise(0.0)
      scored.select(y2.as("y2"), posexplode(col("response")).as(Seq("step", "r")))
        .select(col("step"), col("y2"), element_at(col("r"), 1).as("p"))
    case "multinomial" =>
      val names = array(model.classNames.map(lit(_)): _*)
      val yIdx = array_position(names, col(labelCol).cast("string")).cast("int")
      scored.select(yIdx.as("yi"), posexplode(col("response")).as(Seq("step", "r")))
  }

  /** Aggregation expression for one non-AUC measure over the exploded
    * frame (same formulas as [[score]]). */
  private def measureAgg(model: SlopeModel, measure: String)
    : org.apache.spark.sql.Column = model.family match {
    case "gaussian" if model.m > 1 => measure match {
      case "mse" => avg(aggregate(transform(col("errs"), e => e * e),
        lit(0.0), (a, v) => a + v) / model.m)
      case "mae" => avg(aggregate(transform(col("errs"), e => abs(e)),
        lit(0.0), (a, v) => a + v) / model.m)
    }
    case "gaussian" | "poisson" => measure match {
      case "mse" => avg(col("err") * col("err"))
      case "mae" => avg(abs(col("err")))
    }
    case "binomial" => measure match {
      case "mse" => avg(pow(col("p") + (lit(1.0) - col("y2")) - 1.0, 2) +
        pow(col("p") - col("y2"), 2))
      case "mae" => avg(abs(col("p") + (lit(1.0) - col("y2")) - 1.0) +
        abs(col("p") - col("y2")))
      case "misclass" => avg(when((lit(1.0) - col("y2")) === 1.0 && col("p") > 0.5, 1.0)
        .when(col("y2") === 1.0 && col("p") <= 0.5, 1.0).otherwise(0.0))
      case "deviance" =>
        val pc = least(greatest(col("p"), lit(1e-5)), lit(1.0 - 1e-5))
        avg(lit(-2.0) * ((lit(1.0) - col("y2")) * log(lit(1.0) - pc) +
          col("y2") * log(pc)))
    }
    case "multinomial" =>
      val probs = col("r")
      val yOneHot = transform(sequence(lit(1), lit(model.nClasses)),
        i => when(i === col("yi"), 1.0).otherwise(0.0))
      measure match {
        case "mse" => avg(aggregate(zip_with(probs, yOneHot, (p, y) => pow(p - y, 2)),
          lit(0.0), (a, v) => a + v) / model.nClasses)
        case "mae" => avg(aggregate(zip_with(probs, yOneHot, (p, y) => abs(p - y)),
          lit(0.0), (a, v) => a + v) / model.nClasses)
        case "deviance" => avg(aggregate(zip_with(probs, yOneHot, (p, y) =>
          lit(-2.0) * y * log(least(greatest(p, lit(1e-5)), lit(1.0 - 1e-5)))),
          lit(0.0), (a, v) => a + v))
      }
  }

  /** Score one measure; returns one value per path step. */
  def score(model: SlopeModel, df: DataFrame, featuresCol: String,
            labelCol: String, measure: String): Array[Double] =
    scoreMany(model, df, featuresCol, labelCol, Seq(measure))(measure)

  /** Weighted midrank AUC over a (label, score, weight) frame — the
    * DETERMINISTIC closed form of the reference's weighted AUC
    * (`R/score.R:152-166`). The reference randomizes tie order with
    * `runif` and credits each positive with the negative weight strictly
    * before it; the expectation of that randomization is half credit per
    * tied (pos, neg) weight pair, which is what the midrank form
    * computes — so this is the reference's estimator with the sampling
    * noise removed (documented deviation; the `runif` form is not
    * oracle-checkable). `weights = 1` reduces exactly to the unweighted
    * midrank AUC.
    *
    * Scalable shape: aggregate per DISTINCT score first, then a
    * range-bucketed two-pass prefix sum ([[graft.functions.PrefixSum]])
    * for the cumulative negative weight — no single-reducer window
    * anywhere, even with continuous scores where |distinct| ≈ n.
    * Returns a 1-row frame with column `auc_w`.
    *
    * Determinism caveat: PrefixSum's bit-equality-with-the-naive-window
    * claim holds when the summed weights are exact in double (integer
    * or dyadic weights — the engine's call sites). Arbitrary fractional
    * weights reorder FP additions versus the single-window form, so
    * results can drift in the last ULP; treat them as correct to ~1e-15
    * relative, not bit-reproducible across plans. */
  def weightedAuc(df: DataFrame, labelCol: String, scoreCol: String,
                  weightCol: String): DataFrame = {
    val g = df.select(col(labelCol).cast("double").as("y"),
      col(scoreCol).as("s"), col(weightCol).cast("double").as("w"))
      .groupBy("s")
      .agg(sum(when(col("y") === 1.0, col("w")).otherwise(0.0)).as("w1"),
        sum(when(col("y") === 1.0, 0.0).otherwise(col("w"))).as("w0"))
    graft.functions.PrefixSum.inclusive(g, Nil, "s", "w0", "cw0i")
      .select(col("w1"), col("w0"), (col("cw0i") - col("w0")).as("cw0"))
      .agg((sum(col("w1") * (col("cw0") + col("w0") / 2)) /
        (sum("w1") * sum("w0"))).as("auc_w"))
  }

  /** Scalable midrank AUC per step: aggregate per distinct probability
    * first (midrank of a tie group = count-before + (n+1)/2), then a
    * per-step range-bucketed prefix sum for the running count
    * ([[graft.functions.PrefixSum]]) — a step's |distinct probs| ≈ n
    * rows never funnel through one task (R/score.R:137-150 rank form). */
  /** Reliability curve + expected calibration error — the audit a
    * learned quality filter needs before its scores become sampling
    * WEIGHTS (an uncalibrated filter silently over/under-samples).
    * Scores bin into `bins` equal-width [0,1] buckets (scores clamped;
    * a score of exactly 1.0 lands in the last bin); per bin: count,
    * mean score, empirical positive rate, and |gap|. ECE is the
    * count-weighted mean |gap| — derivable from the output, and also
    * returned on every row for one-frame serving.
    *
    * One map-side-combined groupBy over one scan — bins are the only
    * exchange key (≤ `bins` groups), so the plan is flat at any corpus
    * size. Engine-replayable: bin = floor(score·bins) clamped, all
    * aggregates exact-or-rounded. */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val b = least(floor(col(scoreCol) * bins).cast("long"),
      lit(bins - 1L))
    val perBin = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(greatest(least(b, lit(bins - 1L)), lit(0L)).as("bin"),
        col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("double").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), avg("s").as("mean_score"),
        avg("y").as("frac_pos"))
      .select(col("bin"), col("n"), col("mean_score"), col("frac_pos"),
        abs(col("mean_score") - col("frac_pos")).as("gap"))
    // ECE = Σ n_b/N · |gap_b| — a 1-row frame broadcast back, never a
    // driver value
    val ece = perBin.agg(
      (sum(col("n") * col("gap")) / sum("n")).as("ece"))
    perBin.crossJoin(broadcast(ece))
  }

  private def scoreAuc(model: SlopeModel, df: DataFrame, featuresCol: String,
                       labelCol: String): Array[Double] = {
    val scored = SlopeServe.predictions(model, df, featuresCol, Seq("response"))
    val e = explodedErrors(model, scored, labelCol)
    val g = e.groupBy("step", "p")
      .agg(count(lit(1)).as("n"), sum("y2").as("n1"))
    graft.functions.PrefixSum.inclusive(g, Seq("step"), "p", "n", "cn")
      .select(col("step"), col("n"), col("n1"),
        (col("cn") - col("n") + (col("n") + 1.0) / 2.0).as("mr"))
      .groupBy("step")
      .agg(((sum(col("n1") * col("mr")) -
        sum("n1") * (sum("n1") + 1.0) / 2.0) /
        (sum("n1") * (sum("n") - sum("n1")))).as("v"))
      .orderBy("step").collect().map(_.getDouble(1))
  }
}
