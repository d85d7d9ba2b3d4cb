package graft.slope

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Score one measure; returns one value per path step. */
  def score(model: SlopeModel, df: DataFrame, featuresCol: String,
            labelCol: String, measure: String): Array[Double] = {
    require(ValidMeasures(model.family).contains(measure),
      s"measure $measure invalid for family ${model.family}; " +
        s"valid: ${ValidMeasures(model.family).mkString(", ")}")
    val scored = SlopeServe.predictions(model, df, featuresCol,
      if (model.family == "gaussian" || model.family == "poisson") Seq("link")
      else Seq("response"))
    val spark = df.sparkSession

    val perStep: DataFrame = model.family match {
      case "gaussian" | "poisson" =>
        // link-scale error (reference scores poisson on the link too,
        // R/score.R:122-135 with predict default type="link")
        val y = col(labelCol).cast("double")
        val e = scored.select(y.as("y"), posexplode(col("linpred"))
          .as(Seq("step", "lp")))
          .select(col("step"), (element_at(col("lp"), 1) - col("y")).as("err"))
        measure match {
          case "mse" => e.groupBy("step").agg(avg(col("err") * col("err")).as("v"))
          case "mae" => e.groupBy("step").agg(avg(abs(col("err"))).as("v"))
        }
      case "binomial" =>
        // y one-hot over 2 levels; y_hat = P(level 2) (R/score.R:45-78)
        val y2 = when(col(labelCol).cast("string") === model.classNames(1), 1.0)
          .otherwise(0.0)
        val e = scored.select(y2.as("y2"), posexplode(col("response"))
          .as(Seq("step", "r")))
          .select(col("step"), col("y2"), element_at(col("r"), 1).as("p"))
        measure match {
          case "mse" => e.groupBy("step").agg(
            avg(pow(col("p") + (lit(1.0) - col("y2")) - 1.0, 2) +
              pow(col("p") - col("y2"), 2)).as("v"))
          case "mae" => e.groupBy("step").agg(
            avg(abs(col("p") + (lit(1.0) - col("y2")) - 1.0) +
              abs(col("p") - col("y2"))).as("v"))
          case "misclass" => e.groupBy("step").agg(
            avg(when((lit(1.0) - col("y2")) === 1.0 && col("p") > 0.5, 1.0)
              .when(col("y2") === 1.0 && col("p") <= 0.5, 1.0)
              .otherwise(0.0)).as("v"))
          case "deviance" =>
            val pc = least(greatest(col("p"), lit(1e-5)), lit(1.0 - 1e-5))
            e.groupBy("step").agg(
              avg(lit(-2.0) * ((lit(1.0) - col("y2")) * log(lit(1.0) - pc) +
                col("y2") * log(pc))).as("v"))
          case "auc" =>
            // scalable midrank AUC per step
            val g = e.groupBy("step", "p")
              .agg(count(lit(1)).as("n"), sum("y2").as("n1"))
            val w = Window.partitionBy("step").orderBy("p")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            g.select(col("step"), col("n"), col("n1"),
              (sum("n").over(w) - col("n") + (col("n") + 1.0) / 2.0).as("mr"))
              .groupBy("step")
              .agg(((sum(col("n1") * col("mr")) -
                sum("n1") * (sum("n1") + 1.0) / 2.0) /
                (sum("n1") * (sum("n") - sum("n1")))).as("v"))
        }
      case "multinomial" =>
        // y one-hot over K levels vs the K-class response probabilities.
        // Per-step scalar = mean over rows (mse/mae also over classes;
        // deviance sums over classes) — normalizes the reference's
        // per-row-matrix return (R/score.R:105-106).
        val names = array(model.classNames.map(lit(_)): _*)
        val yIdx = array_position(names, col(labelCol).cast("string")).cast("int")
        val e = scored.select(yIdx.as("yi"), posexplode(col("response"))
          .as(Seq("step", "r")))
        val probs = col("r")
        val yOneHot = transform(sequence(lit(1), lit(model.nClasses)),
          i => when(i === col("yi"), 1.0).otherwise(0.0))
        measure match {
          case "mse" => e.groupBy("step").agg(
            avg(aggregate(zip_with(probs, yOneHot, (p, y) => pow(p - y, 2)),
              lit(0.0), (a, v) => a + v) / model.nClasses).as("v"))
          case "mae" => e.groupBy("step").agg(
            avg(aggregate(zip_with(probs, yOneHot, (p, y) => abs(p - y)),
              lit(0.0), (a, v) => a + v) / model.nClasses).as("v"))
          case "deviance" =>
            e.groupBy("step").agg(
              avg(aggregate(zip_with(probs, yOneHot, (p, y) =>
                lit(-2.0) * y * log(least(greatest(p, lit(1e-5)), lit(1.0 - 1e-5)))),
                lit(0.0), (a, v) => a + v)).as("v"))
        }
    }
    perStep.orderBy("step").collect().map(_.getDouble(1))
  }
}
