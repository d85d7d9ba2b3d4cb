package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.slope.{Slope, SlopeParams, SlopeServe}

/** Ad-hoc probe: where q_quality_classifier's wall time goes
  * (featurize vs fit vs scoring). Not part of the artifact. */
object QualityClassifierProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $tag%-12s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val qcFeats = Seq("f_punct", "f_stop", "f_digit", "f_upper",
      "f_mwl", "f_uniq", "f_len")
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val feat = docs.select(col("doc_id") :: col("source") ::
        TextFunctions.punctRatio(col("text")).as("f_punct") ::
        TextFunctions.stopwordRatio(col("text")).as("f_stop") ::
        TextFunctions.digitRatio(col("text")).as("f_digit") ::
        TextFunctions.upperRatio(col("text")).as("f_upper") ::
        TextFunctions.meanWordLength(col("text")).as("f_mwl") ::
        TextFunctions.uniqueWordRatio(col("text")).as("f_uniq") ::
        log1p(TextFunctions.wsTokenCount(col("text")).cast("double")).as("f_len") ::
        (TextFunctions.qualityScore(col("text")) >= lit(0.6))
          .cast("double").as("label") :: Nil: _*)
      val featVec = feat.withColumn("features", array(qcFeats.map(col): _*))
      t("featurize")(featVec.count())
      val m = t("fit")(Slope.fit(featVec.select(col("features"), col("label")),
        "features", "label", SlopeParams(family = "binomial", nSigma = 10)))
      println(s"[probe] passes=${m.passes.mkString(",")} sum=${m.passes.sum}")
      val m2 = t("fit_flags")(Slope.fit(
        featVec.select(col("features"), col("label")),
        "features", "label", SlopeParams(family = "binomial", nSigma = 10,
          carryLearningRate = true, adaptiveRestart = true)))
      println(s"[probe] passes2=${m2.passes.mkString(",")} sum=${m2.passes.sum}")
      val preds = SlopeServe.predictions(m, featVec, "features", Seq("response"))
        .withColumn("p_keep",
          element_at(element_at(col("response"), m.nSteps), 1))
      val out = preds.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("label").cast("long")).as("n_label_keep"),
        sum((col("p_keep") >= 0.5).cast("long")).as("n_pred_keep"),
        sum(((col("p_keep") >= 0.5).cast("double") === col("label"))
          .cast("long")).as("n_agree"),
        round(avg(col("p_keep")), 6).as("mean_p_keep"))
        .orderBy("source")
      t("score")(out.count())
    }
    spark.stop()
  }
}
