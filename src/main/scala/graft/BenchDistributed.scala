package graft

import graft.slope.{Slope, SlopeCv, SlopeParams}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost profile of the DISTRIBUTED (treeAggregate) solver path — the
  * backend a 1000-executor cluster would run. The regular bench rows
  * for q_slope_*_dist time dist+local together (the local fit is the
  * correctness certificate); this main isolates the distributed fits
  * and records, per scenario: median wall seconds, Spark jobs per run,
  * solver passes, and passes per path step — the numbers that decide
  * whether a non-gaussian fit is feasible at 100 TB (1-2 jobs per
  * FISTA pass; job-launch latency x passes is the whole cost model).
  * Writes one JSON line to stdout AND bench_distributed.json; the
  * job-count model it validates is documented in PERF_DISTRIBUTED.md.
  */
object BenchDistributed {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobCounter = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        jobCounter.incrementAndGet(); ()
      }
    })

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val feats = Seq("l_quantity", "l_discount", "l_tax")
    val gaussDf = li.select(array(feats.map(col): _*).as("features"),
      (col("l_discount") * 40.0 + col("l_quantity") * 0.5 +
        col("l_extendedprice") / 20000.0).as("label"))
    val binomDf = li.select(array(feats.map(col): _*).as("features"),
      when(col("l_returnflag") === "A", "A").otherwise("other").as("label"))
    val poisDf = li.select(array(Seq("l_discount", "l_tax").map(col): _*)
      .as("features"), col("l_quantity").as("label"))
    val multiDf = li.select(array(feats.map(col): _*).as("features"),
      col("l_returnflag").as("label")) // 3 classes: A | N | R
    // pinned full-length paths (early stopping off), dist backend forced
    val gaussP = SlopeParams(family = "gaussian", nSigma = 20,
      tolDevChange = 0.0, tolDevRatio = 2.0, localCellLimit = 0)
    val binomP = SlopeParams(family = "binomial", nSigma = 6,
      tolDevChange = 0.0, tolDevRatio = 2.0, localCellLimit = 0)
    val poisP = binomP.copy(family = "poisson")
    val multiP = binomP.copy(family = "multinomial")

    // each scenario returns (passesTotal, steps)
    val scenarios: Seq[(String, () => (Int, Int))] = Seq(
      "gaussian_fit_dist" -> (() => {
        val m = Slope.fit(gaussDf, "features", "label", gaussP)
        (m.passes.sum, m.nSteps)
      }),
      "binomial_fit_dist" -> (() => {
        val m = Slope.fit(binomDf, "features", "label", binomP)
        (m.passes.sum, m.nSteps)
      }),
      "poisson_fit_dist" -> (() => {
        val m = Slope.fit(poisDf, "features", "label", poisP)
        (m.passes.sum, m.nSteps)
      }),
      "multinomial_fit_dist" -> (() => {
        val m = Slope.fit(multiDf, "features", "label", multiP)
        (m.passes.sum, m.nSteps)
      }),
      "gaussian_cv_dist" -> (() => {
        val cv = SlopeCv.trainSlope(gaussDf, "features", "label",
          gaussP.copy(nSigma = 6), qs = Seq(0.1, 0.2), number = 3,
          repeats = 1, measures = Seq("mse"), parallelism = 2)
        (cv.model.passes.sum, cv.model.nSteps)
      }),
      // round-9 FISTA refinements (lr carry across sigma steps +
      // O'Donoghue-Candes gradient restart), profiled against the
      // plain scenarios above so the pass-count win is ON RECORD per
      // family, not just inside the q_slope_binom_dist query
      "binomial_fit_dist_lrcarry" -> (() => {
        val m = Slope.fit(binomDf, "features", "label",
          binomP.copy(carryLearningRate = true, adaptiveRestart = true))
        (m.passes.sum, m.nSteps)
      }),
      "poisson_fit_dist_lrcarry" -> (() => {
        val m = Slope.fit(poisDf, "features", "label",
          poisP.copy(carryLearningRate = true, adaptiveRestart = true))
        (m.passes.sum, m.nSteps)
      }),
      "multinomial_fit_dist_lrcarry" -> (() => {
        val m = Slope.fit(multiDf, "features", "label",
          multiP.copy(carryLearningRate = true, adaptiveRestart = true))
        (m.passes.sum, m.nSteps)
      }))

    case class Sample(wall: Double, jobs: Long, passes: Int, steps: Int)
    val samples = scala.collection.mutable.Map(
      scenarios.map(_._1 -> List.empty[Sample]): _*)
    for (rep <- 1 to reps; (name, run) <- scenarios) {
      val j0 = jobCounter.get()
      val t0 = System.nanoTime()
      val (passes, steps) = run()
      val wall = (System.nanoTime() - t0) / 1e9
      val jobs = jobCounter.get() - j0
      System.err.println(
        f"[benchdist] $name%-20s rep$rep $wall%8.2fs jobs=$jobs passes=$passes steps=$steps")
      samples(name) = samples(name) :+ Sample(wall, jobs, passes, steps)
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val parts = scenarios.map { case (name, _) =>
      val xs = samples(name)
      val med = median(xs.map(_.wall))
      val s0 = xs.head
      val perStep = if (s0.steps == 0) 0.0 else s0.passes.toDouble / s0.steps
      s""""$name":{"median_sec":$med,"min_sec":${xs.map(_.wall).min},"max_sec":${xs.map(_.wall).max},"jobs_per_run":${s0.jobs},"solver_passes":${s0.passes},"path_steps":${s0.steps},"passes_per_step":$perStep}"""
    }
    val json =
      s"""{"metric":"distributed_solver","unit":"sec","reps":$reps,"sf":"$sfDir","scenarios":{${parts.mkString(",")}}}"""
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/bench_distributed.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[benchdist] could not write json: $e") }
    spark.stop()
  }
}
