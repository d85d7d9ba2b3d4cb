package graft.slope

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive: fit SLOPE paths on the driver-generated
  * parquet through a real SparkSession, via BOTH backends.
  * Run: sbt "Test/runMain graft.slope.FitDriveMain"
  */
object FitDriveMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("slope-drive")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(
        array(col("l_quantity"), col("l_discount"), col("l_tax"),
          log1p(col("l_partkey").cast("double"))).as("features"),
        col("l_extendedprice").as("label"),
        col("l_returnflag"))

    println(s"rows = ${li.count()}")

    // gaussian path, distributed backend forced
    val t0 = System.nanoTime()
    val gd = Slope.fit(li, "features", "label",
      SlopeParams(family = "gaussian", nSigma = 30, localCellLimit = 0))
    println(f"[distributed gaussian] steps=${gd.nSteps} " +
      f"devRatioLast=${gd.devianceRatios.last}%.4f " +
      f"time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    println("  sigma head: " + gd.sigma.take(3).map(s => f"$s%.3g").mkString(", "))
    println("  last-step coefs: " + gd.coefs.last.map(c => f"$c%.4f").mkString(", ") +
      f" b0=${gd.intercepts.last(0)}%.4f")

    // same fit, local backend — must agree
    val t1 = System.nanoTime()
    val gl = Slope.fit(li, "features", "label",
      SlopeParams(family = "gaussian", nSigma = 30))
    val dmax = gd.coefs.last.zip(gl.coefs.last).map { case (a, b) => math.abs(a - b) }.max
    println(f"[local gaussian]       steps=${gl.nSteps} " +
      f"devRatioLast=${gl.devianceRatios.last}%.4f " +
      f"time=${(System.nanoTime() - t1) / 1e9}%.1fs  maxCoefDiffVsDistributed=$dmax%.2e")

    // binomial on returnflag (A vs not-A), distributed
    val bi = li.withColumn("label", when(col("l_returnflag") === "A", "A").otherwise("other"))
    val t2 = System.nanoTime()
    val bd = Slope.fit(bi, "features", "label",
      SlopeParams(family = "binomial", nSigma = 15, localCellLimit = 0))
    println(f"[distributed binomial] steps=${bd.nSteps} classes=${bd.classNames.mkString("/")} " +
      f"devRatioLast=${bd.devianceRatios.last}%.4f time=${(System.nanoTime() - t2) / 1e9}%.1fs")

    // multinomial on returnflag (3 classes), local
    val mu = li.withColumn("label", col("l_returnflag"))
    val md = Slope.fit(mu, "features", "label",
      SlopeParams(family = "multinomial", nSigma = 10))
    println(f"[local multinomial]    steps=${md.nSteps} classes=${md.classNames.mkString("/")} " +
      f"devRatioLast=${md.devianceRatios.last}%.4f")

    spark.stop()
  }
}
