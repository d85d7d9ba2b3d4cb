package graft.slope

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: where q_slope_fit-class queries spend their driver
  * time — collect vs toVec vs content sort vs the solver itself. */
object SlopePrepProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val sel = li.select(
      array(Seq("l_quantity", "l_discount", "l_tax").map(col): _*)
        .cast("array<double>").as("f"),
      (col("l_quantity") * 2.0 + col("l_discount") * (-30.0) +
        col("l_tax") * 5.0 + col("l_extendedprice") / 30000.0)
        .cast("double").as("l"))
    for (rep <- 1 to 3) {
      var t0 = System.nanoTime()
      val rows = sel.collect()
      val tCollect = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val xs = new Array[org.apache.spark.ml.linalg.Vector](rows.length)
      val rawY = new Array[Any](rows.length)
      var i = 0
      while (i < rows.length) {
        xs(i) = org.apache.spark.ml.linalg.Vectors.dense(
          rows(i).getSeq[Double](0).toArray)
        rawY(i) = rows(i).get(1); i += 1
      }
      val tVec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      Slope.sortRowsInPlace(xs, rawY)
      val tSort = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val m = Slope.fitLocal(xs, rawY,
        SlopeParams(family = "gaussian", nSigma = 40))
      val tFit = (System.nanoTime() - t0) / 1e9
      println(f"rep$rep n=${rows.length} collect=$tCollect%.2f vec=$tVec%.2f " +
        f"sort=$tSort%.2f fit=$tFit%.2f (steps=${m.nSteps})")
    }
    spark.stop()
  }
}
