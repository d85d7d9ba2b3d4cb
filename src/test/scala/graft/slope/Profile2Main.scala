package graft.slope
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile2Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
      array(col("l_quantity"), col("l_discount"), col("l_tax")).as("features"),
      (col("l_quantity")*2.0 + col("l_discount")*(-30.0) + col("l_tax")*5.0 +
        col("l_extendedprice")/30000.0).as("label"))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val m = Slope.fit(df, "features", "label", SlopeParams(family="gaussian", nSigma=40))
      println(f"fit $i: ${(System.nanoTime()-t0)/1e9}%.1fs steps=${m.nSteps} passes=${m.passes.sum}")
    }
    spark.stop()
  }
}
