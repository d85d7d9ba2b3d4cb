package graft.slope
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(array(col("l_quantity"), col("l_discount"), col("l_tax")).as("features"),
        when(col("l_returnflag") === "A", "A").otherwise("other").as("label"))
    val t0 = System.nanoTime()
    val m = Slope.fit(li, "features", "label",
      SlopeParams(family = "binomial", nSigma = 12))
    println(f"fit time ${(System.nanoTime()-t0)/1e9}%.1fs steps=${m.nSteps}")
    println("passes per step: " + m.passes.mkString(", "))
    println("devratio: " + m.devianceRatios.map(d => f"$d%.5f").mkString(", "))
    spark.stop()
  }
}
