package graft
import org.apache.spark.sql.SparkSession
object DistCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("q_slope_fit_dist", "q_slope_binom_dist", "q_slope_cv_dist")) {
      val rows = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").collect()
      val allTrue = rows.forall(r => r.getBoolean(1))
      println(s"[distcheck] $q rows=${rows.length} allTrue=$allTrue")
    }
    spark.stop()
  }
}
