package graft

import org.apache.spark.sql.SparkSession

/** Run a subset of bench queries N times each (test scope) — isolates
  * real regressions from noisy-neighbor variance. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q_dedup_exact", "q_minhash_dedup", "q_diagnostics")
    val reps = if (args.length > 1) args(1).toInt else 2
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"[bench1] $name%-24s rep$r ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    spark.stop()
  }
}
