package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Micro-probe: which sub-plan of embeddingCandidates burns the CPU. */
object EmbProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$tag rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val base = emb.repartition(32).select(col("vec_id").as("id"),
      VectorFunctions.normalize(col("embedding")).as("v"),
      col("embedding").as("__raw"))
    time("1 normalize-only")(base)
    val banded = base.select(col("id"), col("v"),
      explode(array((0 until 16).map(b => struct(lit(b).as("band"),
        VectorFunctions.hyperplaneBucket(col("__raw"), 64, 6, 42L + b)
          .as("bucket"))): _*)).as("bk"))
      .select(col("id"), col("v"), col("bk.band"), col("bk.bucket"))
    time("2 banded")(banded)
    val noV = base.select(col("id"),
      explode(array((0 until 16).map(b => struct(lit(b).as("band"),
        VectorFunctions.hyperplaneBucket(col("__raw"), 64, 6, 42L + b)
          .as("bucket"))): _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bucket"))
    time("3 banded-no-v")(noV)
    val parted = banded.repartition(col("band"), col("bucket"))
    time("4 parted")(parted)
    println(banded.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
