package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Ad-hoc probe: q_token_budget cost with vs without the eager
  * localCheckpoint (r9 regression hunt). Not part of the artifact. */
object TokenBudgetProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def featurized = docs.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("__quality"),
      TextFunctions.wsTokenCount(col("text")).cast("int").as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def run(tag: String)(body: => Long): Unit = {
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = body
        println(f"[probe] $tag rep$rep ${(System.nanoTime() - t0) / 1e9}%6.2fs n=$n")
      }
    }
    // warm
    val w = featurized
    graft.operators.Sampling
      .tokenBudgetFilter(w, "doc_id", "__quality", "n_tokens", 15000L).count()
    w.unpersist()
    run("no_ckpt") {
      val d = featurized
      val n = graft.operators.Sampling
        .tokenBudgetFilter(d, "doc_id", "__quality", "n_tokens", 15000L)
        .select(col("doc_id"), col("__quality").as("quality"),
          col("n_tokens"), col("cum_tokens"))
        .orderBy("doc_id").count()
      d.unpersist(); n
    }
    run("ckpt") {
      val d = featurized
      val out = graft.operators.Sampling
        .tokenBudgetFilter(d, "doc_id", "__quality", "n_tokens", 15000L)
        .select(col("doc_id"), col("__quality").as("quality"),
          col("n_tokens"), col("cum_tokens"))
        .orderBy("doc_id").localCheckpoint(true)
      d.unpersist(); out.count()
    }
    spark.stop()
  }
}
