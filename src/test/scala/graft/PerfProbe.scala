package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the expensive bench queries (test scope). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[probe] docs=${docs.count()}")

    import graft.functions.TextFunctions._
    val sh = docs.select(col("doc_id").as("id"),
      normalizedWords(col("text")).as("__w"))
      .select(col("id"), array_distinct(shinglesFromWords(col("__w"), 3)).as("sh"))
      .select(col("id"), explode(col("sh")).as("s"))
    println("[probe] exploded rows=" + time("explode count")(sh.count()))
    val dfStats = sh.groupBy("s").count()
    time("df stats") {
      dfStats.agg(count(lit(1)).as("n_shingles"), max("count").as("max_df"),
        sum(col("count") * col("count")).as("sum_df2"),
        sum(when(col("count") <= 1000, col("count") * col("count"))
          .otherwise(0L)).as("sum_df2_capped"))
        .show(false)
    }
    // candidate volume by df decile
    dfStats.select(col("count").as("df"))
      .groupBy(ceil(log2(col("df"))).as("log2df"))
      .agg(count(lit(1)).as("n"), sum(col("df") * col("df")).as("pairs"))
      .orderBy("log2df").show(30, false)

    time("pairs maxDf=1000 count") {
      println("pairs=" + Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.05, maxDf = 1000).count())
    }
    time("pairs unbounded count") {
      println("pairs=" + Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.05, maxDf = Int.MaxValue).count())
    }
    time("pairs maxDf=1000 again") {
      println("pairs=" + Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.05, maxDf = 1000).count())
    }
    spark.stop()
  }
}
