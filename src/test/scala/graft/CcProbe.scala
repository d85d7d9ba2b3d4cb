package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Ad-hoc timing split for q_dup_clusters: pairing vs CC (test scope). */
object CcProbe {
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
    for (rep <- 1 to 3) {
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.05, maxDf = 1000)
      val cached = pairs.persist(StorageLevel.MEMORY_AND_DISK)
      val n = time(s"rep$rep pairing")(cached.count())
      println(s"[probe] rep$rep pairs=$n")
      val cc = time(s"rep$rep cc")(Dedup.dupClusters(cached).count())
      println(s"[probe] rep$rep cc rows=$cc")
      cached.unpersist()
    }
    spark.stop()
  }
}
