package graft

import graft.functions.{Subword, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time offline trainer for the committed subword vocab: BPE
  * merges over the sf0.01 fixture corpus's word frequencies, written
  * to src/main/resources/graft/subword_vocab.txt (sorted, one piece
  * per line). Deterministic — rerunning on the same corpus reproduces
  * the committed file byte-for-byte (ties break lexicographically in
  * Subword.train).
  *
  * Usage: Test/runMain graft.SubwordTrainMain [corpusDir] [nMerges]
  */
object SubwordTrainMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nMerges = if (args.length > 1) args(1).toInt else 256
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // word-frequency map: vocabulary-sized (distinct normalized words),
    // not corpus-sized — gated so an accidental huge corpus fails loudly
    // instead of collecting gigabytes to the driver
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(TextFunctions.normalizedWords(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
    val nDistinct = counts.count()
    require(nDistinct <= 200000,
      s"$nDistinct distinct words — too many for offline driver training")
    val wordCounts = counts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val pieces = Subword.train(wordCounts, nMerges)
    val out = java.nio.file.Paths.get(
      "src/main/resources/graft/subword_vocab.txt")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (pieces.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"[subword] trained ${pieces.size} pieces from $nDistinct " +
      s"distinct words -> $out")
    spark.stop()
  }
}
