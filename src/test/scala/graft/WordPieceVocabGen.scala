package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time offline generator for the committed WordPiece vocab:
  * alphabet (every initial / `##`-continuation single-character symbol
  * seen in the corpus) plus the merge results of the DISTRIBUTED
  * trainer ([[graft.operators.Tokenizer.trainWordPiece]]) on the
  * sf0.01 fixture corpus, written sorted to
  * src/main/resources/graft/wordpiece_vocab.txt. Deterministic —
  * rerunning on the same corpus reproduces the committed file
  * byte-for-byte (likelihood-score argmax ties break
  * lexicographically in the trainer).
  *
  * Usage: Test/runMain graft.WordPieceVocabGen [corpusDir] [nMerges]
  */
object WordPieceVocabGen {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nMerges = if (args.length > 1) args(1).toInt else 160
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // alphabet: the distinct single-char symbols of the INITIAL
    // segmentation — bare first characters, ##-prefixed continuations
    // (a symbol-count aggregate over the distinct-word table; tiny)
    val alphabet = docs
      .select(explode(TextFunctions.normalizedWords(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .select(explode(expr(
        "transform(sequence(1, length(w)), i -> CASE WHEN i = 1" +
          " THEN substring(w, 1, 1)" +
          " ELSE concat('##', substring(w, i, 1)) END)")).as("s"))
      .distinct().collect().map(_.getString(0)).toSeq
    val merges = graft.operators.Tokenizer.trainWordPiece(docs, "text", nMerges)
    val pieces = (alphabet ++
      merges.map { case (a, b) => a + b.substring(2) }).distinct.sorted
    val out = java.nio.file.Paths.get(
      "src/main/resources/graft/wordpiece_vocab.txt")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (pieces.mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"[wordpiece] ${alphabet.size} alphabet symbols + " +
      s"${merges.size} merges -> ${pieces.size} pieces -> $out")
    spark.stop()
  }
}
