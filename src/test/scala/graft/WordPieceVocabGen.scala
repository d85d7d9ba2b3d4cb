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
    // alphabet derivation + rendering live in the PRODUCTION export
    // surface (graft.sources.TokenizerArtifacts) — one definition for
    // the committed vocab and the writeWordPiece engine operator
    val alphabet = graft.sources.TokenizerArtifacts
      .wordPieceAlphabet(docs, "text")
    val merges = graft.operators.Tokenizer.trainWordPiece(docs, "text", nMerges)
    val out = java.nio.file.Paths.get(
      "src/main/resources/graft/wordpiece_vocab.txt")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      graft.sources.TokenizerArtifacts.renderWordPieceVocab(alphabet, merges))
    println(s"[wordpiece] ${alphabet.size} alphabet symbols + " +
      s"${merges.size} merges -> $out")
    spark.stop()
  }
}
