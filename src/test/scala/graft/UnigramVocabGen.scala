package graft

import org.apache.spark.sql.SparkSession

/** One-time offline generator for the committed unigram-LM model:
  * the distributed hard-EM trainer
  * ([[graft.operators.Tokenizer.trainUnigram]]) on the sf0.01 fixture
  * corpus, written as `piece\tcostQ` lines (sorted by piece) to
  * src/main/resources/graft/unigram_vocab.tsv. Deterministic —
  * rerunning on the same corpus reproduces the committed file
  * byte-for-byte.
  *
  * Usage: Test/runMain graft.UnigramVocabGen [corpusDir] [vocabSize]
  */
object UnigramVocabGen {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val vocabSize = if (args.length > 1) args(1).toInt else 300
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = graft.operators.Tokenizer.trainUnigram(
      docs, "text", vocabSize = vocabSize, maxPieceLen = 6, emRounds = 2)
    val out = java.nio.file.Paths.get(
      "src/main/resources/graft/unigram_vocab.tsv")
    java.nio.file.Files.createDirectories(out.getParent)
    // rendering lives in the PRODUCTION export surface (one
    // definition with the writeUnigram engine operator); trainUnigram
    // already returns piece-sorted, which renderUnigramTsv re-asserts
    java.nio.file.Files.write(out,
      graft.sources.TokenizerArtifacts.renderUnigramTsv(model))
    println(s"[unigram] ${model.size} pieces -> $out")
    spark.stop()
  }
}
