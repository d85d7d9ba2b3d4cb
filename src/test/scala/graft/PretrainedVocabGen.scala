package graft

import graft.functions.{Subword, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time offline generator for the committed PRETRAINED-tokenizer
  * fixture (`src/main/resources/graft/pretrained/{merges.txt,
  * vocab.json}`) in the GPT-2 byte-level-BPE file formats: merges.txt
  * is "#version: 0.2" then one "left right" pair per line in merge
  * order; vocab.json is a {"token": id} object. Deterministic — BPE
  * training ties break lexicographically, ids are assigned in a fixed
  * order — so rerunning reproduces the committed files byte-for-byte.
  *
  * The vocab deliberately exercises every branch of
  * [[Subword.normalizePiece]]: word-initial tokens carry the GPT-2
  * leading-space marker 'Ġ' (stripped on load), byte-level singles and
  * specials like &lt;|endoftext|&gt; are present (dropped: length/
  * alphabet filters), and each merge result also appears unmarked.
  *
  * Usage: Test/runMain graft.PretrainedVocabGen [corpusDir] [nMerges]
  */
object PretrainedVocabGen {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    // 48 merges (not SubwordTrainMain's 256): the fixture corpus has
    // only ~31 distinct words, so full training converges to the SAME
    // piece set as the committed subword vocab — a smaller cap keeps
    // the pretrained segmentation genuinely different
    val nMerges = if (args.length > 1) args(1).toInt else 48
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(TextFunctions.normalizedWords(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
    val nDistinct = counts.count()
    require(nDistinct <= 200000,
      s"$nDistinct distinct words — too many for offline driver training")
    val wordCounts = counts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = Subword.trainMerges(wordCounts, nMerges)

    val outDir = java.nio.file.Paths.get("src/main/resources/graft/pretrained")
    java.nio.file.Files.createDirectories(outDir)

    // merges.txt: GPT-2 line format. The first symbol of a word-initial
    // merge carries Ġ in real GPT-2 files; emit the Ġ-variant alongside
    // the bare pair for the first 32 merges so the loader's marker
    // stripping is exercised by the committed fixture itself.
    val mergeLines = Seq("#version: 0.2") ++
      merges.map { case (a, b) => s"$a $b" } ++
      merges.take(32).map { case (a, b) => s"Ġ$a $b" }
    java.nio.file.Files.write(outDir.resolve("merges.txt"),
      (mergeLines.mkString("\n") + "\n").getBytes("UTF-8"))

    // vocab.json: specials + byte-level singles + each merge result,
    // with a Ġ-marked (word-initial) variant per result — ids dense in
    // a fixed order, exactly the GPT-2 layout
    val specials = Seq("<|endoftext|>", "Ġ", "Ċ", "!", ".", ",")
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val results = merges.map { case (a, b) => a + b }.distinct
    val tokens = (specials ++ singles ++
      results.flatMap(r => Seq(r, s"Ġ$r"))).distinct
    def jq(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case ch => ch.toString
    } + "\""
    val vocabJson = tokens.zipWithIndex
      .map { case (t, i) => s"${jq(t)}: $i" }
      .mkString("{\n  ", ",\n  ", "\n}\n")
    java.nio.file.Files.write(outDir.resolve("vocab.json"),
      vocabJson.getBytes("UTF-8"))

    println(s"[pretrained] ${merges.size} merges, ${tokens.size} vocab " +
      s"tokens from $nDistinct distinct words -> $outDir")
    spark.stop()
  }
}
