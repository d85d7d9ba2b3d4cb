package graft.functions

import graft.slope.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece segmentation semantics (the BERT discipline) — the three
  * properties that distinguish it from the flat-vocab greedy
  * [[Subword]]: `##` continuation asymmetry, whole-word [UNK] on any
  * stall, and longest-match-first at each position. */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def count(word: String, vocab: Set[String]): Int = {
    val ml = if (vocab.isEmpty) 0
    else vocab.iterator.map(p =>
      if (p.startsWith("##")) p.length - 2 else p.length).max
    WordPiece.segmentCount(word, vocab, ml)
  }

  test("greedy longest-match with continuation pieces") {
    val v = Set("un", "##able", "##a", "##b", "##l", "##e", "a", "u", "##n")
    // longest continuation wins: un + ##able = 2, not un+##a+##b+##l+##e
    assert(count("unable", v) == 2)
    // initial piece must be an INITIAL form: "able" is not in the
    // vocab unprefixed, so 'a' + ##b + ##l + ##e
    assert(count("able", v) == 4)
  }

  test("the same surface string is initial and continuation independently") {
    // "ab" exists ONLY as an initial piece; at position > 0 it cannot
    // match even though the characters are present
    val v = Set("ab", "x", "##a", "##b")
    assert(count("ab", v) == 1) // initial "ab"
    assert(count("xab", v) == 3) // x + ##a + ##b (no ##ab)
  }

  test("a stall ANYWHERE folds the whole word to one [UNK]") {
    val v = Set("a", "##b")
    assert(count("ab", v) == 2)
    assert(count("abz", v) == 1) // stalls at z => [UNK], not a+##b+?
    assert(count("za", v) == 1) // stalls at position 0
  }

  test("empty words count 0; array kernel sums per word") {
    val df = spark.range(1).select(
      WordPiece.wordPieceTokenCount(lit("")).as("e"),
      WordPiece.wordPieceTokenCount(lit(null.asInstanceOf[String])).as("n"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
  }

  test("committed vocab: counting projection stays inside codegen") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        WordPiece.wordPieceTokenCount(col("text")).as("wp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      s"wordpiece counting must be codegen'd, plan:\n$plan")
    assert(df.filter(col("wp") > 0).count() > 0)
  }

  test("split-set fast path == generic segmentCount on the fixture") {
    // countArray probes pre-split initial/continuation sets; the
    // generic segmentCount concatenates "##" per probe — they must
    // agree word for word (doc totals via the expression vs per-word
    // generic sums)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val ml = WordPiece.vocabSorted.map(p =>
      if (p.startsWith("##")) p.length - 2 else p.length).max
    val rows = docs.select(
      TextFunctions.normalizedWords(col("text")).as("ws"),
      WordPiece.wordPieceTokenCount(col("text")).as("wp"))
      .collect()
    rows.foreach { r =>
      val expected = r.getSeq[String](0).filter(_.nonEmpty)
        .map(WordPiece.segmentCount(_, WordPiece.vocab, ml).toLong).sum
      assert(r.getLong(1) == expected)
    }
  }

  test("committed vocab segments the fixture corpus without [UNK]") {
    // the committed vocab carries the corpus's full initial/continuation
    // alphabet, so every normalized word must segment (UNK would mean
    // the alphabet derivation dropped a symbol); counts bound tokens
    // per word by its length
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs
      .select(explode(TextFunctions.normalizedWords(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().collect().map(_.getString(0))
    val ml = WordPiece.vocabSorted.map(p =>
      if (p.startsWith("##")) p.length - 2 else p.length).max
    words.foreach { w =>
      val n = WordPiece.segmentCount(w, WordPiece.vocab, ml)
      assert(n >= 1 && n <= w.length, s"$w -> $n")
      // no-UNK: a 1-token result for a multi-char word must be a real
      // vocab piece, not the UNK fold
      if (n == 1 && w.length > 1)
        assert(WordPiece.vocab.contains(w), s"$w folded to UNK")
    }
  }
}
