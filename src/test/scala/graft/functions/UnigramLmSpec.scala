package graft.functions

import graft.slope.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM (SentencePiece-discipline) Viterbi segmentation — the
  * properties that make it the fourth family: global optimality over
  * all segmentations, exact integer costs, fewest-tokens tie-break,
  * whole-word [UNK]. */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def count(w: String, m: Map[String, Long]): Int =
    UnigramLm.segmentCount(w, m, if (m.isEmpty) 0 else m.keys.map(_.length).max)
  private def pieces(w: String, m: Map[String, Long]): Seq[String] =
    UnigramLm.segmentPieces(w, m, if (m.isEmpty) 0 else m.keys.map(_.length).max)

  test("Viterbi is globally optimal, not greedy") {
    // greedy longest-match would take 'ba' (1 token, cost 100);
    // Viterbi takes b+a (cost 20)
    val m = Map("a" -> 10L, "b" -> 10L, "ba" -> 100L)
    assert(count("ba", m) == 2)
    assert(pieces("ba", m) == Seq("b", "a"))
    // and when the long piece IS cheaper, it wins
    val m2 = Map("a" -> 10L, "b" -> 10L, "ba" -> 15L)
    assert(count("ba", m2) == 1)
    assert(pieces("ba", m2) == Seq("ba"))
  }

  test("optimal split is not prefix-greedy") {
    // 'abab' with ab=15: ab+ab = 30 beats a+b+a+b = 40 and abab = 40
    val m = Map("a" -> 10L, "b" -> 10L, "ab" -> 15L, "abab" -> 40L)
    assert(count("abab", m) == 2)
    assert(pieces("abab", m) == Seq("ab", "ab"))
  }

  test("equal-cost tie breaks to the fewest tokens") {
    // 'ab' as one piece costs 20; a+b also costs 20 -> 1 token wins
    val m = Map("a" -> 10L, "b" -> 10L, "ab" -> 20L)
    assert(count("ab", m) == 1)
    assert(pieces("ab", m) == Seq("ab"))
  }

  test("uncoverable words fold to one [UNK]; empties count 0") {
    val m = Map("a" -> 10L, "b" -> 10L)
    assert(count("az", m) == 1)
    assert(pieces("az", m).isEmpty) // the E-step skips UNK words
    assert(count("", m) == 0)
    val df = spark.range(1).select(
      UnigramLm.unigramTokenCount(lit("")).as("e"),
      UnigramLm.unigramTokenCount(lit(null.asInstanceOf[String])).as("n"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
  }

  test("segmentPieces length == segmentCount for coverable words") {
    val m = Map("a" -> 7L, "b" -> 9L, "ab" -> 12L, "ba" -> 14L,
      "aa" -> 11L, "aba" -> 25L)
    val words = Seq("a", "ab", "ba", "aab", "abab", "aaaa", "babab")
    words.foreach { w =>
      assert(pieces(w, m).mkString("") == w, s"coverage of $w")
      assert(pieces(w, m).length == count(w, m), s"count of $w")
    }
  }

  test("committed model: codegen projection, full fixture coverage") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        UnigramLm.unigramTokenCount(col("text")).as("uni"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      s"unigram counting must be codegen'd, plan:\n$plan")
    assert(df.filter(col("uni") > 0).count() > 0)
    // single chars always survive training, so every training-corpus
    // word segments (no [UNK] on the fixture): unigram count <= word
    // character count, >= ws token count per doc
    val both = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(
        TextFunctions.wsTokenCount(col("text")).cast("long").as("ws"),
        UnigramLm.unigramTokenCount(col("text")).as("uni"),
        length(regexp_replace(TextFunctions.normalizeText(col("text")),
          " ", "")).cast("long").as("chars"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0), "at least one token per word")
      assert(r.getLong(1) <= r.getLong(2) || r.getLong(2) == 0,
        "at most one token per char")
    }
  }
}
