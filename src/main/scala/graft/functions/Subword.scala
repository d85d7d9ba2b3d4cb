package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic subword tokenization for the packing / length-stats
  * operators — the BPE-flavored sibling of [[TextFunctions.wsTokenCount]].
  * A real pretraining pipeline packs subword tokens, not whitespace
  * words (counts differ 1.3-1.7×, which shifts every offset and
  * straddle statistic), so the packing operators accept a token-count
  * column and this module supplies a subword one that is exactly
  * reproducible in any engine.
  *
  * Two deterministic halves:
  *
  *  - TRAINING ([[train]]): classic byte-pair-encoding merges over a
  *    word-frequency map — repeatedly merge the most frequent adjacent
  *    symbol pair, ties broken lexicographically, so the same corpus
  *    always yields the same vocab. The committed vocab
  *    (`graft/subword_vocab.txt`, one piece per line) was trained by
  *    `graft.SubwordTrainMain` on the sf0.01 fixture corpus.
  *
  *  - APPLICATION ([[subwordTokenCount]]): greedy longest-match
  *    (WordPiece-style) against the vocab, single-character fallback.
  *    Longest-match rather than merge-order replay because it is a
  *    pure function of (word, vocab-as-set) — expressible as a
  *    recursive CTE in the SQL oracle, where merge-order replay (an
  *    order-dependent loop over the merge list) is not. Both halves
  *    are deterministic; together they give subword counts that any
  *    engine can recompute bit-exactly.
  *
  * Scale shape: the counter is a Scala UDF over the already-normalized
  * word array. A UDF (not a built-in chain) because data-dependent
  * longest-match needs a loop no SQL expression provides; it stays
  * cheap — the vocab is a few hundred interned strings on each
  * executor (lazy val, loaded from the classpath once per JVM, never
  * shipped per-task) and the match is O(word_len · max_piece_len) with
  * zero allocation per step. The UDF breaks whole-stage codegen for
  * its one projection, the documented price of a real tokenizer. */
object Subword {

  /** Classpath location of the committed vocab (one piece per line). */
  val VocabResource = "/graft/subword_vocab.txt"

  /** The committed vocab as a set; pieces are all length >= 2 (single
    * characters are the implicit fallback, never stored). */
  lazy val vocab: Set[String] = loadResource(VocabResource)

  private lazy val maxPieceLen: Int =
    if (vocab.isEmpty) 0 else vocab.iterator.map(_.length).max

  private[graft] def loadResource(path: String): Set[String] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"vocab resource $path not on classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.length >= 2).toSet
    finally in.close()
  }

  /** Greedy longest-match segment count of one word: at each position
    * take the longest vocab piece matching there (min length 2), else
    * consume one character; count segments. Pure function of
    * (word, pieces) — the SQL oracle replays it with a recursive CTE. */
  def segmentCount(word: String, pieces: Set[String], maxLen: Int): Int = {
    var pos = 0
    var n = 0
    while (pos < word.length) {
      var step = 1
      var l = math.min(maxLen, word.length - pos)
      while (l >= 2 && step == 1) {
        if (pieces.contains(word.substring(pos, pos + l))) step = l
        l -= 1
      }
      pos += step
      n += 1
    }
    n
  }

  /** Subword token count of a text column: normalize (same chain as
    * every text operator), split to words, sum greedy segment counts.
    * Empty/blank text counts 0. */
  def subwordTokenCount(c: Column): Column = {
    val counter = udf { words: Seq[String] =>
      if (words == null) 0L
      else {
        val v = vocab
        val ml = maxPieceLen
        var s = 0L
        words.foreach { w =>
          if (w != null && w.nonEmpty) s += segmentCount(w, v, ml)
        }
        s
      }
    }
    counter(TextFunctions.normalizedWords(c))
  }

  /** The vocab as a deterministic sorted list — for building the SQL
    * oracle's inline VALUES table. */
  def vocabSorted: Seq[String] = vocab.toSeq.sorted

  /** Deterministic BPE training: `nMerges` rounds of merging the most
    * frequent adjacent symbol pair across the word-frequency map
    * (frequencies weight by word count; ties break on the
    * lexicographically smallest pair). Returns the merge results — the
    * vocab pieces — in merge order. Driver-side by design: training is
    * a one-time offline step over a word-frequency map that is
    * vocabulary-sized, never corpus-sized. */
  def train(wordCounts: Map[String, Long], nMerges: Int): Seq[String] = {
    require(nMerges >= 1)
    var words: Vector[(Vector[String], Long)] =
      wordCounts.toVector.sortBy(_._1)
        .map { case (w, c) => w.map(_.toString).toVector -> c }
    val merges = Vector.newBuilder[String]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val pairCounts =
        scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val (bestPair, _) = pairCounts.reduceLeft { (a, b) =>
          if (b._2 > a._2 ||
            (b._2 == a._2 &&
              (b._1._1 < a._1._1 ||
                (b._1._1 == a._1._1 && b._1._2 < a._1._2)))) b
          else a
        }
        val merged = bestPair._1 + bestPair._2
        merges += merged
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 &&
              syms(i) == bestPair._1 && syms(i + 1) == bestPair._2) {
              out += merged
              i += 2
            } else {
              out += syms(i)
              i += 1
            }
          }
          (out.result(), c)
        }
        m += 1
      }
    }
    merges.result().distinct
  }
}
