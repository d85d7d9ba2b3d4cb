package graft.operators

import graft.slope.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 retrieval + cross-doc span stats vs hand-computed oracles. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25: exact score vs hand computation, tf ordering") {
    // 4 docs, terms {fox}: df=3, N=4, dl = 4/4/4/2, avgdl = 3.5
    val corpus = Seq(
      1L -> "fox fox jumps high", //   tf=2
      2L -> "fox jumps very high", //  tf=1
      3L -> "dog naps all day", //     tf=0 -> absent
      4L -> "fox fox") //              tf=2, shorter doc
    val out = Retrieval.bm25TopK(docsDf(corpus), "doc_id", "text",
      Seq("fox"), topK = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 4L), s"docs without the term: $out")
    def bm25(tf: Double, dl: Double): Double = {
      val idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
      val k1 = 1.2; val b = 0.75
      idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 3.5))
    }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1L) == r6(bm25(2, 4)), s"${out(1L)} vs ${bm25(2, 4)}")
    assert(out(2L) == r6(bm25(1, 4)))
    assert(out(4L) == r6(bm25(2, 2)))
    // same tf, shorter doc scores higher; higher tf beats lower
    assert(out(4L) > out(1L) && out(1L) > out(2L))
  }

  test("bm25: multi-term sum, topK cut, n_terms_hit") {
    val corpus = Seq(
      1L -> "alpha beta gamma",
      2L -> "alpha alpha delta",
      3L -> "beta beta beta",
      4L -> "epsilon zeta eta")
    val rows = Retrieval.bm25TopK(docsDf(corpus), "doc_id", "text",
      Seq("alpha", "beta"), topK = 2).collect()
    assert(rows.length == 2)
    // doc 1 hits both terms
    val byId = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId.get(1L).contains(2L), s"n_terms_hit: ${byId}")
  }

  test("crossDocSpanStats: exact positions, coverage, intra-doc immune") {
    // docs 1 and 2 share the 5-gram "a b c d e" (doc1 pos 1, doc2 pos 3);
    // doc 3 repeats ITS OWN phrase twice but shares nothing -> absent;
    // doc 4 shares nothing -> absent
    val corpus = Seq(
      1L -> "a b c d e x y z w q", //     10 words, shingle pos 1 dup
      2L -> "p q2 a b c d e r s t", //    10 words, shingle pos 3 dup
      3L -> "m n o u v m n o u v", //     intra-doc repeat only
      4L -> "one two three four five six")
    val out = Retrieval.crossDocSpanStats(docsDf(corpus), "doc_id", "text",
      n = 5, minDocs = 2).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(out.keySet == Set(1L, 2L), s"got: $out")
    // 10 words -> 6 positions; 1 dup position covers 5 words
    assert(out(1L) == ((6, 1L, 5L, 0.166667)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((6, 1L, 5L, 0.166667)), s"doc2: ${out(2L)}")
  }

  test("crossDocSpanStats: overlapping dup spans merge in coverage") {
    // docs share a 6-word run -> two overlapping 5-gram positions,
    // covered words = 6 (union), not 10
    val corpus = Seq(
      1L -> "a b c d e f x y z w", //  positions 1,2 dup
      2L -> "a b c d e f p q r s")
    val out = Retrieval.crossDocSpanStats(docsDf(corpus), "doc_id", "text",
      n = 5, minDocs = 2).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 6L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((2L, 6L)))
  }

  test("rrfFuse: closed-form scores, missing-system ranks null") {
    import spark.implicits._
    // system A ranks docs 1,2,3; system B ranks 2,3,4 — doc 2 fused
    // score is 1/61 + 1/62; doc 1 only in A; doc 4 only in B
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), kRrf = 60)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), Option(r.get(2)), Option(r.get(3))))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(1L) == ((r6(1.0 / 61), Some(1), None)))
    assert(got(2L) == ((r6(1.0 / 62 + 1.0 / 61), Some(2), Some(1))))
    assert(got(3L) == ((r6(1.0 / 63 + 1.0 / 62), Some(3), Some(2))))
    assert(got(4L) == ((r6(1.0 / 63), None, Some(3))))
  }

  test("crossDocSpanStats: short docs dedup as whole-text shingles") {
    val corpus = Seq(
      1L -> "tiny doc", // <= n words: whole text is the one shingle
      2L -> "tiny doc",
      3L -> "other short")
    val out = Retrieval.crossDocSpanStats(docsDf(corpus), "doc_id", "text",
      n = 5, minDocs = 2).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L))
    // 1 position, both words covered
    assert(out.forall(r => r.getInt(1) == 1 && r.getLong(2) == 1L &&
      r.getLong(3) == 2L && r.getDouble(4) == 1.0))
  }

  test("exactSubstrSpans: planted 60-word span recovered at exact boundaries") {
    // doc A and doc B share words 21..80 of A verbatim (A: 120 words,
    // B: the 60 shared + 40 own); everything else is unique
    def wv(tag: String, n: Int) = (1 to n).map(i => s"$tag$i")
    val shared = wv("s", 60)
    val a = wv("a", 20) ++ shared ++ wv("z", 40)
    val b = wv("b", 15) ++ shared ++ wv("y", 25)
    val out = Retrieval.exactSubstrSpans(
      docsDf(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" "))),
      "doc_id", "text", n = 5, minSpanWords = 50).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4))).sortBy(x => (x._1, x._2))
    // A: shingle positions 21..76 duplicated -> span words 21..80;
    // B: positions 16..71 -> words 16..75; both exactly 60 words, 2 docs
    assert(out.toSeq == Seq((1L, 21, 80, 60, 2L), (2L, 16, 75, 60, 2L)),
      s"got ${out.toSeq}")
  }

  test("exactSubstrSpans: overlapping spans split at partner-set boundaries") {
    // A(150 words): words 21..80 shared with B, words 61..120 shared
    // with C — the overlap 61..80 is shared with BOTH, so A must emit
    // THREE spans split exactly at the partner-set changes
    def wv(tag: String, n: Int) = (1 to n).map(i => s"$tag$i")
    val sb = wv("m", 40) // 21..60: A+B only
    val so = wv("o", 20) // 61..80: A+B+C
    val sc = wv("c", 40) // 81..120: A+C only
    val a = wv("a", 20) ++ sb ++ so ++ sc ++ wv("z", 30)
    val b = wv("b", 10) ++ sb ++ so ++ wv("y", 10)
    val c = wv("q", 10) ++ so ++ sc ++ wv("x", 10)
    val got = Retrieval.exactSubstrSpans(
      docsDf(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" "),
        3L -> c.mkString(" "))),
      "doc_id", "text", n = 5, minSpanWords = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(4)))
      .sortBy(x => (x._1, x._2))
    val aSpans = got.filter(_._1 == 1L)
    // boundary math: a 5-gram at position p is {A,B}-shared while it
    // stays inside 21..80 and outside C's 61..120 start window, so the
    // islands split at p=57 ({A,B} -> {A,B,C}) and p=77 ({A,B,C} ->
    // {A,C}); spans re-extend by n-1 words at their right edge
    assert(aSpans.length == 3, s"A must split into 3 spans: ${got.toSeq}")
    assert(aSpans.map(_._4).toSeq == Seq(2L, 3L, 2L),
      s"partner counts must be 2/3/2: $aSpans")
    // spans tile A's duplicated region contiguously at exact bounds
    assert(aSpans.head._2 == 21 && aSpans.last._3 == 120, s"$aSpans")
    // every span's text is genuinely shared: the {A,B} span ends
    // before C's region fully starts, the {A,C} span starts after B's
    // region ends
    val Seq(s1, s2, s3) = aSpans.toSeq
    assert(s1._3 < 85 && s2._2 > 50 && s2._3 < 85 && s3._2 > 55,
      s"$aSpans")
    // intra-doc repetition alone never creates a span
    val solo = wv("r", 30) ++ wv("r", 30) ++ wv("u", 40)
    val none = Retrieval.exactSubstrSpans(
      docsDf(Seq(9L -> solo.mkString(" "), 10L -> wv("w", 50).mkString(" "))),
      "doc_id", "text", n = 5, minSpanWords = 10).collect()
    assert(none.isEmpty, s"intra-doc repeats must not span: ${none.toSeq}")
  }

  test("exactSubstrDedup: non-owners lose the span, the owner keeps it, short dups survive") {
    def wv(tag: String, n: Int) = (1 to n).map(i => s"$tag$i")
    val shared = wv("s", 60)
    val shortDup = wv("d", 8) // 8 words < minSpanWords -> never removed
    val a = wv("a", 20) ++ shared ++ wv("z", 10)          // owner (min id)
    val b = wv("b", 5) ++ shared ++ shortDup ++ wv("y", 5)
    val c = wv("c", 10) ++ shortDup                        // shares only short
    val out = Retrieval.exactSubstrDedup(
      docsDf(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" "),
        3L -> c.mkString(" "))),
      "doc_id", "text", n = 5, minSpanWords = 50).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // owner keeps everything
    assert(out(1L) == ((90L, 0L, a.mkString(" "))), s"${out(1L)}")
    // non-owner loses EXACTLY the 60 shared words; its own text and
    // the sub-threshold duplicate run survive
    assert(out(2L) ==
      ((78L, 60L, (wv("b", 5) ++ shortDup ++ wv("y", 5)).mkString(" "))),
      s"${out(2L)}")
    // a doc whose only duplication is sub-threshold is untouched
    assert(out(3L) == ((18L, 0L, c.mkString(" "))), s"${out(3L)}")
  }

  test("exactSubstrDedup: ownership splits a span; only the copied part is removed") {
    def wv(tag: String, n: Int) = (1 to n).map(i => s"$tag$i")
    val front = wv("f", 55) // doc 1 authored (owner)
    val back = wv("k", 55)  // doc 0 authored (owner)
    // doc 5 = front ++ back: owns neither (docs 1 and 0 are the min
    // ids) -> BOTH halves removed; doc 1 keeps front, loses back? no —
    // doc 1 only has front. doc 0 only has back.
    val corpus = Seq(
      0L -> back.mkString(" "),
      1L -> front.mkString(" "),
      5L -> (front ++ back).mkString(" "))
    val out = Retrieval.exactSubstrDedup(docsDf(corpus),
      "doc_id", "text", n = 5, minSpanWords = 50).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((0L, back.mkString(" "))))
    assert(out(1L) == ((0L, front.mkString(" "))))
    // the copier loses everything (both spans >= threshold, plus the
    // bridging n-grams spanning the junction are also non-owned)
    assert(out(5L)._1 == 110L && out(5L)._2 == "", s"${out(5L)}")
  }
}
