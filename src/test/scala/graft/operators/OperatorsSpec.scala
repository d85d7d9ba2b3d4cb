package graft.operators

import graft.functions.{TextFunctions, VectorFunctions}
import graft.slope.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup / similarity / text operators vs in-memory brute-force oracles. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat",
    3L -> "THE QUICK BROWN FOX, jumps over the lazy dog!",
    4L -> "completely different text about spark engines",
    5L -> "the quick brown fox jumps over the lazy dog", // exact dup of 1
    6L -> "spark engines process completely different text about")

  test("exact dedup: normalized duplicates collapse") {
    val g = Dedup.exactGroups(docsDf(corpus), "doc_id", "text").collect()
    // 1, 3 (punct/case), 5 share a fingerprint
    val dupGroup = g.find(_.getLong(1) == 3L)
    assert(dupGroup.isDefined, s"expected a group of 3: ${g.mkString(";")}")
    assert(dupGroup.get.getLong(2) == 1L, "canonical id should be min")
    val kept = Dedup.dropExactDuplicates(docsDf(corpus), "doc_id", "text")
    assert(kept.count() == 4)
    assert(kept.filter(col("doc_id").isin(3L, 5L)).count() == 0)
  }

  test("ngram jaccard: near-dups found, exact value matches brute force") {
    val out = Dedup.ngramJaccardPairs(docsDf(corpus), "doc_id", "text",
      n = 3, threshold = 0.3, maxDf = 1000).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    def shingles(t: String): Set[String] = {
      val w = t.toLowerCase.replaceAll("[^a-z0-9]", " ").trim
        .replaceAll(" +", " ").split(" ")
      if (w.length <= 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    // brute-force check for the pair (1,2)
    val s1 = shingles(corpus(0)._2); val s2 = shingles(corpus(1)._2)
    val expected = (s1 & s2).size.toDouble / (s1 | s2).size
    assert(out.contains((1L, 2L)), s"pairs found: ${out.keys}")
    assert(math.abs(out((1L, 2L)) - expected) < 1e-12)
    // exact dups have jaccard 1
    assert(math.abs(out((1L, 5L)) - 1.0) < 1e-12)
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash LSH: finds the same near-dup pairs as exact jaccard") {
    val pairs = Dedup.minhashDupPairs(docsDf(corpus), "doc_id", "text",
      n = 3, numHashes = 64, bands = 32, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L)), "exact dup must be caught")
    assert(pairs.contains((1L, 3L)), "normalized dup must be caught")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 5L)),
      s"high-jaccard pair should be caught: $pairs")
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash signature kernel is bit-identical to the HOF formulation") {
    import spark.implicits._
    // varied inputs, including a doc too short for any 3-shingle
    // (empty base hashes -> every lane null in BOTH formulations)
    val rows = corpus :+ (7L -> "ab") :+ (8L -> "one two three four")
    val df = docsDf(rows)
      .select(col("doc_id"),
        graft.functions.TextFunctions.normalizedWords(col("text")).as("w"))
    val fast = df.select(col("doc_id"),
      Dedup.minhashSignature(col("w"), 3, 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val hof = df.select(col("doc_id"),
      Dedup.minhashSignatureHof(col("w"), 3, 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(fast.keySet == hof.keySet)
    fast.foreach { case (id, sig) =>
      assert(sig == hof(id), s"signature mismatch for doc $id") }
    // empty AND NULL base-hash arrays: every lane null in BOTH
    // formulations (array_min(empty) = null; the HOF's outer array(...)
    // of per-lane nulls is itself NON-null, so the kernel must return a
    // lane-of-nulls for NULL input too, never a null signature)
    val edges = Seq((1L, Seq.empty[Long]),
                    (2L, null.asInstanceOf[Seq[Long]])).toDF("id", "h")
    val fe = edges.select(col("id"), Dedup.minhashFromHashes(col("h"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val he = edges.select(col("id"), Dedup.minhashFromHashesHof(col("h"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(fe == he)
    Seq(1L, 2L).foreach { id =>
      assert(fe(id) != null && fe(id).length == 8 && fe(id).forall(_ == null),
        s"input $id must yield a non-null lane-of-nulls signature") }
  }

  test("simhash fingerprint kernel is bit-identical to the HOF formulation") {
    import spark.implicits._
    val df = docsDf(corpus :+ (7L -> "") :+ (8L -> "x"))
      .select(col("doc_id"),
        transform(split(graft.functions.TextFunctions.normalizeText(col("text")), " "),
          w => xxhash64(w)).as("h"))
    val fast = df.select(col("doc_id"),
      Dedup.simhashFromHashes(col("h")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = df.select(col("doc_id"),
      Dedup.simhashFromHashesHof(col("h")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == hof)
    // edge semantics pinned: null array -> 0, null element votes -1
    // on every bit, empty array -> 0 — all matching the HOF form
    val edges = Seq(
      (1L, null.asInstanceOf[Seq[Long]]),
      (2L, Seq.empty[Long]),
      (3L, Seq(-1L)), // all bits set: votes +1 everywhere -> all ones
      (4L, Seq(0L, 0L, -1L))) // 0-majority: every bit votes net -1
      .toDF("id", "h")
    val fe = edges.select(col("id"), Dedup.simhashFromHashes(col("h")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val he = edges.select(col("id"), Dedup.simhashFromHashesHof(col("h")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fe == he)
    assert(fe(1L) == 0L && fe(2L) == 0L && fe(3L) == -1L && fe(4L) == 0L)
  }

  test("simhash: identical normalized text -> identical hash; near text -> small hamming") {
    import spark.implicits._
    val h = docsDf(corpus).select(col("doc_id"),
      Dedup.simhash64(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(5L) && h(1L) == h(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) < ham(h(1L), h(4L)),
      s"near pair should have smaller hamming: ${ham(h(1L), h(2L))} vs ${ham(h(1L), h(4L))}")
    val pairs = Dedup.simhashDupPairs(docsDf(corpus), "doc_id", "text",
      maxHamming = 0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L), (1L, 5L), (3L, 5L)))
  }

  test("cosine topk: brute force matches in-memory computation") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val vecs = (0L until 50L).map(i => (i, Array.fill(8)(rng.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(
      df.filter(col("vec_id") < 3), df, "vec_id", "embedding", k = 4)
      .collect().map(r => ((r.getAs[Long]("query_id"), r.getAs[Int]("rank")),
        r.getAs[Long]("neighbor_id"))).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    for (q <- 0L until 3L) {
      val expect = vecs.filter(_._1 != q)
        .map { case (i, v) => i -> cos(vecs(q.toInt)._2, v) }
        .sortBy { case (i, c) => (-c, i) }.take(4).map(_._1)
      val got = (1 to 4).map(r => topk((q, r)))
      assert(got == expect, s"query $q: $got vs $expect")
    }
  }

  test("int8 ANN: quantized topk matches in-memory quantized oracle; certificate near exact") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val vecs = (0L until 60L).map(i => (i, Array.fill(8)(rng.nextGaussian())))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.int8TopK(
      df.filter(col("vec_id") < 3), df, "vec_id", "embedding", k = 4)
      .collect()
      .map(r => ((r.getAs[Long]("query_id"), r.getAs[Int]("rank")),
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("score"),
          r.getAs[Double]("score_fp")))).toMap
    // in-memory replay of the exact closed-form quantizer
    def quant(v: Array[Double]): Array[Int] = {
      val m = v.map(math.abs).max
      if (m == 0.0) Array.fill(v.length)(0)
      else v.map(x => math.floor(x * 127 / m + 0.5).toInt)
    }
    def qcos(a: Array[Int], b: Array[Int]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    def fcos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val qv = vecs.map { case (i, v) => i -> quant(v) }.toMap
    for (q <- 0L until 3L) {
      val expect = vecs.filter(_._1 != q)
        .map { case (i, _) => i -> qcos(qv(q), qv(i)) }
        .sortBy { case (i, c) => (-c, i) }.take(4)
      val got = (1 to 4).map(r => out((q, r)))
      assert(got.map(_._1) == expect.map(_._1),
        s"query $q ids: ${got.map(_._1)} vs ${expect.map(_._1)}")
      got.zip(expect).foreach { case ((nid, s, fp), (_, es)) =>
        assert(math.abs(s - es) < 1e-9)
        // int8 on 8 dims: quantized cosine within a few % of exact
        assert(math.abs(fp - fcos(vecs(q.toInt)._2, vecs(nid.toInt)._2)) < 1e-9)
        assert(math.abs(s - fp) < 0.05,
          s"quantization error too large: $s vs $fp")
      }
    }
    // zero vector quantizes to zeros and scores 0 against anything
    assert(quant(Array.fill(8)(0.0)).forall(_ == 0))
  }

  test("rp ANN: projected topk matches in-memory JL oracle; shortlist recalls brute force") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val dim = 16
    // clustered corpus (6 centers + small noise): nearest neighbors are
    // geometrically meaningful, which is what JL preserves — on
    // structureless iid-gaussian vectors every cosine is ~0 and top-5
    // membership is arbitrary, a recall test of noise
    val centers = Array.fill(6)(Array.fill(dim)(rng.nextGaussian() * 3))
    val vecs = (0L until 60L).map { i =>
      val c = centers(i.toInt % 6)
      (i, c.map(_ + rng.nextGaussian() * 0.3))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val rDim = 8
    val out = Similarity.rpTopK(
      df.filter(col("vec_id") < 3), df, "vec_id", "embedding",
      dim = dim, rDim = rDim, seed = 7L, k = 4)
      .collect()
      .map(r => ((r.getAs[Long]("query_id"), r.getAs[Int]("rank")),
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("score"),
          r.getAs[Double]("score_fp")))).toMap
    val planes = VectorFunctions.hyperplanes(dim, rDim, 7L)
    def proj(v: Array[Double]): Array[Double] =
      planes.map(p => p.indices.foldLeft(0.0)((s, j) => s + v(j) * p(j)))
    def cosd(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.foldLeft(0.0)((s, j) => s + a(j) * b(j))
      val na = math.sqrt(a.indices.foldLeft(0.0)((s, j) => s + a(j) * a(j)))
      val nb = math.sqrt(b.indices.foldLeft(0.0)((s, j) => s + b(j) * b(j)))
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val pv = vecs.map { case (i, v) => i -> proj(v) }.toMap
    for (q <- 0L until 3L) {
      val expect = vecs.filter(_._1 != q)
        .map { case (i, _) => i -> cosd(pv(q), pv(i)) }
        .sortBy { case (i, c) => (-c, i) }.take(4)
      val got = (1 to 4).map(r => out((q, r)))
      assert(got.map(_._1) == expect.map(_._1),
        s"query $q ids: ${got.map(_._1)} vs ${expect.map(_._1)}")
      got.zip(expect).foreach { case ((nid, s, fp), (_, es)) =>
        assert(math.abs(s - es) < 1e-12)
        assert(math.abs(fp - cosd(vecs(q.toInt)._2, vecs(nid.toInt)._2)) < 1e-12)
      }
    }
    // JL shortlist quality: rp top-10 must recall >= 60% of the exact
    // cosine top-5 (8 of 16 dims keeps most of the geometry)
    val rp10 = Similarity.rpTopK(df.filter(col("vec_id") < 3), df,
      "vec_id", "embedding", dim = dim, rDim = rDim, seed = 7L, k = 10)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    for (q <- 0L until 3L) {
      val exact5 = vecs.filter(_._1 != q)
        .map { case (i, v) => i -> cosd(vecs(q.toInt)._2, v) }
        .sortBy { case (i, c) => (-c, i) }.take(5).map(_._1).toSet
      val hit = (exact5 & rp10(q)).size
      assert(hit >= 3, s"query $q: rp top-10 recalled only $hit of exact top-5")
    }
  }

  test("pack without splitting: capacity respected, FFD order, oversize routed") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(60)("w").mkString(" ")),   // 60
      (2L, Seq.fill(50)("w").mkString(" ")),   // 50
      (3L, Seq.fill(40)("w").mkString(" ")),   // 40
      (4L, Seq.fill(30)("w").mkString(" ")),   // 30
      (5L, Seq.fill(150)("w").mkString(" ")),  // oversize at 100
      (6L, Seq.fill(10)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.packWithoutSplitting(docs, "doc_id", "text",
      seqLen = 100, nBuckets = 1).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(3), r.getBoolean(4)))).toMap
    // single bucket, FFD over lengths desc: 150(oversize own bin),
    // 60 -> bin, 50 -> same? 60+50 > 100 so new bin; 40 -> first bin
    // with room (60+40=100), 30 -> bin with 50 (80), 10 -> bin w/ 100? full ->
    // bin with 80 -> 90
    assert(out(5L)._3, "150-token doc must flag oversize")
    // capacity: total per (non-oversize) bin <= seqLen
    val byBin = out.toSeq.filterNot(_._2._3)
      .groupBy(_._2._2).view.mapValues(_.map(_._2._1).sum).toMap
    byBin.foreach { case (bin, tot) =>
      assert(tot <= 100, s"bin $bin holds $tot tokens")
    }
    // every doc assigned exactly once
    assert(out.size == 6)
    // FFD quality on this instance: 60+40, 50+30+10 fit in 2 bins
    assert(byBin.size == 2, s"FFD should use 2 bins here: $byBin")
    // determinism: a re-run (different partition count) is identical
    val rerun = Packing.packWithoutSplitting(docs.repartition(5),
      "doc_id", "text", seqLen = 100, nBuckets = 1).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(3), r.getBoolean(4)))).toMap
    assert(rerun == out)
    // bucketed run still packs everything, within capacity, per bucket
    val bucketed = Packing.packWithoutSplitting(docs, "doc_id", "text",
      seqLen = 100, nBuckets = 3).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getLong(1),
        r.getBoolean(4)))
    assert(bucketed.length == 6)
    bucketed.groupBy(r => (r._2, r._3)).foreach { case (k, rows) =>
      if (!rows.head._5)
        assert(rows.map(_._4).sum <= 100, s"bucket-bin $k over capacity")
    }
  }

  test("packBinSequences materializes FFD bins with exact ids, spans and masks (r13 ask #4)") {
    import spark.implicits._
    // deterministic per-word ids (word length), one bucket so the FFD
    // layout is hand-checkable: lengths 6,5,4,3,15(oversize at 10),1
    val docs = Seq(
      (1L, "a bb ccc dddd eeeee ffffff"),            // 6 tokens
      (2L, "a bb ccc dddd eeeee"),                   // 5
      (3L, "a bb ccc dddd"),                         // 4
      (4L, "a bb ccc"),                              // 3
      (5L, Seq.fill(15)("xx").mkString(" ")),        // 15 -> oversize
      (6L, "a"))                                     // 1
      .toDF("doc_id", "text")
    val ids: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => transform(split(trim(c), " +"), w => length(w).cast("int"))
    val out = Packing.packBinSequences(docs, "doc_id", "text",
      seqLen = 10, tokenIds = ids, nBuckets = 1).collect()
      .map { r =>
        (r.getAs[Int]("bucket"), r.getAs[Int]("bin")) ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            r.getAs[Boolean]("oversize"),
            r.getAs[scala.collection.Seq[Int]]("input_ids").toSeq,
            r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("doc_spans")
              .map(s => (s.getInt(0), s.getInt(1))).toSeq,
            Option(r.getAs[scala.collection.Seq[Int]]("loss_mask"))
              .map(_.toSeq)))
      }.toMap
    // FFD over (len desc, id): 15 -> oversize own bin; 6 -> bin;
    // 5 -> same bin? 6+5>10 new bin; 4 -> bin0 (6+4=10); 3 -> bin1
    // (5+3=8); 1 -> bin1 (9)
    val regular = out.filterNot(_._2._3)
    assert(out.size == 3 && regular.size == 2, s"layout: ${out.keys}")
    val binOf6 = regular.find(_._2._4.startsWith(Seq(1, 2, 3, 4, 5, 6))).get
    // bin with docs 1 (6 tokens) + 3 (4 tokens), FFD insertion order
    assert(binOf6._2._4 == Seq(1, 2, 3, 4, 5, 6, 1, 2, 3, 4))
    assert(binOf6._2._5 == Seq((0, 6), (6, 10)), s"spans: ${binOf6._2._5}")
    assert(binOf6._2._6.get == Seq.fill(10)(1), "full bin pads nothing")
    // bin with docs 2 (5) + 4 (3) + 6 (1): 9 tokens, 1 pad slot
    val binOf5 = regular.find(_._2._4.startsWith(Seq(1, 2, 3, 4, 5, 1))).get
    assert(binOf5._2 == ((3L, 9L, false,
      Seq(1, 2, 3, 4, 5, 1, 2, 3, 1),
      Seq((0, 5), (5, 8), (8, 9)),
      Some(Seq(1, 1, 1, 1, 1, 1, 1, 1, 1, 0)))), s"got ${binOf5._2}")
    // oversize: single doc, UNPADDED, NULL mask (route, never train)
    val over = out.find(_._2._3).get
    assert(over._2._1 == 1L && over._2._2 == 15L && over._2._6.isEmpty)
    assert(over._2._5 == Seq((0, 15)))
    // every non-oversize bin respects capacity and its mask length
    regular.values.foreach { case (_, n, _, idsv, spans, mask) =>
      assert(n <= 10 && idsv.length == n.toInt)
      assert(mask.get.length == 10 && mask.get.count(_ == 1) == n.toInt)
      assert(spans.head._1 == 0 && spans.last._2 == n.toInt &&
        spans.sliding(2).forall(w => w.length < 2 || w(0)._2 == w(1)._1),
        s"spans must partition [0, n): $spans")
    }
    // determinism under a different partition layout
    val rerun = Packing.packBinSequences(docs.repartition(4), "doc_id",
      "text", seqLen = 10, tokenIds = ids, nBuckets = 1).collect()
      .map(r => (r.getAs[Int]("bin"),
        r.getAs[scala.collection.Seq[Int]]("input_ids").toSeq)).toSet
    assert(rerun == out.map(kv => (kv._1._2, kv._2._4)).toSet)
  }

  test("FFD packing: zero-token doc never lands in an oversize doc's dead bin") {
    import spark.implicits._
    // oversize first in FFD order (desc), then the empty doc: before the
    // r9 ADVICE fix the empty doc's first-fit scan stopped at the
    // oversize bin (remaining 0, and 0 < 0 is false) and shared it
    val docs = Seq(
      (1L, Seq.fill(150)("w").mkString(" ")), // oversize (seqLen 100)
      (2L, ""),                               // zero tokens
      (3L, Seq.fill(60)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.packWithoutSplitting(docs, "doc_id", "text",
      seqLen = 100, nBuckets = 1).collect()
      .map(r => r.getLong(0) -> ((r.getInt(3), r.getBoolean(4)))).toMap
    assert(out(1L)._2, "150-token doc must flag oversize")
    assert(out(2L)._1 != out(1L)._1,
      s"empty doc shares the oversize doc's bin: $out")
    assert(!out(2L)._2 && !out(3L)._2)
  }

  test("semantic contamination: bench-side collect gate enforces the contract") {
    import spark.implicits._
    val train = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val bench = (0L until 10L).map(i => (i, Array(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticContamination(train, bench, "vec_id", "embedding",
        threshold = 0.5, maxBenchRows = 5)
    }
    assert(e.getMessage.contains("maxBenchRows"))
    // at the bound it still runs (gate is >, not >=)
    val ok = Dedup.semanticContamination(train, bench, "vec_id",
      "embedding", threshold = 0.5, maxBenchRows = 10).collect()
    assert(ok.length == 10)
  }

  test("round-9 edges: single-system rrf, empty-doc gopher, cased blocklist, zero-vec contamination") {
    import spark.implicits._
    // rrfFuse degenerates cleanly with one system
    val one = Retrieval.rrfFuse(
      Seq("only" -> Seq((5L, 1), (6L, 2)).toDF("id", "rank")), kRrf = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(one == Map(5L -> r6(1.0 / 61), 6L -> r6(1.0 / 62)))
    // gopher gate on an empty doc: all signals zero, no NaN, pass=false
    val g = Quality.gopherFlags(Seq((1L, "")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(g.getInt(1) == 0 && g.getDouble(2) == 0.0 &&
      g.getDouble(3) == 0.0 && g.getDouble(4) == 0.0 &&
      !g.getAs[Boolean]("pass"))
    // blocklist entries fold case like the host does
    val b = Seq((1L, "http://ads.bad.example/x"))
      .toDF("id", "url")
      .select(graft.functions.UrlFunctions
        .hostBlocked(col("url"), Seq("BAD.Example")).as("b"))
      .collect().head.getBoolean(0)
    assert(b, "uppercase blocklist entry must still match")
    // zero vectors score cosine 0 and are never flagged
    val z = Dedup.semanticContamination(
      Seq((10L, Array.fill(4)(0.0))).toDF("vec_id", "embedding"),
      Seq((0L, Array(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.1).collect()
    assert(z.isEmpty)
  }

  test("semantic contamination: threshold pairs match brute-force cosine") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val dim = 8
    val bench = (0L until 4L).map(i =>
      (i, Array.fill(dim)(rng.nextGaussian())))
    // train: 2 planted near-copies of bench items + 20 random
    val train = Seq(
      (100L, bench(1)._2.map(_ + rng.nextGaussian() * 0.05)),
      (101L, bench(3)._2.map(_ + rng.nextGaussian() * 0.05))) ++
      (102L until 122L).map(i => (i, Array.fill(dim)(rng.nextGaussian())))
    val got = Dedup.semanticContamination(
      train.toDF("vec_id", "embedding"), bench.toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.9).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.foldLeft(0.0)((s, j) => s + a(j) * b(j))
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (for {
      (tid, tv) <- train; (bid, bv) <- bench
      c = cos(bv, tv) if c >= 0.9
    } yield (tid, bid) -> c).toMap
    assert(got.keySet == expected.keySet, s"$got vs $expected")
    assert(expected.contains((100L, 1L)) && expected.contains((101L, 3L)),
      "planted near-copies must be flagged")
    got.foreach { case (k, c) => assert(math.abs(c - expected(k)) < 1e-12) }
  }

  test("leakage-safe split: duplicate groups never straddle splits") {
    import spark.implicits._
    // 400 docs in 100 exact-dup groups of 4 (whitespace/case variants
    // of one text) — id-keyed splitting WOULD scatter most groups
    val docs = (0L until 400L).map { i =>
      val g = i / 4
      val base = s"group $g content alpha beta gamma delta"
      val variant = (i % 4) match {
        case 0 => base
        case 1 => base.toUpperCase
        case 2 => base.replace(" ", "   ")
        case 3 => base + "!!!"
      }
      (i, variant)
    }.toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", "text",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .select(col("doc_id"), col("split")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.length == 400)
    // every group of 4 lands in exactly one split
    out.groupBy(_._1 / 4).foreach { case (g, members) =>
      assert(members.map(_._2).toSet.size == 1,
        s"group $g straddles splits: ${members.toSeq}")
    }
    // the split is genuinely keyed by the group, and all three splits
    // materialize across the 100 groups
    val perGroup = out.groupBy(_._1 / 4).view.mapValues(_.head._2).toMap
    assert(perGroup.values.toSet == Set("train", "val", "test"))
    // id-keyed hashSplit on the same corpus DOES scatter groups —
    // the contrast that makes this operator exist
    val naive = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .select(col("doc_id"), col("split")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val scattered = naive.groupBy(_._1 / 4)
      .count(_._2.map(_._2).toSet.size > 1)
    assert(scattered > 10, s"fixture too easy: only $scattered scattered")
  }

  test("rebalanceToWeights: closed-form fractions, binding group keeps all, missing weights loud") {
    import spark.implicits._
    // per-doc tokens chosen so totals are A=1000, B=500, C=100
    val d = ((0L until 10L).map(i => (i, "A", 100L)) ++
      (10L until 20L).map(i => (i, "B", 50L)) ++
      (20L until 30L).map(i => (i, "C", 10L)))
      .toDF("doc_id", "source", "n_tokens")
    // weights 2:1:1 -> c = min(1000/2, 500/1, 100/1) = 100 ->
    // f_A = 200/1000 = 0.2, f_B = 100/500 = 0.2, f_C = 1.0 (binding)
    val out = Sampling.rebalanceToWeights(d, "doc_id", "source",
      "n_tokens", Map("A" -> 2.0, "B" -> 1.0, "C" -> 1.0))
      .groupBy("source").agg(max("keep_fraction").as("f"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out("A")._1 == 0.2 && out("B")._1 == 0.2 && out("C")._1 == 1.0,
      s"$out")
    assert(out("C")._2 == 10L, "the binding group keeps every row")
    // a group without a weight fails loudly...
    val e = intercept[IllegalArgumentException] {
      Sampling.rebalanceToWeights(d, "doc_id", "source", "n_tokens",
        Map("A" -> 1.0, "B" -> 1.0)).collect()
    }
    assert(e.getMessage.contains("without a weight") &&
      e.getMessage.contains("C"))
    graft.CacheRegistry.releaseAll()
    // ...unless dropping it is the explicit mixture decision
    val dropped = Sampling.rebalanceToWeights(d, "doc_id", "source",
      "n_tokens", Map("A" -> 1.0, "B" -> 1.0), allowMissing = true)
      .filter(col("source") === "C")
      .agg(max("keep_fraction"), sum(when(col("keep"), 1L).otherwise(0L)))
      .head()
    assert(dropped.getDouble(0) == 0.0 && dropped.getLong(1) == 0L)
    graft.CacheRegistry.releaseAll()
  }

  test("incremental minhash: corpus priority, batch keep-first, index maintenance") {
    val lorem = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = docsDf(Seq(
      1L -> lorem,
      2L -> "totally different corpus content about ships and sails"))
    val batch = docsDf(Seq(
      100L -> (lorem + " omega"),       // near-dups corpus doc 1
      101L -> (lorem + " omega"),       // dups BOTH corpus 1 and batch 100
      102L -> "brand new batch content nobody wrote before today",
      103L -> "brand new batch content nobody wrote before today",
      104L -> "a fully unique batch document with its own words"))
    val idx = Dedup.minhashSignatureIndex(corpus, "doc_id", "text", n = 2)
    def flags(index: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalMinhashFlags(index, b, "doc_id", "text",
        n = 2, threshold = 0.3)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    val got = flags(idx, batch)
    // corpus match takes PRIORITY over the in-batch pair (101 ~ 100)
    assert(got(100L)._1 == "near_dup_of_corpus" && got(100L)._2 == 1L,
      s"$got")
    assert(got(101L)._1 == "near_dup_of_corpus" && got(101L)._2 == 1L,
      s"101 must prefer its corpus match: $got")
    // batch-internal near-dup: keep-first semantics, est exact 1.0
    assert(got(102L) == (("new", 102L, 0.0)), s"$got")
    assert(got(103L) == (("near_dup_in_batch", 102L, 1.0)), s"$got")
    assert(got(104L) == (("new", 104L, 0.0)), s"$got")
    // maintenance: append the accepted batch's signatures and the next
    // batch near-dups against them WITHOUT re-indexing the corpus text
    val idx2 = idx.union(
      Dedup.minhashSignatureIndex(batch, "doc_id", "text", n = 2))
    val batch2 = docsDf(Seq(
      200L -> "a fully unique batch document with its own words"))
    assert(flags(idx, batch2)(200L)._1 == "new")
    val g2 = flags(idx2, batch2)(200L)
    assert(g2._1 == "near_dup_of_corpus" && g2._2 == 104L && g2._3 == 1.0,
      s"updated index must catch the cross-batch dup: $g2")
  }

  test("incremental semantic: corpus priority, batch keep-first, index maintenance") {
    import spark.implicits._
    def vec(axis: Int, scale: Double = 1.0): Array[Double] = {
      val v = new Array[Double](8); v(axis) = scale; v
    }
    // the model trains on a representative sample (corpus + batch
    // directions), the FAISS discipline; flags run against the CORPUS
    // index only
    val corpus = Seq((1L, vec(0)), (2L, vec(2)))
      .toDF("vec_id", "embedding")
    val batch = Seq(
      (100L, vec(0, 0.9)),   // near-dups corpus vec 1
      (101L, vec(0)),        // dups BOTH corpus 1 and batch 100
      (102L, vec(4)),        // new direction
      (103L, vec(4)),        // dups batch 102 only
      (104L, vec(6))         // unique
    ).toDF("vec_id", "embedding")
    val model = Similarity.trainSemanticIndex(corpus.unionByName(batch),
      "vec_id", "embedding", nLists = 2, m = 2, nCodes = 4)
    val idx = Similarity.semanticSignatureIndex(model, corpus,
      "vec_id", "embedding")
    def flags(index: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame) =
      Similarity.incrementalSemanticFlags(model, index, b,
        "vec_id", "embedding", nProbe = 2, threshold = 0.5)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    val got = flags(idx, batch)
    assert(got(100L)._1 == "near_dup_of_corpus" && got(100L)._2 == 1L, s"$got")
    assert(got(101L)._1 == "near_dup_of_corpus" && got(101L)._2 == 1L,
      s"101 must prefer its corpus match: $got")
    assert(got(102L) == (("new", 102L, 0.0)), s"$got")
    assert(got(103L)._1 == "near_dup_in_batch" && got(103L)._2 == 102L &&
      got(103L)._3 > 0.9, s"$got")
    assert(got(104L) == (("new", 104L, 0.0)), s"$got")
    graft.CacheRegistry.releaseAll()
    // deterministic rerun
    assert(flags(idx, batch) == got)
    graft.CacheRegistry.releaseAll()
    // maintenance: append the accepted batch's code rows; the next
    // batch near-dups against them WITHOUT re-encoding the corpus
    val idx2 = idx.union(
      Similarity.semanticSignatureIndex(model, batch, "vec_id", "embedding"))
    val batch2 = Seq((200L, vec(6))).toDF("vec_id", "embedding")
    assert(flags(idx, batch2)(200L)._1 == "new")
    val g2 = flags(idx2, batch2)(200L)
    assert(g2._1 == "near_dup_of_corpus" && g2._2 == 104L && g2._3 > 0.9,
      s"updated index must catch the cross-batch dup: $g2")
    graft.CacheRegistry.releaseAll()
    // model persistence round-trip: a later ingestion batch loads the
    // SAME quantizers and codes identically
    val mPath = java.nio.file.Files.createTempFile("sem_model", ".json")
      .toString
    model.save(mPath)
    val loaded = Similarity.loadSemanticIndexModel(mPath)
    assert(loaded.centers.map(_.toSeq).toSeq == model.centers.map(_.toSeq).toSeq)
    assert(loaded.books.map(_.map(_.toSeq).toSeq).toSeq ==
      model.books.map(_.map(_.toSeq).toSeq).toSeq)
    val viaLoaded = Similarity.semanticSignatureIndex(loaded, batch,
      "vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2), r.getDouble(3)))
      .sortBy(_._1)
    val viaOrig = Similarity.semanticSignatureIndex(model, batch,
      "vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2), r.getDouble(3)))
      .sortBy(_._1)
    assert(viaLoaded.toSeq == viaOrig.toSeq, "loaded model must code identically")
  }

  test("bucketed keeper table: semantic probe leaves the corpus index unshuffled") {
    // r11 verdict ask #6: the scaladoc claims "with the index bucketed
    // by cell the corpus never shuffles at all" — prove it the way
    // ExportSpec proves its layout. The keeper table is written
    // bucketBy(cell) (saveSemanticIndex); the probe join's corpus side
    // must then contain a bucketed scan and NO ShuffleExchange, with
    // only the batch-sized probe side exchanging.
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val rnd = new scala.util.Random(7)
    def rv(): Array[Double] = Array.fill(8)(rnd.nextGaussian())
    val corpus = (1L to 400L).map(i => (i, rv())).toDF("vec_id", "embedding")
    val batch = (1000L to 1030L).map(i => (i, rv())).toDF("vec_id", "embedding")
    val model = Similarity.trainSemanticIndex(corpus, "vec_id", "embedding",
      nLists = 4, m = 2, nCodes = 4)
    val idx = Similarity.semanticSignatureIndex(model, corpus,
      "vec_id", "embedding")
    spark.sql("DROP TABLE IF EXISTS graft_sem_idx_bkt")
    Similarity.saveSemanticIndex(idx, "graft_sem_idx_bkt", buckets = 4)
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val flags = Similarity.incrementalSemanticFlags(model,
        spark.table("graft_sem_idx_bkt"), batch, "vec_id", "embedding",
        nProbe = 2, threshold = 0.9)
      def hasBucketedScan(p: SparkPlan): Boolean =
        p.collect { case f: FileSourceScanExec if f.bucketedScan => f }.nonEmpty
      // exchanges of CORPUS rows only: descent stops at broadcast
      // builds (the batch-cells semi-join ships batch data, not corpus)
      def corpusShuffles(p: SparkPlan): Seq[SparkPlan] = p match {
        case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          Nil
        case e: ShuffleExchangeExec =>
          e +: e.children.flatMap(corpusShuffles)
        case other => other.children.flatMap(corpusShuffles)
      }
      val plan = flags.queryExecution.executedPlan
      // r12 hygiene #1: the asymmetric PQ scoring is now a native
      // codegen'd expression (ApproxPqCosine) — the probe plan must
      // contain no ScalaUDF node anywhere
      assert(!plan.toString.contains("ScalaUDF"),
        s"semantic probe scoring must be codegen'd (no ScalaUDF):\n$plan")
      // the PROBE join (keys on cell): its corpus side holds the
      // bucketed scan and must move zero corpus rows before the join
      val probeSides = plan.collect {
        case j: SortMergeJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "cell")) => j
      }.flatMap(j => Seq(j.left, j.right)).filter(hasBucketedScan)
      assert(probeSides.nonEmpty,
        s"bucketed corpus scan must feed the sort-merge probe join:\n$plan")
      probeSides.foreach { side =>
        val shuffles = corpusShuffles(side)
        assert(shuffles.isEmpty,
          s"corpus side of the probe join must not shuffle:\n$side")
      }
      // and the result equals the unbucketed run row-for-row
      val viaBkt = flags.collect().map(_.toSeq).sortBy(_.head.toString)
      graft.CacheRegistry.releaseAll()
      val viaPlain = Similarity.incrementalSemanticFlags(model, idx, batch,
        "vec_id", "embedding", nProbe = 2, threshold = 0.9)
        .collect().map(_.toSeq).sortBy(_.head.toString)
      assert(viaBkt.toSeq == viaPlain.toSeq)
      graft.CacheRegistry.releaseAll()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_sem_idx_bkt")
    }
  }

  test("incremental dedup: corpus outranks batch, batch keep-first, new passes") {
    val corpus = docsDf(Seq(
      1L -> "shared content alpha",
      2L -> "shared content alpha", // corpus-internal dup: canonical 1
      3L -> "corpus only beta"))
    val batch = docsDf(Seq(
      10L -> "SHARED content alpha!",  // dup_of_corpus -> 1 (normalized)
      11L -> "shared content alpha",   // ALSO corpus dup (not in-batch)
      12L -> "fresh gamma",            // new
      13L -> "fresh gamma",            // dup_in_batch -> 12
      14L -> "never seen delta"))      // new
    val got = Dedup.incrementalDupFlags(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got(10L) == (("dup_of_corpus", 1L)))
    assert(got(11L) == (("dup_of_corpus", 1L)))
    assert(got(12L) == (("new", 12L)))
    assert(got(13L) == (("dup_in_batch", 12L)))
    assert(got(14L) == (("new", 14L)))
  }

  test("ngram novelty: first doc gets credit, exact dup scores zero") {
    val corpus = Seq(
      1L -> "one two three four five six",   // shingles A, B — both novel
      2L -> "one two three four five six",   // exact dup -> 0
      3L -> "one two three four five seven") // A seen (first=1), C novel
    val got = Dedup.ngramNovelty(docsDf(corpus), "doc_id", "text", n = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((2, 2L, 1.0)))
    assert(got(2L) == ((2, 0L, 0.0)))
    assert(got(3L) == ((2, 1L, 0.5)))
    // short doc: whole text is one shingle; unique -> fully novel
    val got2 = Dedup.ngramNovelty(docsDf(Seq(9L -> "tiny doc")),
      "doc_id", "text", n = 5).collect()
    assert(got2.head.getInt(1) == 1 && got2.head.getDouble(3) == 1.0)
  }

  test("rebalance to min tokens: fractions exact, smallest source keeps all") {
    import spark.implicits._
    // source a: 100 tokens, b: 50, c: 200 -> min 50; f = 0.5 / 1.0 / 0.25
    val rows = Seq(
      (1L, "a", 60L), (2L, "a", 40L),
      (3L, "b", 50L),
      (4L, "c", 120L), (5L, "c", 80L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Sampling.rebalanceToMinTokens(rows, "doc_id", "source",
      "n_tokens").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("keep_fraction"), r.getAs[Boolean]("keep")))).toMap
    assert(out(1L)._1 == 0.5 && out(2L)._1 == 0.5)
    assert(out(3L)._1 == 1.0 && out(3L)._2, "smallest source keeps everything")
    assert(out(4L)._1 == 0.25 && out(5L)._1 == 0.25)
    // keep decision matches the hash bucket exactly (determinism)
    val buckets = rows.select(col("doc_id"),
      Sampling.hashBucket(col("doc_id"), "rebalance").as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { case (id, (f, keep)) =>
      assert(keep == (buckets(id) < f), s"doc $id")
    }
  }

  test("gopher rules: each rule fails on its crafted violator, good doc passes") {
    import spark.implicits._
    val good = (1 to 30).map(i => s"the quick value$i")
      .mkString(" ") + " that stuff works with everything fine"
    val docs = Seq(
      (1L, good),                                   // passes all
      (2L, "too short to pass the gate"),           // word count
      (3L, good + " " + Array.fill(20)("###").mkString(" ")), // symbols
      (4L, good.replace("quick", "99 88 77 66 55")), // alpha ratio drops
      (5L, (1 to 60).map(i => s"zzz$i qqq$i").mkString(" ")), // no stopwords
      (6L, "the " * 80 + "of value"))               // unique ratio
      .toDF("doc_id", "text")
    val got = Quality.gopherFlags(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    def b(id: Long, f: String) =
      got(id).getAs[Boolean](f)
    assert(b(1L, "pass"), s"good doc: ${got(1L)}")
    assert(!b(2L, "r_word_count") && !b(2L, "pass"))
    assert(!b(3L, "r_symbol_ratio") && !b(3L, "pass"), s"${got(3L)}")
    assert(!b(4L, "r_alpha_words") && !b(4L, "pass"), s"${got(4L)}")
    assert(!b(5L, "r_stopwords") && !b(5L, "pass"))
    assert(!b(6L, "r_unique_words") && !b(6L, "pass"))
  }

  test("embedding drift: closed-form centroid cosine; identical groups drift 1") {
    import spark.implicits._
    val in = Seq(
      ("a", Array(1.0, 0.0)), ("a", Array(1.0, 2.0)),  // mean (1, 1)
      ("b", Array(0.0, 1.0)), ("b", Array(2.0, 1.0)))  // mean (1, 1) too
      .toDF("source", "embedding")
    // corpus mean = (1,1); both groups' means equal it -> cosine 1
    val same = Quality.embeddingDrift(in, "source", "embedding").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(same == Map("a" -> ((1.0, 2L)), "b" -> ((1.0, 2L))), s"$same")
    // orthogonal group means: corpus mean (0.5, 0.5); cos(group, corpus)
    // = cos(45deg) = 1/sqrt(2) for both
    val ortho = Seq(("x", Array(1.0, 0.0)), ("y", Array(0.0, 1.0)))
      .toDF("source", "embedding")
    val got = Quality.embeddingDrift(ortho, "source", "embedding").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got("x") == r6(1.0 / math.sqrt(2)) && got("y") == r6(1.0 / math.sqrt(2)),
      s"$got")
  }

  test("token drift: closed-form JS divergence; identical groups drift 0") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x x y"), ("b", "y z z z")).toDF("source", "text")
    val got = Quality.tokenDrift(docs, "source", "text").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3))))
      .toMap
    // corpus: x:2 y:2 z:3 (n=7); group a: x:2 y:1 (n=3); b: y:1 z:3 (n=4)
    def js(p: Map[String, Double], q: Map[String, Double]): Double =
      q.keys.map { t =>
        val pv = p.getOrElse(t, 0.0); val qv = q(t); val m = (pv + qv) / 2
        (if (pv > 0) pv * math.log(pv / m) / 2 else 0.0) +
          (if (qv > 0) qv * math.log(qv / m) / 2 else 0.0)
      }.sum
    val corpus = Map("x" -> 2.0 / 7, "y" -> 2.0 / 7, "z" -> 3.0 / 7)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got("a")._1 == r6(js(Map("x" -> 2.0 / 3, "y" -> 1.0 / 3), corpus)))
    assert(got("b")._1 == r6(js(Map("y" -> 1.0 / 4, "z" -> 3.0 / 4), corpus)))
    assert(got("a")._2 == 2L && got("a")._3 == 3L)
    // two identical groups => each equals the corpus => drift exactly 0
    val same = Seq(("a", "p q r"), ("b", "p q r")).toDF("source", "text")
    val z = Quality.tokenDrift(same, "source", "text").collect()
    assert(z.forall(_.getDouble(1) == 0.0), z.mkString(";"))
  }

  test("applyChanges: upsert/delete/insert merge; versioned batch latest-wins") {
    import spark.implicits._
    val snap = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("id", "text")
    val changes = Seq(
      (2L, "two-v2", "upsert"),  // revise
      (3L, "ignored", "delete"), // remove
      (4L, "four", "upsert"))    // insert
      .toDF("id", "text", "op")
    val got = Checks.applyChanges(snap, changes, "id", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "one", 2L -> "two-v2", 4L -> "four"))
    // versioned: two ops on one id in a batch — highest version wins
    val vchanges = Seq(
      (2L, "mid", "upsert", 5L),
      (2L, "final", "upsert", 9L),
      (3L, "x", "delete", 1L),
      (3L, "resurrected", "upsert", 2L))
      .toDF("id", "text", "op", "v")
    val got2 = Checks.applyChanges(snap, vchanges, "id", "op", Some("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 == Map(1L -> "one", 2L -> "final", 3L -> "resurrected"))
  }

  test("deflate size: codegen matches local Deflater; ratio separates repetition") {
    import spark.implicits._
    val natural = "the quick brown fox jumps over seventeen lazy dogs while " +
      "bright engineers measure entropy of prose paragraphs"
    val repetitive = Array.fill(20)("spam spam spam").mkString(" ")
    val rows = Seq((1L, natural), (2L, repetitive), (3L, ""))
    val got = rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.deflateSize(col("text")).as("dz"),
        TextFunctions.compressionRatio(col("text")).as("ratio"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    // differential vs a direct local Deflater call (same level, raw mode)
    def local(s: String) =
      graft.functions.DeflateHelper.size(s.getBytes("UTF-8"))
    assert(got(1L)._1 == local(natural))
    assert(got(2L)._1 == local(repetitive))
    assert(got(3L)._1 == local(""))
    assert(got(3L)._2 == 0.0, "empty doc ratio is 0 by convention")
    assert(got(2L)._2 < got(1L)._2 * 0.5,
      s"repetitive text must compress far better: $got")
    // interpreted eval path (no codegen) agrees with the codegen'd one
    val interp = graft.functions.DeflateSize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(natural)))
      .eval(null)
    assert(interp == local(natural))
  }

  test("codegen dot product is bit-identical to the HOF fold") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // adversarial values: magnitudes that make the fold order observable
    // (1e16 + 1 rounds), NaN/Inf propagation, plus plain gaussians
    val special = Seq(
      (Array(1e16f, 1.0f, -1e16f), Array(1.0f, 1.0f, 1.0f)),
      (Array(Float.NaN, 2.0f), Array(1.0f, 3.0f)),
      (Array(Float.PositiveInfinity, 1.0f), Array(1.0f, -1.0f)),
      (Array.empty[Float], Array.empty[Float]))
    val rand = Seq.fill(200)((Array.fill(16)(rng.nextGaussian().toFloat),
      Array.fill(16)(rng.nextGaussian().toFloat)))
    val df = (special ++ rand).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "a", "b")
    // float inputs and double inputs (the hyperplane-literal case)
    for (cast <- Seq(false, true)) {
      val in = if (cast) df.select(col("id"), col("a").cast("array<double>"),
        col("b").cast("array<double>")) else df
      val rows = in.select(col("id"),
        VectorFunctions.dot(col("a"), col("b")).as("native"),
        VectorFunctions.dotHof(col("a"), col("b")).as("hof")).collect()
      rows.foreach { r =>
        val n = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
        val h = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
        assert((n == null && h == null) ||
          java.lang.Double.doubleToRawLongBits(n) ==
            java.lang.Double.doubleToRawLongBits(h),
          s"id=${r.getLong(0)} cast=$cast native=$n hof=$h")
      }
    }
    // length mismatch and null element -> null, matching zip_with padding
    val edge = Seq((1L, Array(1.0f, 2.0f), Array(1.0f)),
      (2L, Array(1.0f), Array(1.0f, 2.0f))).toDF("id", "a", "b")
      .union(spark.sql(
        "SELECT 3L, array(cast(1.0 as float), cast(null as float)), " +
          "array(cast(1.0 as float), cast(2.0 as float))"))
    val e = edge.select(VectorFunctions.dot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof")).collect()
    e.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1), s"expected nulls: $r"))
  }

  test("codegen norm2/normalize are bit-identical to the HOF folds") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    // adversarial: fold-order-observable magnitudes, NaN/Inf, zero
    // vector, empty array, plus gaussians — and the null-element row
    // where normalize must return an ALL-null array of equal length
    val special = Seq(
      Array(1e16f, 1.0f, -1e16f),
      Array(Float.NaN, 2.0f),
      Array(Float.PositiveInfinity, 1.0f),
      Array(0.0f, 0.0f, 0.0f),
      Array.empty[Float])
    val rand = Seq.fill(200)(Array.fill(16)(rng.nextGaussian().toFloat))
    val df = (special ++ rand).zipWithIndex
      .map { case (a, i) => (i.toLong, a) }.toDF("id", "a")
    for (cast <- Seq(false, true)) {
      val in = if (cast) df.select(col("id"),
        col("a").cast("array<double>").as("a")) else df
      val rows = in.select(col("id"),
        VectorFunctions.norm2(col("a")).as("n_native"),
        VectorFunctions.norm2Hof(col("a")).as("n_hof"),
        VectorFunctions.normalize(col("a")).as("v_native"),
        VectorFunctions.normalizeHof(col("a")).as("v_hof")).collect()
      rows.foreach { r =>
        def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
        assert(r.isNullAt(1) == r.isNullAt(2), s"norm null mismatch: $r")
        if (!r.isNullAt(1))
          assert(bits(r.getDouble(1)) == bits(r.getDouble(2)),
            s"id=${r.getLong(0)} cast=$cast norm ${r.getDouble(1)} vs ${r.getDouble(2)}")
        val (vn, vh) = (r.getSeq[Any](3), r.getSeq[Any](4))
        assert(vn.length == vh.length, s"normalize length: $r")
        vn.zip(vh).foreach {
          case (null, null) =>
          case (x: Double, y: Double) =>
            assert(bits(x) == bits(y), s"id=${r.getLong(0)} cast=$cast $x vs $y")
          case other => fail(s"id=${r.getLong(0)} mixed nullness: $other")
        }
      }
    }
    // null element: normalize -> all-null array of same length; norm2 -> null
    val e = spark.sql(
      "SELECT array(cast(1.0 as float), cast(null as float), cast(2.0 as float)) AS a")
      .select(VectorFunctions.norm2(col("a")).as("n_native"),
        VectorFunctions.norm2Hof(col("a")).as("n_hof"),
        VectorFunctions.normalize(col("a")).as("v_native"),
        VectorFunctions.normalizeHof(col("a")).as("v_hof")).collect()(0)
    assert(e.isNullAt(0) && e.isNullAt(1))
    assert(e.getSeq[Any](2) == Seq(null, null, null))
    assert(e.getSeq[Any](3) == Seq(null, null, null))
  }

  test("hyperplane-buckets kernel is bit-identical to the per-band dot-expression chain") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val dim = 16; val nBits = 6; val bands = 4; val seed = 42L
    // degenerate shapes the kernel must map exactly like the dot-NULL
    // expression semantics: wrong length, empty, NaN component
    val special = Seq(
      Array.fill(dim - 1)(1.0f),
      Array.empty[Float],
      Array.fill(dim)(Float.NaN))
    val vecs = special ++ Seq.fill(300)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val cols = (0 until bands).map(b =>
      VectorFunctions.hyperplaneBucketExpr(col("v"), dim, nBits, seed + b)
        .as(s"e$b"))
    val rows = df.select((col("id") +:
      VectorFunctions.hyperplaneBuckets(col("v"), dim, nBits, bands, seed)
        .as("k") +: cols): _*).collect()
    rows.foreach { r =>
      val kern = r.getSeq[Long](1)
      (0 until bands).foreach { b =>
        assert(kern(b) == r.getLong(2 + b),
          s"id=${r.getLong(0)} band=$b kernel=${kern(b)} expr=${r.getLong(2 + b)}")
      }
    }
    // null element: every band's dot is null -> bucket 0 everywhere
    val e = spark.sql(
      s"SELECT array(${Seq.fill(dim - 1)("cast(1.0 as float)").mkString(",")}, " +
        "cast(null as float)) AS v")
      .select(VectorFunctions.hyperplaneBuckets(col("v"), dim, nBits, bands, seed))
      .collect()(0).getSeq[Long](0)
    assert(e == Seq.fill(bands)(0L), s"null-element vector must bucket to 0: $e")
  }

  test("lsh topk: high recall vs brute force on clustered data") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // clustered vectors so neighbors are meaningful
    val centers = Array.fill(5)(Array.fill(16)(rng.nextGaussian() * 3))
    val vecs = (0L until 200L).map { i =>
      val c = centers(rng.nextInt(5))
      (i, c.map(v => (v + rng.nextGaussian() * 0.3).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.lshTopK(queries, df, "vec_id", "embedding", 5,
      dim = 16, nBits = 8, probes = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall too low")
  }

  test("dup clusters: connected components give canonical ids") {
    import spark.implicits._
    // 1-2, 2-3 chain; 5-6 pair; 9 isolated (not in pairs)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val clusters = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    val drops = Dedup.dupDropList(pairs).collect().map(_.getLong(0)).toSet
    assert(drops == Set(2L, 3L, 6L))
  }

  test("dup clusters: star CC matches union-find on chains and random graphs") {
    import spark.implicits._
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
    }
    // a 40-deep chain (the Pregel worst case) and three seeded random graphs
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val rng = new scala.util.Random(13)
    val graphs = chain +: Seq.tabulate(3)(_ =>
      Seq.fill(60)((rng.nextInt(50).toLong, rng.nextInt(50).toLong)))
    for (edges <- graphs) {
      val expected = unionFind(50, edges)
      // default: driver union-find gate (small pair graph)
      val got = Dedup.dupClusters(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"gate path, edges=$edges")
      // localEdgeLimit = 0 forces the distributed large/small-star
      // loop — both paths must produce identical labels
      val gotDist = Dedup.dupClusters(edges.toDF("id_a", "id_b"),
        localEdgeLimit = 0).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDist == expected, s"distributed path, edges=$edges")
    }
  }

  test("operator error paths: bad split fractions, empty benchmark") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = Seq((1L, "x")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("a" -> 0.8, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSample(df, "id", 1.5)
    }
    // empty benchmark: no contamination rows, no failure
    val emptyBench = Seq.empty[(Long, String)].toDF("bid", "btext")
    assert(graft.operators.Dedup.contamination(df, emptyBench,
      "id", "text", "bid", "btext").count() == 0)
  }

  test("contamination: embedded benchmark text flags, clean docs don't") {
    import spark.implicits._
    val benchText = "what is the capital city of france paris obviously"
    val bench = Seq((100L, benchText)).toDF("bid", "btext")
    val docs = Seq(
      // benchmark text verbatim inside a longer training doc
      (1L, "some preamble here " + benchText + " and a long trailer section"),
      (2L, "entirely unrelated content about spark catalyst optimizers"),
      // shares only ONE trigram -> below minShared
      (3L, "the capital city bakery sells excellent bread every day"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.contamination(docs, bench,
      "doc_id", "text", "bid", "btext", n = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    assert(got.length == 1, s"only doc 1 is contaminated: ${got.toList}")
    val (docId, benchId, shared, frac) = got.head
    assert(docId == 1L && benchId == 100L)
    // all 7 of the benchmark's trigrams appear in doc 1 -> containment 1.0
    assert(shared == 7L && frac == 1.0, s"shared=$shared frac=$frac")
  }

  test("tokenBudgetFilter: equals the naive global-window cut, heavy ties included") {
    import spark.implicits._
    import graft.operators.Sampling
    val rng = new scala.util.Random(23)
    // quality from a SMALL discrete set -> heavy ties (the case the
    // within-level PrefixSum stage exists for)
    val rows = (0L until 400L).map { i =>
      (i, Seq(0.2, 0.5, 0.5, 0.8, 1.0)(rng.nextInt(5)), 1 + rng.nextInt(30))
    }
    val df = rows.toDF("doc_id", "quality", "n_tokens")
    val budget = 3000L
    val got = Sampling
      .tokenBudgetFilter(df, "doc_id", "quality", "n_tokens", budget)
      .select("doc_id", "cum_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive oracle: sort (quality desc, id), inclusive cumsum, cut
    var cum = 0L
    val expect = rows.sortBy { case (id, q, _) => (-q, id) }
      .iterator.map { case (id, _, t) => cum += t; id -> cum }
      .takeWhile(_._2 <= budget).toMap
    assert(got == expect, s"sizes ${got.size} vs ${expect.size}")
    assert(got.nonEmpty && got.size < rows.size)
    // budget 0 keeps nothing; huge budget keeps everything
    assert(Sampling.tokenBudgetFilter(df, "doc_id", "quality", "n_tokens", 0L)
      .count() == 0)
    assert(Sampling.tokenBudgetFilter(df, "doc_id", "quality", "n_tokens",
      1000000L).count() == rows.size)
  }

  test("snapshotDiff: added/removed/changed/unchanged by content fingerprint") {
    import spark.implicits._
    import graft.operators.Checks
    val v1 = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "kept the same"),
      (4L, "will be removed")).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "ALPHA, beta!"), // normalization-equal -> unchanged
      (2L, "gamma delta epsilon"), // changed
      (3L, "kept the same"), // unchanged
      (5L, "brand new doc")).toDF("doc_id", "text") // added; 4 removed
    val got = Checks.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", 4L -> "removed", 5L -> "added"))
  }

  test("groupQuotaCap: exact naive top-N-per-group, prefilter fallback covered") {
    import spark.implicits._
    import graft.operators.Sampling
    // groups of very different sizes: 'big' (600 rows) exercises the
    // prefilter path (600 > 2*5+100), the small groups take frac=1
    val rows = (0L until 700L).map { i =>
      (i, if (i < 600) "big" else if (i < 650) "mid" else "small")
    }
    val df = rows.toDF("doc_id", "source")
    def naive(quota: Int): Set[(String, Long)] = {
      def bucket(id: Long): BigInt = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest((id.toString + "graft").getBytes("UTF-8"))
        BigInt(1, md.take(4))
      }
      rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
        rs.sortBy { case (id, _) => (bucket(id), id) }.take(quota)
          .map { case (id, _) => (g, id) }
      }.toSet
    }
    for (quota <- Seq(5, 60)) {
      val got = Sampling.groupQuotaCap(df, "doc_id", "source", quota)
        .select("source", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == naive(quota), s"quota=$quota: ${got.size} vs ${naive(quota).size}")
    }
    // a pathological margin forces the under-quota fallback branch: with
    // margin 0 and slack 1, at most ~1 expected survivor per big group,
    // yet the result must STILL be the exact naive cut
    val gotFb = Sampling.groupQuotaCap(df, "doc_id", "source", 5,
      margin = 0.0, slack = 1)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotFb == naive(5), "fallback path must restore exactness")
  }

  test("hashSplit: deterministic, exhaustive, near-requested fractions") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val a = Sampling.hashSplit(df, "id", splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row lands in exactly one split
    assert(a.values.sum == 2000L)
    // law of large numbers: within ±5 points of the requested fraction
    splits.foreach { case (name, f) =>
      val got = a.getOrElse(name, 0L).toDouble / 2000
      assert(math.abs(got - f) < 0.05, s"$name: $got vs $f")
    }
    // rerun-stable: identical assignment, different salt reshuffles
    val b = Sampling.hashSplit(df, "id", splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    val c = Sampling.hashSplit(df, "id", splits, salt = "other")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c.values.sum == 2000L && c != a, "salt must reshuffle")
    // hashSample keeps the hashSplit-train rows' complement semantics
    val n = Sampling.hashSample(df, "id", 0.25).count()
    assert(math.abs(n / 2000.0 - 0.25) < 0.05, s"sample kept $n")
  }

  test("keepBestPerCluster: argmax score per cluster, ties to min id") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "cluster_id")
    val scores = Seq((1L, 10), (2L, 30), (3L, 30), (5L, 7), (6L, 7))
      .toDF("id", "score")
    val got = graft.operators.Dedup.keepBestPerCluster(clusters, scores)
      .orderBy("cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // cluster 1: 2 and 3 tie at 30 -> min id 2; cluster 5: tie -> 5
    assert(got.toSeq == Seq((1L, 2L, 30), (5L, 5L, 7)), got.toList.toString)
    // the combiner rewrite must not ship a window: no Window node, and
    // a partial max appears below the exchange (map-side combine)
    val plan = graft.operators.Dedup.keepBestPerCluster(clusters, scores)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_max") || plan.contains("partial(max"), plan)
  }

  test("keepBestPerCluster: Long.MinValue id round-trips (bitwise-NOT, no negation overflow)") {
    import spark.implicits._
    val clusters = Seq((Long.MinValue, 1L), (7L, 1L)).toDF("id", "cluster_id")
    val scores = Seq((Long.MinValue, 50), (7L, 10)).toDF("id", "score")
    val got = graft.operators.Dedup.keepBestPerCluster(clusters, scores)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, Long.MinValue, 50)), got.toList.toString)
  }

  test("dropExactDuplicates rejects reserved __kfp/__kid input columns") {
    import spark.implicits._
    val bad = Seq((1L, "t", "x")).toDF("id", "text", "__kfp")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.dropExactDuplicates(bad, "id", "text")
    }
    assert(e.getMessage.contains("__kfp"), e.getMessage)
  }

  test("keepBestPerCluster: string ids take the two-phase path, same argmax semantics") {
    import spark.implicits._
    val clusters = Seq(("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"))
      .toDF("id", "cluster_id")
    val scores = Seq(("a", 10), ("b", 30), ("c", 30), ("x", 5))
      .toDF("id", "score")
    val got = graft.operators.Dedup.keepBestPerCluster(clusters, scores)
      .orderBy("cluster_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // b and c tie at 30 -> min id "b"
    assert(got.toSeq == Seq(("a", "b", 30), ("x", "x", 5)), got.toList.toString)
  }

  test("dup clusters: non-numeric (string/uuid) ids cluster on original ids") {
    import spark.implicits._
    // a long cast would null these out; the surrogate-id path must keep
    // the min ORIGINAL id as the canonical cluster label
    val pairs = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "y"))
      .toDF("id_a", "id_b")
    val clusters = Dedup.dupClusters(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(clusters == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a",
      "doc-c" -> "doc-a", "x" -> "x", "y" -> "x"))
  }

  test("pq topk: high recall vs brute force, certificate exact, deterministic") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val centers = Array.fill(4)(Array.fill(16)(rng.nextGaussian() * 3))
    val vecs = (0L until 160L).map { i =>
      val c = centers(rng.nextInt(4))
      (i, c.map(v => v + rng.nextGaussian() * 0.3))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def run() = Similarity.pqTopK(queries, df, "vec_id", "embedding", 5,
      m = 8, nCodes = 16).collect()
    val out = run()
    // the PQ contract is SHORTLIST generation: the exact top-5 should
    // survive into a k=20 approximate shortlist (a deployment re-ranks
    // the shortlist by score_fp), and the direct top-5 should still
    // catch most of them
    val short20 = Similarity.pqTopK(queries, df, "vec_id", "embedding", 20,
      m = 8, nCodes = 16).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val containment = (exact & short20).size.toDouble / exact.size
    assert(containment >= 0.85, s"pq shortlist containment $containment too low")
    val pq = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.4, s"pq direct recall $recall too low")
    // certificate column equals the true cosine of the selected pair
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    out.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(math.abs(r.getAs[Double]("score_fp") -
        cos(vecs(q.toInt)._2, vecs(n.toInt)._2)) < 1e-9)
      // asymmetric-distance score tracks the true cosine on this data
      assert(math.abs(r.getAs[Double]("score") -
        r.getAs[Double]("score_fp")) < 0.25)
    }
    // golden-ability: a second run is bit-identical
    assert(out.map(_.toString).toSeq == run().map(_.toString).toSeq)
  }

  test("ivfpq topk: shortlist containment vs brute force, exact certificates") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val centers = Array.fill(4)(Array.fill(16)(rng.nextGaussian() * 3))
    val vecs = (0L until 200L).map { i =>
      val c = centers(rng.nextInt(4))
      (i, c.map(v => (v + rng.nextGaussian() * 0.4).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def run(kk: Int) = Similarity.ivfpqTopK(queries, df, "vec_id", "embedding",
      kk, nLists = 8, nProbe = 3, m = 8, nCodes = 16).collect()
    // shortlist contract: the exact top-5 survives into a k=20 IVFPQ
    // shortlist (deployment re-ranks the shortlist by score_fp)
    val short20 = run(20)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val containment = (exact & short20).size.toDouble / exact.size
    assert(containment >= 0.85, s"ivfpq shortlist containment $containment")
    val out = run(5)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val d = ad.zip(bd).map { case (x, y) => x * y }.sum
      d / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    out.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      // certificate equals the true cosine; decomposed PQ score tracks it
      assert(math.abs(r.getAs[Double]("score_fp") -
        cos(vecs(q.toInt)._2, vecs(n.toInt)._2)) < 1e-9)
      assert(math.abs(r.getAs[Double]("score") -
        r.getAs[Double]("score_fp")) < 0.25)
    }
    // golden-ability: a second run is bit-identical
    assert(out.map(_.toString).toSeq == run(5).map(_.toString).toSeq)
  }

  test("ivf topk: high recall vs brute force on clustered data") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val centers = Array.fill(4)(Array.fill(12)(rng.nextGaussian() * 3))
    val vecs = (0L until 160L).map { i =>
      val c = centers(rng.nextInt(4))
      (i, c.map(v => (v + rng.nextGaussian() * 0.3).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.ivfTopK(queries, df, "vec_id", "embedding", 5,
      nLists = 8, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"ivf recall $recall too low")
  }

  test("ivf topk: nLists=256 stays cheap (broadcast centroids) and keeps recall") {
    // production-ish quantizer scale: with the old plan-literal cell
    // assignment this inlined 256 x 24 literals into the expression tree
    // and array_sort'ed 256 structs per row; the broadcast+mapPartitions
    // form keeps the plan O(1) in nLists. Recall is the behavior check.
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val centers = Array.fill(16)(Array.fill(24)(rng.nextGaussian() * 3))
    val vecs = (0L until 2000L).map { i =>
      val c = centers(rng.nextInt(16))
      (i, c.map(v => (v + rng.nextGaussian() * 0.3).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val t0 = System.nanoTime()
    val ivf = Similarity.ivfTopK(queries, df, "vec_id", "embedding", 5,
      nLists = 256, nProbe = 32)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"ivf@256 recall $recall too low")
    // generous wall bound: catches a return to plan-size-in-nLists
    // compilation (minutes), not scheduler noise
    assert(secs < 60.0, s"ivf@256 took ${secs}s — plan likely scales with nLists")
  }

  test("text functions: tokenization, ratios, langid markers") {
    import spark.implicits._
    val df = Seq(
      (1L, "The quick brown fox and the lazy dog in the yard."),
      (2L, "der hund und die katze sind nicht im haus"),
      (3L, ""),
      (4L, "12345 !!!")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextFunctions.wordCount(col("text")).as("wc"),
      TextFunctions.punctRatio(col("text")).as("pr"),
      TextFunctions.stopwordRatio(col("text")).as("sr"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.bpeTokenCount(col("text")).as("bpe"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getString(4), r.getInt(5)))
      .toMap
    assert(out(1L)._1 == 11)
    assert(out(1L)._4 == "en")
    assert(out(2L)._4 == "de")
    assert(out(3L)._1 == 0 && out(3L)._2 == 0.0)
    assert(out(4L)._5 == 5 + 3) // five digits + three bangs
    assert(out(1L)._3 > 0.3) // the/and/the/in/the of 11 words
  }

  test("multimodal: stub decode is deterministic, schema + partitioning hold") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "spark engine")).toDF("doc_id", "text")
    val media = graft.multimodal.Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val dec = graft.multimodal.Multimodal.withDecodedFeatures(media, "payload", 8)
      .repartition(3) // plumbing must survive arbitrary partitioning
    val rows = dec.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows(1L).length == 8)
    // determinism: same payload -> same features
    val again = graft.multimodal.Multimodal.withDecodedFeatures(media, "payload", 8)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows == again)
    assert(rows(1L) != rows(2L))
  }

  test("multimodal: real PNG codec roundtrips the pixel formula exactly") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    // driver-side roundtrip: encode then decode one image, check exact
    // against the closed-form channel means
    val id = 7L
    val w = (8 + id % 5).toInt; val h = (6 + id % 4).toInt
    val px = for { y <- 0 until h; x <- 0 until w } yield
      ((7 * x + 13 * y) % 256, (11 * x + 3 * y + 50) % 256, (5 * x + y + 100) % 256)
    val Some((dw, dh, mr, mg, mb)) = mm.decodeImageStats(mm.syntheticPng(id))
    assert(dw == w && dh == h)
    assert(math.abs(mr - px.map(_._1).sum.toDouble / (w * h)) < 1e-12)
    assert(math.abs(mg - px.map(_._2).sum.toDouble / (w * h)) < 1e-12)
    assert(math.abs(mb - px.map(_._3).sum.toDouble / (w * h)) < 1e-12)
    // distributed: encode + decode through mapPartitions, nulls for junk
    val ids = (0L until 10L).toDF("doc_id")
    val media = mm.syntheticPngMedia(ids, "doc_id").repartition(3)
    val stats = mm.withImageStats(media, "payload").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    (0L until 10L).foreach { i =>
      assert(stats(i) == ((8 + i % 5).toInt, (6 + i % 4).toInt), s"id $i")
    }
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, null))
      .toDF("media_id", "payload")
    val junkStats = mm.withImageStats(junk, "payload").collect()
    assert(junkStats.forall(r => r.isNullAt(r.fieldIndex("width"))))
  }

  test("unique word ratio: repetition scores low, empty/punct-only is 0") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, "buy now buy now buy now buy now"),
      (2L, "every word here is completely different"),
      (3L, "!!! ... ???"),
      (4L, "")
    ).toDF("id", "text")
    val got = df.select(col("id"),
      TextFunctions.uniqueWordRatio(col("text")).as("r"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 0.25) < 1e-12) // {buy, now} / 8
    assert(got(2L) == 1.0)
    assert(got(3L) == 0.0 && got(4L) == 0.0)
  }

  test("pii redaction: typed placeholders, counts, non-PII untouched") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, "mail a.smith+x@sub.example.org or call (555) 123-4567 now"),
      (2L, "server 10.0.200.7 leaked ssn 123-45-6789 and 555.867.5309"),
      (3L, "version 1.2 costs $3.50 on 2024-01-15, no pii here")
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextFunctions.redactPii(col("text")).as("red"),
      TextFunctions.piiCount(col("text"), TextFunctions.EmailPattern).as("ne"),
      TextFunctions.piiCount(col("text"), TextFunctions.Ipv4Pattern).as("ni"))
      .orderBy("id").collect()
    assert(out(0).getString(1) ==
      "mail <EMAIL> or call <PHONE> now")
    assert(out(0).getInt(2) == 1 && out(0).getInt(3) == 0)
    assert(out(1).getString(1) == "server <IP> leaked ssn <SSN> and <PHONE>")
    assert(out(1).getInt(3) == 1)
    // dates, versions, prices must survive (false-positive guard)
    assert(out(2).getString(1) ==
      "version 1.2 costs $3.50 on 2024-01-15, no pii here")
  }

  test("multimodal: JPEG decodes through the same codec path") {
    val mm = graft.multimodal.Multimodal
    val id = 3L
    val w = (8 + id % 5).toInt; val h = (6 + id % 4).toInt
    val px = for { y <- 0 until h; x <- 0 until w } yield
      ((7 * x + 13 * y) % 256, (11 * x + 3 * y + 50) % 256, (5 * x + y + 100) % 256)
    val Some((dw, dh, mr, mg, mb)) = mm.decodeImageStats(mm.syntheticJpeg(id))
    // dims survive the lossy roundtrip exactly; channel means only to a
    // compression tolerance (high-frequency synthetic content -> loose)
    assert(dw == w && dh == h)
    assert(math.abs(mr - px.map(_._1).sum.toDouble / (w * h)) < 32.0)
    assert(math.abs(mg - px.map(_._2).sum.toDouble / (w * h)) < 32.0)
    assert(math.abs(mb - px.map(_._3).sum.toDouble / (w * h)) < 32.0)
  }

  test("MJPEG-in-MP4: sample-table walk + ImageIO decode, bit-exact pixels") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    // driver-side: every sample decodes EXACTLY to the block formula —
    // quality-1.0 quantizers are all ones, and block-constant frames are
    // DC-only, so even the lossy codec round-trips bit-for-bit
    for (id <- 0L until 6L) {
      val (w, h, n) = mm.mjpegDims(id)
      val frames = mm.parseMjpegFrames(mm.syntheticMjpegMp4(id))
      assert(frames.length == n && frames.forall(_.ok), s"id=$id: $frames")
      frames.foreach { f =>
        assert(f.width == w && f.height == h)
        val bw = w / 8; val bh = h / 8
        val want = (for { by <- 0 until bh; bx <- 0 until bw }
          yield mm.mjpegBlockValue(id, f.frameIdx, bx, by))
          .sum.toDouble / (bw * bh)
        assert(f.meanGray == want, s"id=$id f=${f.frameIdx}: exact mean")
      }
    }
    // stride samples deterministically (id=2 has 4 frames)
    assert(mm.parseMjpegFrames(mm.syntheticMjpegMp4(2L), stride = 2)
      .map(_.frameIdx) == Seq(0, 2))
    // truncated sample -> quarantine row (ok=false), not failure: point
    // the LAST chunk offset past the payload end
    val payload = mm.syntheticMjpegMp4(1L) // 3 frames
    val stcoIdx = payload.indices.find(i => i + 4 <= payload.length &&
      new String(payload, i, 4, "ISO-8859-1") == "stco").get
    val nOff = 3
    val patchAt = stcoIdx + 12 + 4 * (nOff - 1)
    val bad = payload.clone()
    val tooFar = payload.length - 2
    bad(patchAt) = (tooFar >> 24).toByte; bad(patchAt + 1) = (tooFar >> 16).toByte
    bad(patchAt + 2) = (tooFar >> 8).toByte; bad(patchAt + 3) = tooFar.toByte
    val qs = mm.parseMjpegFrames(bad)
    assert(qs.length == 3 && qs.count(_.ok) == 2 && !qs.last.ok,
      s"truncated last sample must quarantine: $qs")
    // non-jpeg containers and junk route away (Nil -> all-null row)
    assert(mm.parseMjpegFrames(mm.syntheticMp4(1L)).isEmpty)
    assert(mm.parseMjpegFrames(Array[Byte](1, 2, 3)).isEmpty)
    assert(mm.parseMjpegFrames(null).isEmpty)
    // distributed plumbing: one row per frame, all decode_ok across
    // partitions; non-jpeg payloads yield the all-null quarantine row
    val ids = (0L until 8L).toDF("doc_id")
    val media = mm.syntheticMjpegMedia(ids, "doc_id").repartition(3)
    val rows = mm.withMjpegFrames(media, "payload").collect()
    val wantRows = (0L until 8L).map(i => 2 + (i % 3).toInt).sum
    assert(rows.length == wantRows)
    assert(rows.forall(r => r.getBoolean(r.fieldIndex("decode_ok"))))
    val mixed = mm.withMjpegFrames(
      mm.syntheticMp4Media(ids.limit(2), "doc_id"), "payload").collect()
    assert(mixed.length == 2 &&
      mixed.forall(_.isNullAt(mixed.head.fieldIndex("decode_ok"))))
  }

  test("bigram LM separates shuffled word order; unigram provably cannot") {
    import spark.implicits._
    val lm = graft.operators.LanguageModel
    val orig = "the quick brown fox jumps over the lazy dog"
    val shuf = "dog the over quick lazy jumps fox the brown" // same multiset
    // corpus: many docs phrased like `orig` establish the bigram stats
    val corpus = (1L to 20L).map(i => (i, orig)) :+
      (100L, orig) :+ (101L, shuf)
    val df = corpus.toDF("doc_id", "text")
    val uni = lm.pseudoPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val bi = lm.bigramPseudoPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // unigram: identical multiset => identical score, exact
    assert(uni(100L) == uni(101L),
      s"unigram must NOT separate: ${uni(100L)} vs ${uni(101L)}")
    // bigram: the shuffled doc's score must collapse (every bigram
    // backs off to alpha * unigram); in-order doc stays near 1/S
    assert(bi(101L) > bi(100L) * 2,
      s"bigram must separate: orig=${bi(100L)} shuf=${bi(101L)}")
    // first-token + seen-bigram scoring sanity on a tiny closed corpus:
    // doc "a b" twice -> c(a)=c(b)=2, N=4, c(ab)=2
    val tiny = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = lm.bigramPseudoPerplexity(tiny, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // token1: ln(2/4); token2: ln(c(ab)/c(a)) = ln(1) = 0
    val want = math.exp(-(math.log(2.0 / 4.0) + 0.0) / 2.0)
    got.foreach { case (_, n, p) =>
      assert(n == 2 && math.abs(p - want) < 1e-12, s"got $got want $want") }
  }

  test("bigram/trigram LM match a full-backoff driver reference on a random corpus") {
    import spark.implicits._
    // The operators score each position class with exactly ONE model
    // join, on the argument that self-LM backoff branches can never
    // fire. This reference implements the FULL Stupid-Backoff
    // recursion (backoff branches included) driver-side and must agree
    // exactly — and its backoff counters must stay at zero, proving
    // the dead-branch invariant on arbitrary data, not just the
    // closed-form corpora above.
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "Gamma", "delta-9", "ε", "zed",
      "the", "of", "and", "x7")
    val docs = (1L to 60L).map { id =>
      val n = 1 + rnd.nextInt(12)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else ", ")
    }
    val df = docs.toDF("doc_id", "text")
    def norm(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9]", " ")
        .replaceAll(" +", " ").trim.split(" ").toSeq.filter(_.nonEmpty)
    val toks = docs.map { case (id, t) => id -> norm(t) }.filter(_._2.nonEmpty)
    val all = toks.flatMap(_._2)
    val nTot = all.size.toDouble
    // cN(k): exact k-gram instance counts, k = 1..5
    val cN = (1 to 5).map(k => k -> toks.flatMap(_._2.sliding(k).filter(_.size == k))
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap).toMap
    var backoffs = 0
    // full Stupid-Backoff recursion: S over the longest available
    // context, alpha-backing off one context word at a time
    def score(ws: Seq[String], i: Int, ord: Int): Double = {
      val k = math.min(ord, i + 1)
      if (k == 1) math.log(cN(1)(Seq(ws(i))) / nTot)
      else cN(k).get(ws.slice(i - k + 1, i + 1)) match {
        case Some(c) => math.log(c / cN(k - 1)(ws.slice(i - k + 1, i)))
        case None => backoffs += 1; math.log(0.4) + score(ws, i, k - 1)
      }
    }
    def want(ord: Int): Map[Long, Double] = toks.map { case (id, ws) =>
      val ls = ws.indices.map(i => score(ws, i, ord))
      id -> math.exp(-ls.sum / ls.size)
    }.toMap
    val lm = graft.operators.LanguageModel
    def check(tag: String, got: Map[Long, Double], w: Map[Long, Double]) = {
      assert(got.keySet == w.keySet, s"$tag keyset mismatch")
      w.foreach { case (id, v) =>
        assert(math.abs(got(id) - v) <= 1e-9 * math.max(1.0, v),
          s"$tag doc $id: got ${got(id)} want $v") }
    }
    check("bigram", lm.bigramPseudoPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap, want(2))
    check("trigram", lm.trigramPseudoPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap, want(3))
    check("5-gram", lm.ngramPseudoPerplexity(df, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap, want(5))
    assert(backoffs == 0,
      s"self-LM reference took $backoffs backoff branches — the " +
        "one-join-per-position-class plan would be WRONG for this corpus")
  }

  test("gram keys are collision-free: normalizeText can never emit the separator") {
    import spark.implicits._
    // The single-string n-gram key is exact (not a hash) because
    // U+0001 cannot survive normalizeText — including when the RAW
    // input contains U+0001, separators, or anything else outside
    // [a-z0-9]: it all becomes a space, and words carry no spaces.
    val adversarial = Seq(
      "a\u0001b c", "x\u0001\u0001", "ab\u0001", "\u0001", "a  b",
      "\u00dcn\u00efcode \u0001 mix 42", "tab\tand\u0001newline\n")
    val got = adversarial.toDF("text")
      .select(TextFunctions.normalizeText(col("text")).as("n"))
      .collect().map(_.getString(0))
    got.foreach { n =>
      assert(!n.contains('\u0001'), s"separator survived: '$n'")
      assert(!n.split(" ").exists(_.contains(" ")))
    }
    // and key equality <=> tuple equality on sampled normalized tuples
    val rnd = new scala.util.Random(3)
    val words = Vector("a", "ab", "b", "ba", "aab", "1", "a1", "1a")
    val tuples = Seq.fill(400)(Seq.fill(3)(words(rnd.nextInt(words.size))))
    def key(t: Seq[String]) = t.mkString("\u0001")
    for (t1 <- tuples.take(80); t2 <- tuples.take(80))
      assert((key(t1) == key(t2)) == (t1 == t2), s"$t1 vs $t2")
  }

  test("external-LM n-gram gate matches the live-backoff reference (CCNet shape)") {
    import spark.implicits._
    // Reference corpus and scored corpus DIFFER: the cascade of left
    // joins must take real backoff branches, and words absent from the
    // reference corpus must land on the OOV floor — the exact paths the
    // self-LM fast path proves dead.
    val rnd = new scala.util.Random(7)
    val refVocab = Vector("alpha", "beta", "gamma", "delta", "zed", "the")
    val refDocs = (1L to 40L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(10))(refVocab(rnd.nextInt(refVocab.size)))
        .mkString(" ")
    }
    // scored docs mix reference vocab with OOV words and novel orders
    val crawlVocab = refVocab ++ Vector("qqq", "zzz9")
    val crawl = (100L to 140L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(9))(crawlVocab(rnd.nextInt(crawlVocab.size)))
        .mkString(" ")
    }
    val refDf = refDocs.toDF("doc_id", "text")
    val crawlDf = crawl.toDF("doc_id", "text")
    def norm(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9]", " ")
        .replaceAll(" +", " ").trim.split(" ").toSeq.filter(_.nonEmpty)
    val refToks = refDocs.map(d => norm(d._2)).filter(_.nonEmpty)
    val nTot = refToks.map(_.size).sum.toDouble
    val cN = (1 to 4).map(k => k -> refToks.flatMap(_.sliding(k).filter(_.size == k))
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap).toMap
    val oov = math.log(1e-9)
    var backoffs = 0
    def score(ws: Seq[String], i: Int, ord: Int): Double = {
      val k = math.min(ord, i + 1)
      if (k == 1) cN(1).get(Seq(ws(i)))
        .map(c => math.log(c / nTot)).getOrElse { oov }
      else cN(k).get(ws.slice(i - k + 1, i + 1)) match {
        case Some(c) => math.log(c / cN(k - 1)(ws.slice(i - k + 1, i)))
        case None => backoffs += 1; math.log(0.4) + score(ws, i, k - 1)
      }
    }
    val want = crawl.map { case (id, t) => id -> norm(t) }
      .filter(_._2.nonEmpty).map { case (id, ws) =>
        val ls = ws.indices.map(i => score(ws, i, 4))
        id -> math.exp(-ls.sum / ls.size)
      }.toMap
    val got = graft.operators.LanguageModel
      .ngramPseudoPerplexity(crawlDf, "doc_id", "text", 4,
        modelDocs = Some(refDf))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, v) =>
      assert(math.abs(got(id) - v) <= 1e-9 * math.max(1.0, v),
        s"doc $id: got ${got(id)} want $v") }
    assert(backoffs > 0,
      "external-LM test corpus must actually exercise the backoff cascade")
    // OOV words must floor, not drop: a doc of pure OOV words scores
    // exp(-oovLogp) exactly (pos 0) and alpha-chained floors after
    val pure = Seq(999L -> "qqq qqq").toDF("doc_id", "text")
    val gp = graft.operators.LanguageModel
      .ngramPseudoPerplexity(pure, "doc_id", "text", 2,
        modelDocs = Some(refDf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).head
    // token 1: oov; token 2: bigram miss -> ln(0.4) + oov
    val wantPure = math.exp(-(oov + (math.log(0.4) + oov)) / 2.0)
    assert(gp._2 == 2 && math.abs(gp._3 - wantPure) <= 1e-9 * wantPure,
      s"got $gp want $wantPure")
  }

  test("Moore-Lewis cross-entropy diff ≡ the two ppl gates it contrasts") {
    import spark.implicits._
    val lm = graft.operators.LanguageModel
    // pool = in-domain-vocab docs + out-vocab docs + mixed docs; the
    // in-domain slice is a SUBSET of the pool (the production shape)
    val rnd = new scala.util.Random(11)
    val vocabIn = Vector("alpha", "beta", "gamma", "delta", "the")
    val vocabOut = Vector("rocket", "engine", "turbo", "pump", "the")
    def mk(id: Long, v: Vector[String], n: Int) =
      id -> Seq.fill(n)(v(rnd.nextInt(v.size))).mkString(" ")
    val inDocs = (1L to 25L).map(i => mk(i, vocabIn, 3 + rnd.nextInt(8)))
    val outDocs = (100L to 124L).map(i => mk(i, vocabOut, 3 + rnd.nextInt(8)))
    val mixed = (200L to 209L).map(i =>
      mk(i, vocabIn ++ vocabOut, 3 + rnd.nextInt(8)))
    val pool = (inDocs ++ outDocs ++ mixed).toDF("doc_id", "text")
    val inDf = inDocs.toDF("doc_id", "text")
    val got = lm.crossEntropyDiff(pool, "doc_id", "text", inDf, order = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // differential: ce_out is exactly the self-LM trigram gate's
    // ln(ppl); ce_in exactly the external-mode gate's, model = inDf
    val selfPpl = lm.ngramPseudoPerplexity(pool, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val extPpl = lm.ngramPseudoPerplexity(pool, "doc_id", "text", 3,
        modelDocs = Some(inDf))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == selfPpl.keySet && got.keySet == extPpl.keySet)
    got.foreach { case (id, (n, ceIn, ceOut, ceDiff)) =>
      assert(n == selfPpl(id)._1, s"doc $id n_words")
      val wantOut = math.log(selfPpl(id)._2)
      val wantIn = math.log(extPpl(id))
      assert(math.abs(ceOut - wantOut) <= 1e-9 * math.max(1.0, wantOut.abs),
        s"doc $id ce_out: got $ceOut want $wantOut")
      assert(math.abs(ceIn - wantIn) <= 1e-9 * math.max(1.0, wantIn.abs),
        s"doc $id ce_in: got $ceIn want $wantIn")
      assert(math.abs(ceDiff - (ceIn - ceOut)) <= 1e-9,
        s"doc $id ce_diff inconsistent")
    }
    // selection semantics: every pure-in-domain doc ranks below every
    // pure-out-domain doc (out-vocab content words are OOV to the
    // in-domain LM, so their ce_in floors while ce_out stays typical)
    val worstIn = inDocs.map(d => got(d._1)._4).max
    val bestOut = outDocs.map(d => got(d._1)._4).min
    assert(worstIn < bestOut,
      s"in-domain docs must outrank out-domain: $worstIn vs $bestOut")
  }

  test("Moore-Lewis: a vocabulary-disjoint in-domain corpus floors every token") {
    import spark.implicits._
    val lm = graft.operators.LanguageModel
    // pool and in-domain share NO words: every in-domain-side score
    // bottoms out at the alpha-chained OOV floor, exactly computable
    val pool = Seq(1L -> "a b c", 2L -> "b c a b").toDF("doc_id", "text")
    val inDf = Seq(10L -> "x y z x").toDF("doc_id", "text")
    val oov = math.log(1e-9)
    val la = math.log(0.4)
    val got = lm.crossEntropyDiff(pool, "doc_id", "text", inDf, order = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // doc 1 (a b c): pos0 -> oov; pos1 -> alpha+oov; pos2 ->
    // alpha+(alpha+oov) (trigram+bigram both miss, chain descends
    // twice to the unigram floor)
    val want1 = -(oov + (la + oov) + (la + la + oov)) / 3.0
    assert(math.abs(got(1L)._2 - want1) <= 1e-12 * want1.abs,
      s"ce_in: ${got(1L)._2} vs $want1")
    // pool side stays the self-LM score (finite, small) so ce_diff
    // is dominated by the floor — every doc far above zero
    assert(got.values.forall(v => v._2 - v._3 > 10),
      s"fully-OOV in-domain must reject everything: $got")
  }

  test("DSIR hashed importance weights match the in-memory reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocabIn = Vector("alpha", "beta", "gamma", "delta", "the")
    val vocabOut = Vector("rocket", "engine", "turbo", "pump", "the")
    def mk(id: Long, v: Vector[String], n: Int) =
      id -> Seq.fill(n)(v(rnd.nextInt(v.size))).mkString(" ")
    val inDocs = (1L to 20L).map(i => mk(i, vocabIn, 2 + rnd.nextInt(9)))
    val outDocs = (100L to 119L).map(i => mk(i, vocabOut, 2 + rnd.nextInt(9)))
    val pool = (inDocs ++ outDocs).toDF("doc_id", "text")
    val target = inDocs.toDF("doc_id", "text")
    val B = 64 // small bucket count so hash COLLISIONS are exercised
    val got = Sampling.dsirWeights(pool, "doc_id", "text", target, buckets = B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // in-memory reference: same normalization, md5-first-8-hex bucket
    def norm(s: String) = s.toLowerCase.replaceAll("[^a-z0-9]", " ")
      .replaceAll(" +", " ").trim.split(" ").toSeq.filter(_.nonEmpty)
    def bucket(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % B
    }
    def grams(t: String): Seq[Long] = {
      val ws = norm(t)
      (ws ++ ws.sliding(2).filter(_.size == 2)
        .map(_.mkString("\u0001"))).map(bucket)
    }
    val poolB = (inDocs ++ outDocs).flatMap(d => grams(d._2))
    val tgtB = inDocs.flatMap(d => grams(d._2))
    val cr = poolB.groupBy(identity).view.mapValues(_.size).toMap
    val ct = tgtB.groupBy(identity).view.mapValues(_.size).toMap
    val distinctGrams = (inDocs ++ outDocs).flatMap { d =>
      val ws = norm(d._2)
      ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString("\u0001"))
    }.distinct.size
    def lam(b: Long) =
      math.log(ct.getOrElse(b, 0) + 1.0) - math.log(tgtB.size + B.toDouble) -
        math.log(cr(b) + 1.0) + math.log(poolB.size + B.toDouble)
    val want = (inDocs ++ outDocs).map { case (id, t) =>
      val gs = grams(t); id -> (gs.size.toLong, gs.map(lam).sum)
    }.toMap
    assert(got.keySet == want.keySet)
    // collisions must actually occur at B=64 or the test is weak:
    // more distinct gram strings than occupied buckets
    assert(distinctGrams > cr.size,
      s"want hash collisions: $distinctGrams grams in ${cr.size} buckets")
    want.foreach { case (id, (n, w)) =>
      assert(got(id)._1 == n, s"doc $id n_feats: ${got(id)._1} vs $n")
      assert(math.abs(got(id)._2 - w) <= 1e-9 * math.max(1.0, w.abs),
        s"doc $id log_w: ${got(id)._2} vs $w")
    }
    // selection semantics: target-like docs carry higher weights
    val worstIn = inDocs.map(d => got(d._1)._2).min
    val bestOut = outDocs.map(d => got(d._1)._2).max
    assert(worstIn > bestOut,
      s"in-domain docs must outweigh out-domain: $worstIn vs $bestOut")
  }

  test("dsirResample: derandomized Gumbel-top-k matches the reference, replays, respects T") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (1L to 200L).map(i => (i, rnd.nextDouble() * 10 - 5))
    val df = rows.toDF("doc_id", "log_w")
    def refKey(id: Long, w: Double, t: Double): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + "graft").getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16)
      val u = (h.toDouble + 0.5) / 4294967296.0
      val k = w / t - math.log(-math.log(u))
      math.rint(k * 1e6) / 1e6
    }
    val want = rows.map { case (id, w) => (id, refKey(id, w, 1.0)) }
      .sortBy { case (id, k) => (-k, id) }.take(25)
    val got = Sampling.dsirResample(df, "doc_id", "log_w", k = 25)
      .select("doc_id", "sample_key")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, k) => (-k, id) }.toSeq
    assert(got.map(_._1) == want.map(_._1),
      s"selection mismatch: ${got.map(_._1)} vs ${want.map(_._1)}")
    got.zip(want).foreach { case ((_, gk), (_, wk)) =>
      assert(math.abs(gk - wk) <= 1e-9, s"key $gk vs $wk") }
    // replay-stable: the same call selects the same set
    val again = Sampling.dsirResample(df, "doc_id", "log_w", k = 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got.map(_._1).toSet)
    // T -> 0 sharpens to plain top-k by weight (noise overwhelmed)
    val sharp = Sampling.dsirResample(df, "doc_id", "log_w", k = 25,
        temperature = 1e-9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sharp == rows.sortBy(-_._2).take(25).map(_._1).toSet,
      "T->0 must select exactly the top weights")
    // and the Gumbel noise genuinely reorders at T = 1 (not top-k)
    assert(got.map(_._1).toSet != sharp,
      "T=1 sample should differ from the deterministic top-k")
    // scalable selection: per-partition heaps, no global sort
    val plan = Sampling.dsirResample(df, "doc_id", "log_w", k = 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("trigram LM separates a bigram-preserving half-swap the bigram model scores flat") {
    import spark.implicits._
    val lm = graft.operators.LanguageModel
    val orig = "a b c d e f g h"
    val swap = "e f g h a b c d" // distant halves swapped
    // corpus: the original phrasing dominates; "x h a y e" docs support
    // the swap's junction BIGRAM (h,a) — so the bigram model sees every
    // bigram of BOTH probes at healthy counts — without supporting its
    // junction TRIGRAMS (g,h,a) and (h,a,b). The trailing "e" equalizes
    // the probes' FIRST-token unigram counts (c(a) = c(e)), so the
    // bigram scores differ only at the junction pair itself.
    val corpus = (1L to 8L).map(i => (i, orig)) ++
      (20L until 28L).map(i => (i, "x h a y e")) ++
      Seq(100L -> orig, 101L -> swap)
    val df = corpus.toDF("doc_id", "text")
    val bi = lm.bigramPseudoPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val tri = lm.trigramPseudoPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // bigram: every bigram of both probes is in-model -> near-flat
    val biRatio = bi(101L) / bi(100L)
    val triRatio = tri(101L) / tri(100L)
    assert(biRatio < 1.15,
      s"bigram should stay near-flat: orig=${bi(100L)} swap=${bi(101L)}")
    // trigram: the two junction trigrams back off (alpha * bigram) ->
    // the swapped doc's score must collapse well past the bigram gap
    assert(triRatio > 1.35 && triRatio > 2 * (biRatio - 1) + 1.2,
      s"trigram must separate: orig=${tri(100L)} swap=${tri(101L)} " +
        s"(ratio $triRatio, bigram ratio $biRatio)")
    // closed-corpus exactness: doc "a b c" twice -> token1 ln(2/6),
    // token2 ln(c(ab)/c(a)) = 0, token3 ln(c(abc)/c(ab)) = 0
    val tiny = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val got = lm.trigramPseudoPerplexity(tiny, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = math.exp(-math.log(2.0 / 6.0) / 3.0)
    got.foreach { case (_, n, p) =>
      assert(n == 3 && math.abs(p - want) < 1e-12, s"got $got want $want") }
    // and an unseen-everything token pays the full double backoff:
    // doc "q" once in a corpus of "a b c"s -> ln(c(q)/N) for pos 0
    val uq = Seq((1L, "a b c"), (2L, "q")).toDF("doc_id", "text")
    val gq = lm.trigramPseudoPerplexity(uq, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(gq(2L) - math.exp(-math.log(1.0 / 4.0))) < 1e-12)
  }

  test("multimodal: real WAV codec roundtrips the sample formula exactly") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    // driver-side roundtrip: encode then decode one stereo WAV, check
    // exact against the closed-form per-channel mean |amplitude|
    val id = 7L // 2 channels, 480 frames
    val ch = (1 + id % 2).toInt; val nf = (400 + (id % 5) * 40).toInt
    def meanAbs(c: Int): Double =
      (0 until nf).map(t => math.abs((31L * t + 17L * c + 7L * id) % 4001L
        - 2000L)).sum.toDouble / nf
    val Some((dch, dsr, dnf, means)) = mm.decodeWavStats(mm.syntheticWav(id))
    assert(dch == ch && dsr == 8000 && dnf == nf)
    assert(means.length == ch)
    (0 until ch).foreach(c => assert(means(c) == meanAbs(c),
      s"channel $c: ${means(c)} vs ${meanAbs(c)}"))
    // distributed: encode + decode through mapPartitions, one row per
    // channel; junk payloads yield a single all-null stats row
    val ids = (0L until 10L).toDF("doc_id")
    val media = mm.syntheticWavMedia(ids, "doc_id").repartition(3)
    val stats = mm.withAudioStats(media, "payload").collect()
    assert(stats.length == (0L until 10L).map(i => 1 + (i % 2).toInt).sum)
    stats.foreach { r =>
      val i = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("channels") == (1 + i % 2).toInt)
      assert(r.getAs[Long]("n_frames") == 400 + (i % 5) * 40)
    }
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, null))
      .toDF("media_id", "payload")
    val junkStats = mm.withAudioStats(junk, "payload").collect()
    assert(junkStats.length == 2)
    assert(junkStats.forall(r => r.isNullAt(r.fieldIndex("channels"))))
  }

  test("span dedup: repeats drop, first occurrence and order survive") {
    import spark.implicits._
    val t = graft.functions.TextFunctions
    // 2-word spans: "a b|c d|a b|e f" -> repeated "a b" removed
    val df = Seq(
      (1L, "a b c d a b e f"),
      (2L, "x y"),        // shorter than one span
      (3L, ""),           // empty -> empty
      (4L, "p q r")       // ragged tail span "r"
    ).toDF("id", "text")
    val out = df.select(col("id"),
      t.dedupSpans(col("text"), 2).as("clean"),
      size(t.spanArray(col("text"), 2)).as("n"),
      size(array_distinct(t.spanArray(col("text"), 2))).as("u"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "a b c d e f")
    assert(out(0).getInt(2) == 4 && out(0).getInt(3) == 3)
    assert(out(1).getString(1) == "x y" && out(1).getInt(2) == 1)
    assert(out(2).getString(1) == "" && out(2).getInt(2) == 0)
    assert(out(3).getString(1) == "p q r" && out(3).getInt(2) == 2)
    // order preservation with an interleaved repeat
    val o2 = df.filter(col("id") === 1).select(
      t.dedupSpans(concat(lit("z z "), col("text")), 2)).head.getString(0)
    assert(o2 == "z z a b c d e f")
  }

  test("pseudo-perplexity: uniform corpus ppl equals vocab size; rare words raise it") {
    import spark.implicits._
    val lmOps = graft.operators.LanguageModel
    // uniform unigram LM: every word appears exactly once -> p = 1/V,
    // ppl = exp(-mean ln(1/V)) = V exactly, for every doc
    val uniform = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("doc_id", "text")
    val up = lmOps.pseudoPerplexity(uniform, "doc_id", "text")
      .orderBy("doc_id").collect()
    up.foreach(r => assert(math.abs(r.getAs[Double]("pseudo_ppl") - 5.0) < 1e-9))
    // skewed corpus: a doc of corpus-common words scores LOWER than a
    // doc of corpus-rare words (the gate's decision direction)
    val skewed = Seq(
      (1L, "the the the the the the the the"),
      (2L, "zyx wvu")).toDF("doc_id", "text")
    val sp = lmOps.pseudoPerplexity(skewed, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(sp(0).getAs[Double]("pseudo_ppl") < sp(1).getAs[Double]("pseudo_ppl"))
    // external LM + OOV floor: unseen words hit oovLogp, rows survive
    val lm = lmOps.unigramLogProbs(uniform, "text")
    val scored = lmOps.pseudoPerplexity(
      Seq((9L, "alpha UNSEEN")).toDF("doc_id", "text"), "doc_id", "text",
      lm = Some(lm), oovLogp = math.log(1e-6))
      .collect()
    assert(scored.length == 1 && scored(0).getAs[Long]("n_words") == 2)
    val expected = math.exp(-(math.log(1.0 / 5) + math.log(1e-6)) / 2)
    assert(math.abs(scored(0).getAs[Double]("pseudo_ppl") - expected) < 1e-6)
  }

  test("data checks: one-pass audit counts false AND null as violations") {
    import spark.implicits._
    import graft.operators.Checks.Check
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, -1.0), (3L, null), (null, 2.0))
      .toDF("id", "v").repartition(3)
    val out = graft.operators.Checks.audit(df, Seq(
      Check("v_positive", col("v") > 0),        // -1 false, null null -> 2
      Check("id_nonnull", col("id").isNotNull), // one null id -> 1
      Check("always", lit(true))))
      .orderBy("check").collect()
    val m = out.map(r => r.getString(0) ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"))).toMap
    assert(m("v_positive") == (4L, 2L), s"got ${m("v_positive")}")
    assert(m("id_nonnull") == (4L, 1L))
    assert(m("always") == (4L, 0L))
    val rates = out.map(r => r.getString(0) -> r.getAs[Double]("violation_rate")).toMap
    assert(rates("v_positive") == 0.5 && rates("always") == 0.0)
  }

  test("mixture sampling: temperature fractions + deterministic keep set") {
    import spark.implicits._
    val s = graft.operators.Sampling
    // alpha = 0 equalizes expected kept counts: r_g ∝ 1/n_g, max -> 1
    val f0 = s.temperatureFractions(Map("big" -> 1000L, "small" -> 100L), 0.0)
    assert(f0("small") == 1.0)
    assert(math.abs(f0("big") - 0.1) < 1.0 / 4096, s"got ${f0("big")}")
    // alpha = 1 keeps everything
    val f1 = s.temperatureFractions(Map("big" -> 1000L, "small" -> 100L), 1.0)
    assert(f1.values.forall(_ == 1.0))
    // alpha = 0.5: r_big/r_small = sqrt(100/1000) ~ 0.316
    val fh = s.temperatureFractions(Map("big" -> 1000L, "small" -> 100L), 0.5)
    assert(math.abs(fh("big") - math.sqrt(0.1)) < 1.0 / 4096)
    // deterministic keep set: same rows kept on reruns and layouts;
    // expected counts track the fractions
    val docs = (0L until 2000L).map(i =>
      (i, if (i < 1600) "big" else "small")).toDF("doc_id", "source")
    val fr = Map("big" -> 0.25, "small" -> 1.0)
    val k1 = s.mixtureSample(docs, "doc_id", "source", fr)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val k2 = s.mixtureSample(docs.repartition(7), "doc_id", "source", fr)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(k1.toSeq == k2.toSeq, "kept set depends on layout")
    val keptBig = k1.count(_ < 1600)
    assert(math.abs(keptBig - 400) < 80, s"big kept $keptBig, expect ~400")
    assert(k1.count(_ >= 1600) == 400, "small keeps every row at frac 1.0")
  }

  test("length quantiles: histogram type-1 order statistics, exact") {
    import spark.implicits._
    // src a: lengths 1..10 (one word each count) -> q(p) = ceil(10p)-th
    // value = ceil(10p); src b: heavy tie mass at 5
    val docs = ((1 to 10).map(n => ("a", Seq.fill(n)("w").mkString(" "))) ++
      Seq.fill(9)(("b", "w w w w w")) :+ ("b", "w"))
      .toDF("source", "text").repartition(3)
    val q = graft.operators.CorpusStats
      .lengthQuantiles(docs, "source", "text", Seq(0.25, 0.5, 0.9, 0.99))
      .orderBy("source").collect()
    val a = q(0)
    assert(a.getAs[Long]("n_docs") == 10 && a.getAs[Long]("p25") == 3 &&
      a.getAs[Long]("p50") == 5 && a.getAs[Long]("p90") == 9 &&
      a.getAs[Long]("p99") == 10)
    val b = q(1)
    // cum: len1 -> 1, len5 -> 10; ceil(.25*10)=3 lands in the tie mass
    assert(b.getAs[Long]("p25") == 5 && b.getAs[Long]("p50") == 5 &&
      b.getAs[Long]("p99") == 5)
  }

  test("sequence packing: offsets, straddles, manifest, no single-partition plan") {
    import spark.implicits._
    val p = graft.operators.Packing
    // token counts 3,4,2,5 at seqLen=4 -> offsets 0,3,7,9
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i"), (4L, "j k l m n"))
      .toDF("doc_id", "text").repartition(3)
    val off = p.packOffsets(docs, "doc_id", "text", seqLen = 4)
      .orderBy("doc_id").collect()
    val got = off.map(r => (r.getAs[Long]("token_offset"),
      r.getAs[Long]("first_seq"), r.getAs[Long]("last_seq")))
    assert(got.toSeq == Seq((0L, 0L, 0L), (3L, 0L, 1L), (7L, 1L, 2L),
      (9L, 2L, 3L)))
    val man = p.packManifest(docs, "doc_id", "text", seqLen = 4)
      .orderBy("seq_id").collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_straddling")))
    assert(man.toSeq == Seq((0L, 2L, 1L), (1L, 2L, 2L), (2L, 2L, 2L),
      (3L, 1L, 1L)))
    // the 100-TB claim: the global cumsum never funnels through one task
    val plan = p.packOffsets(docs, "doc_id", "text", seqLen = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "packing plan contains a single-partition exchange")
    // empty doc: zero tokens, occupies (not advances) the cursor
    val withEmpty = docs.union(Seq((5L, "")).toDF("doc_id", "text"))
    val e = p.packOffsets(withEmpty, "doc_id", "text", seqLen = 4)
      .filter(col("doc_id") === 5L).head
    assert(e.getAs[Long]("n_tokens") == 0L &&
      e.getAs[Long]("token_offset") == 14L &&
      e.getAs[Long]("first_seq") == 3L && e.getAs[Long]("last_seq") == 3L)
  }

  test("resumable pack: checkpoint + continue == one-shot pack at every cut") {
    import spark.implicits._
    val p = graft.operators.Packing
    // ws-token ids via a deterministic per-word id (hash-free: word
    // length), seqLen 4 so carries of every size 0..3 arise
    val ids: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => transform(split(trim(c), " +"), w => length(w).cast("int"))
    val docs = Seq(
      (1L, "a bb ccc"), (2L, "dddd e"), (3L, "ff ggg hh i"),
      (4L, "jj"), (5L, "kkkk llll m nn ooo")).toDF("doc_id", "text")
    // the FULL contract: ids AND n_docs AND doc_spans AND loss_mask —
    // the carry splices per document span, so even the boundary
    // sequence's masks must equal the one-shot pack's
    def sig(df: org.apache.spark.sql.DataFrame) = df
      .select(col("seq_id"), col("n_tokens"), col("n_docs"),
        concat_ws(",", transform(col("input_ids"), _.cast("string")))
          .as("ids"),
        concat_ws(",", transform(col("doc_spans"),
          x => concat(x("start"), lit(":"), x("end")))).as("spans"),
        concat_ws("", transform(col("loss_mask"), _.cast("string")))
          .as("mask"))
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getString(5))).toSeq
    val full = sig(p.packTokenSequences(docs, "doc_id", "text", 4, ids))
    for (cut <- 0L to 5L) {
      val first = p.packTokenSequences(
        docs.filter(col("doc_id") <= cut), "doc_id", "text", 4, ids)
      val st = p.packState(first, 4)
      val cont = p.packTokenSequences(
        docs.filter(col("doc_id") > cut), "doc_id", "text", 4, ids,
        resume = Some(st))
      val keepBelow =
        if (st.carryIds.nonEmpty) st.total / 4 else Long.MaxValue
      val merged = (sig(first).filter(_._1 < keepBelow) ++ sig(cont))
        .sortBy(_._1)
      assert(merged == full, s"cut=$cut state=$st")
    }
    // exact-boundary checkpoint: first two docs = 3+2+... tokens; craft
    // a cut where total is a multiple of seqLen -> empty carry, pure
    // offset shift
    val evenDocs = Seq((1L, "a b c d"), (2L, "e f g"), (3L, "h"))
      .toDF("doc_id", "text")
    val f1 = p.packTokenSequences(
      evenDocs.filter(col("doc_id") === 1L), "doc_id", "text", 4, ids)
    val st1 = p.packState(f1, 4)
    assert(st1.total == 4L && st1.carryIds.isEmpty)
    // malformed state fails loud
    intercept[IllegalArgumentException] {
      p.packTokenSequences(evenDocs, "doc_id", "text", 4, ids,
        resume = Some(p.PackState(5L, Seq.empty, Seq.empty)))
    }
    // empty continuation re-emits the carried partial row complete
    // (docs total 15 tokens -> carry of 3)
    val fAll = p.packTokenSequences(docs, "doc_id", "text", 4, ids)
    val stAll = p.packState(fAll, 4)
    assert(stAll.carryIds.nonEmpty)
    val contEmpty = p.packTokenSequences(
      docs.filter(lit(false)), "doc_id", "text", 4, ids,
      resume = Some(stAll))
    val tail = sig(contEmpty)
    assert(tail.map(_._1) == Seq(stAll.total / 4) &&
      tail.head._2 == stAll.carryIds.length)
    // an EMPTY pack frame yields the fresh checkpoint — stateful
    // callers must keep their prior state (DocStreams does)
    assert(p.packState(contEmpty.filter(lit(false)), 4) == p.FreshPack)
  }

  test("sampler manifest: complete permutation, round-robin ranks, epoch-distinct") {
    import spark.implicits._
    val p = graft.operators.Packing
    // 10 docs x 7 ws tokens = 70 tokens -> 18 sequences at seqLen=4
    val docs = (1L to 10L)
      .map(i => (i, "a b c d e f g")).toDF("doc_id", "text")
      .repartition(3)
    val m = p.samplerManifest(docs, "text", seqLen = 4, worldSize = 4,
      epoch = 1L, seed = 7L).collect()
    assert(m.length == 18)
    // global_step is a complete permutation of 0..n-1
    assert(m.map(_.getAs[Long]("global_step")).sorted.toSeq ==
      (0L until 18L))
    // round-robin rank assignment, resumable local steps
    m.foreach { r =>
      val gs = r.getAs[Long]("global_step")
      assert(r.getAs[Long]("world_rank") == gs % 4)
      assert(r.getAs[Long]("local_step") == gs / 4)
    }
    // a different epoch is a DIFFERENT complete permutation of the
    // same sequence set
    val m2 = p.samplerManifest(docs, "text", seqLen = 4, worldSize = 4,
      epoch = 2L, seed = 7L).collect()
    assert(m2.map(_.getAs[Long]("global_step")).sorted.toSeq ==
      (0L until 18L))
    val order1 = m.sortBy(_.getAs[Long]("seq_id"))
      .map(_.getAs[Long]("global_step")).toSeq
    val order2 = m2.sortBy(_.getAs[Long]("seq_id"))
      .map(_.getAs[Long]("global_step")).toSeq
    assert(order1 != order2, "epochs must not share an order")
    // empty corpus -> empty manifest, no failure
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(p.samplerManifest(empty, "text", 4, 4, 1L, 7L).count() == 0L)
    // scale shape: no single-partition exchange in the rank plan
    val plan = p.samplerManifest(docs, "text", seqLen = 4, worldSize = 4,
      epoch = 1L, seed = 7L).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "sampler manifest plan contains a single-partition exchange")
  }

  test("multimodal: real GIF video codec roundtrips per-frame formula exactly") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    // driver-side roundtrip: the indexed-gray frames make the GIF
    // encode lossless, so every sampled frame mean is exact
    val id = 4L // 3 frames, 12x6
    val w = (8 + id % 5).toInt; val h = (6 + id % 4).toInt
    val nf = (2 + id % 3).toInt
    def meanGray(f: Int): Double =
      (for { y <- 0 until h; x <- 0 until w }
        yield (7 * x + 13 * y + 29 * f) % 256).sum.toDouble / (w * h)
    val Some(frames) = mm.decodeGifFrameStats(mm.syntheticGif(id))
    assert(frames.length == nf)
    frames.zipWithIndex.foreach { case (fr, f) =>
      assert(fr.width == w && fr.height == h)
      assert(fr.meanGray == meanGray(f), s"frame $f: ${fr.meanGray} vs ${meanGray(f)}")
      // real metadata roundtrip: the encoder wrote 4 cs = 40 ms/frame
      assert(fr.delayMs == 40)
    }
    // distributed: encode + decode + stride-2 frame sampling through
    // mapPartitions; junk payloads yield a single all-null stats row
    val ids = (0L until 12L).toDF("doc_id")
    val media = mm.syntheticGifMedia(ids, "doc_id").repartition(3)
    val stats = mm.withVideoFrameStats(media, "payload", stride = 2).collect()
    // frames per id: 2 + id%3 in {2,3,4}; stride-2 samples {0} or {0,2}
    val expected = (0L until 12L).map(i => if (2 + i % 3 >= 3) 2 else 1).sum
    assert(stats.length == expected)
    stats.foreach { r =>
      val i = r.getAs[Long]("media_id")
      val f = r.getAs[Int]("frame_idx")
      assert(f % 2 == 0)
      assert(r.getAs[Int]("n_frames") == (2 + i % 3).toInt)
      assert(r.getAs[Long]("duration_ms") == (2 + i % 3) * 40L)
      assert(r.getAs[Double]("mean_luma") ==
        (for { y <- 0 until (6 + i % 4).toInt; x <- 0 until (8 + i % 5).toInt }
          yield (7 * x + 13 * y + 29 * f) % 256).sum.toDouble
          / ((8 + i % 5) * (6 + i % 4)))
    }
    val junk = Seq((1L, Array[Byte](9, 9, 9)), (2L, null))
      .toDF("media_id", "payload")
    val junkStats = mm.withVideoFrameStats(junk, "payload").collect()
    assert(junkStats.length == 2)
    assert(junkStats.forall(r => r.isNullAt(r.fieldIndex("n_frames"))))
  }

  test("multimodal: undecodable payloads route to quarantine, not failure") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    val good = mm.syntheticPngMedia((0L until 4L).toDF("doc_id"), "doc_id")
    val jpeg = Seq((100L, mm.syntheticJpeg(100L))).toDF("media_id", "payload")
    val bad = Seq((200L, Array[Byte](9, 9, 9, 9)),
      (201L, null)).toDF("media_id", "payload")
    val mixed = good.union(jpeg).union(bad).repartition(3)
    val (ok, quarantine) = mm.routeUndecodable(mixed, "payload")
    assert(ok.count() == 5, "4 PNGs + 1 JPEG decode")
    val qIds = quarantine.select("media_id").collect().map(_.getLong(0)).toSet
    assert(qIds == Set(200L, 201L), s"quarantined: $qIds")
    // quarantine keeps the ORIGINAL columns (payload intact for audit)
    assert(quarantine.columns.toSeq == mixed.columns.toSeq)
  }

  test("image dHash: contrast variant stays near, pairs are pigeonhole-exact") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    // driver side: the contrast-halved re-encode preserves luma
    // gradient signs, so its dHash sits within a few bits of the base
    // (bits flip only where adjacent box means nearly tie) — while the
    // payload BYTES and raw pixels both differ (exact dedup is blind)
    val ids = 0L until 60L
    val variantDist = ids.map { id =>
      val a = mm.dHash64(mm.syntheticPngId(id)).get
      val b = mm.dHash64(mm.syntheticPngContrast(id)).get
      assert(!java.util.Arrays.equals(
        mm.syntheticPngId(id), mm.syntheticPngContrast(id)))
      java.lang.Long.bitCount(a ^ b)
    }
    assert(variantDist.count(_ <= 3) >= 50,
      s"variant hamming distances: $variantDist")
    assert(mm.dHash64(mm.syntheticPngId(3L)) ==
      mm.dHash64(mm.syntheticPngId(3L)), "deterministic")

    // distributed operator == driver all-pairs reference: every pair
    // at hamming <= 3 MUST appear (a 3-bit difference cannot touch
    // all 4 of the 16-bit bands), none above the threshold; junk and
    // null payloads drop out without failing the job
    val base = mm.syntheticPngIdMedia(ids.toDF("doc_id"), "doc_id")
    val variants = mm.syntheticPngIdMedia(
      ids.filter(_ % 5 == 0).toDF("doc_id"), "doc_id", contrast = true)
      .withColumn("media_id", col("media_id") + 100000)
    val junk = Seq((900000L, Array[Byte](1, 2, 3)),
      (900001L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
    val got = mm.imageDupPairs(
      base.unionByName(variants).unionByName(junk).repartition(5),
      "media_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = ids.map(i => i -> mm.dHash64(mm.syntheticPngId(i)).get) ++
      ids.filter(_ % 5 == 0)
        .map(i => (i + 100000) -> mm.dHash64(mm.syntheticPngContrast(i)).get)
    val ref = (for {
      (ia, fa) <- all; (ib, fb) <- all if ia < ib
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == ref, s"got ${got.size} pairs, reference ${ref.size}")
    assert(ref.nonEmpty, "fixture must actually plant findable pairs")
    assert(got.forall(p => p._1 < 900000L && p._2 < 900000L))
  }

  test("video frame dHash: modular shared frames + re-upload detection") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    // the block formula is modular: frame f of id and frame f-2 of
    // id+58 have IDENTICAL pixels (29*2 = 58, same wide geometry), so
    // their per-frame dHashes must be equal bit-for-bit
    val a = mm.parseMjpegFrames(mm.syntheticMjpegMp4Wide(1L))
    val b = mm.parseMjpegFrames(mm.syntheticMjpegMp4Wide(59L))
    assert(a.forall(_.ok) && b.forall(_.ok))
    assert(a(2).dhash.isDefined && a(2).dhash == b(0).dhash,
      s"frame(1,2)=${a(2).dhash} frame(59,0)=${b(0).dhash}")
    // ...and frames with different phase get different hashes (the
    // wide geometry exists so dHash discriminates at all)
    assert(a.map(_.dhash).distinct.size == a.size)

    // distributed: a byte-identical re-upload at another media_id is
    // found with ALL its frames shared at hamming 0
    val ids = (0L until 40L).toDF("doc_id")
    val base = mm.syntheticMjpegWideMedia(ids, "doc_id")
    val reupload = mm.syntheticMjpegWideMedia(Seq(7L).toDF("doc_id"), "doc_id")
      .withColumn("media_id", col("media_id") + 1000)
    val cands = mm.videoDupCandidates(base.unionByName(reupload).repartition(4),
      "media_id", "payload", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getInt(3))).toSet
    val nFrames7 = mm.mjpegWideDims(7L)._3
    assert(cands.contains((7L, 1007L, nFrames7.toLong, 0)),
      s"re-upload of 7 must share all $nFrames7 frames: $cands")
    // a natural modular pair appears too: frame f+1 of id 1 equals
    // frame f of id 30 (29*1 = 29), two overlapping frames
    assert(cands.exists(c => c._1 == 1L && c._2 == 30L && c._3 >= 2L),
      s"$cands")
  }

  test("audio dHash: volume-shift variant stays near, pairs pigeonhole-exact") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    // a uniform gain scales every band energy by g^2 — the temporal
    // sign bits are invariant up to quantization rounding, so the
    // variant's fingerprint sits within a few bits of the base
    val ids = 0L until 60L
    val variantDist = ids.map { id =>
      val a = mm.audioDHash64(mm.syntheticWavId(id)).get
      val b = mm.audioDHash64(mm.syntheticWavId(id, gain = 0.4)).get
      assert(!java.util.Arrays.equals(
        mm.syntheticWavId(id), mm.syntheticWavId(id, gain = 0.4)))
      java.lang.Long.bitCount(a ^ b)
    }
    assert(variantDist.count(_ <= 3) >= 50,
      s"variant hamming distances: $variantDist")
    // fingerprints must discriminate across ids (the id-SPECTRUM
    // generator exists because the sawtooth fixture would collapse)
    val hashes = ids.map(i => mm.audioDHash64(mm.syntheticWavId(i)).get)
    assert(hashes.distinct.size >= 55, s"${hashes.distinct.size} distinct")

    // distributed operator == driver all-pairs reference; junk/null
    // and too-short clips drop out without failing
    val base = mm.syntheticWavIdMedia(ids.toDF("doc_id"), "doc_id")
    val variants = mm.syntheticWavIdMedia(
      ids.filter(_ % 5 == 0).toDF("doc_id"), "doc_id", gain = 0.4)
      .withColumn("media_id", col("media_id") + 100000)
    val junk = Seq((900000L, Array[Byte](1, 2, 3)),
      (900001L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
    val got = mm.audioDupPairs(
      base.unionByName(variants).unionByName(junk).repartition(5),
      "media_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = ids.map(i => i -> mm.audioDHash64(mm.syntheticWavId(i)).get) ++
      ids.filter(_ % 5 == 0)
        .map(i => (i + 100000) ->
          mm.audioDHash64(mm.syntheticWavId(i, gain = 0.4)).get)
    val ref = (for {
      (ia, fa) <- all; (ib, fb) <- all if ia < ib
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == ref, s"got ${got.size} pairs, reference ${ref.size}")
    assert(ref.nonEmpty, "fixture must plant findable pairs")
  }

  test("audio dHash: resampled copy (8 kHz vs 16 kHz) keeps the fingerprint") {
    val mm = graft.multimodal.Multimodal
    // the Goertzel probes sit at ABSOLUTE frequencies (400·(j+1) Hz),
    // so sampling the same continuous signal at 16 kHz lands on the
    // same bands — the routine resample re-encode must stay a near-dup
    val ids = 0L until 60L
    val dist = ids.map { id =>
      val a = mm.audioDHash64(mm.syntheticWavId(id)).get
      val b = mm.audioDHash64(mm.syntheticWavId(id, 1.0, 16000)).get
      java.lang.Long.bitCount(a ^ b)
    }
    assert(dist.count(_ <= 3) >= 50, s"resample hamming distances: $dist")
  }

  test("dHash box compare is exact where a 64-bit product would wrap") {
    val mm = graft.multimodal.Multimodal
    // sums·counts straddling 2^63: the wrapped product says a*b < c*d,
    // the true 128-bit compare says greater (a gigapixel near-white
    // image hits exactly this regime)
    val b = 1L << 32
    val a = (1L << 31) + 1000L // a*b = 2^63 + 1000·2^32 -> wraps negative
    val c = (1L << 31) - 1000L // c*b = 2^63 - 1000·2^32 -> stays positive
    assert(a * b < c * b, "precondition: the naive compare is wrong here")
    assert(mm.prodGreater(a, b, c, b))
    assert(!mm.prodGreater(c, b, a, b))
    assert(!mm.prodGreater(a, b, a, b), "equal products are not greater")
    // parity with the naive compare in the non-overflow regime
    val rng = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      val (x, y, u, v) = (rng.nextInt(1 << 20).toLong,
        rng.nextInt(1 << 20).toLong, rng.nextInt(1 << 20).toLong,
        rng.nextInt(1 << 20).toLong)
      assert(mm.prodGreater(x, y, u, v) == (x * y > u * v))
    }
  }

  test("lengthBucketedBatches: band capacity math, batch budget, oversize routing") {
    import spark.implicits._
    val docs = (0L until 200L).map { i =>
      // lengths 1..40 plus two oversize monsters
      val n = if (i >= 198) 1000 else (i % 40 + 1)
      (i, Seq.fill(n.toInt)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.operators.Packing.lengthBucketedBatches(
      docs, "doc_id", "text", bucketEdges = Seq(8L, 16L, 40L),
      batchTokens = 64L).collect()
    assert(got.length == 200, "routed, never dropped")
    val over = got.filter(_.getBoolean(5))
    assert(over.map(_.getLong(0)).sorted.toSeq == Seq(198L, 199L))
    assert(over.forall(r => r.isNullAt(2) && r.isNullAt(3)))
    val ok = got.filterNot(_.getBoolean(5))
    // reference: per band ordered by doc_id, capacity = 64/band
    val byBand = ok.groupBy(_.getLong(2))
    byBand.foreach { case (band, rows) =>
      val cap = 64L / band
      rows.sortBy(_.getLong(0)).zipWithIndex.foreach { case (r, idx) =>
        assert(r.getLong(3) == idx / cap, s"band $band doc ${r.getLong(0)}")
        assert(r.getLong(2) >= r.getLong(1), "padded_len covers the doc")
        assert(r.getLong(4) == band - r.getLong(1))
      }
      // every batch fits the token budget when padded to the band edge
      rows.groupBy(_.getLong(3)).foreach { case (_, b) =>
        assert(b.length * band <= 64L)
      }
    }
    assert(byBand.keySet == Set(8L, 16L, 40L), "all bands exercised")
  }

  test("seeded pageRank: reference parity, zero off-seed-component mass, loud disjoint seeds") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    // two disconnected components: a0..a9 reachable only from the
    // seeds a0/a1; b0..b9 a separate cycle (must converge to rank 0)
    val edges = ((0 until 40).map { _ =>
      (s"a${rng.nextInt(10)}", s"a${rng.nextInt(10)}")
    } ++ (0 until 10).map(i => (s"b$i", s"b${(i + 1) % 10}"))).toSeq
    val seeds = Seq("a0", "a1", "zz-not-in-graph")
    val got = graft.operators.LinkGraph.pageRank(
      edges.toDF("src", "dst"), "src", "dst", iterations = 6,
      seeds = Some(seeds.toDF("host")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.CacheRegistry.releaseAll()
    // driver reference with the teleport vector (k = 2 in-graph seeds)
    val w = edges.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val hosts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outW = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val tele = hosts.map(h =>
      h -> (if (h == "a0" || h == "a1") 0.5 else 0.0)).toMap
    var r = tele
    (0 until 6).foreach { _ =>
      val dMass = hosts.filterNot(outW.contains).map(r).sum
      val contrib = w.toSeq.groupBy(_._1._2).view
        .mapValues(_.map { case ((s, _), wt) => r(s) * wt / outW(s) }.sum)
        .toMap
      r = hosts.map(h => h -> (0.15 * tele(h) + 0.85 *
        (contrib.getOrElse(h, 0.0) + dMass * tele(h)))).toMap
    }
    assert(got.keySet == r.keySet)
    got.foreach { case (h, v) =>
      assert(math.abs(v - r(h)) < 1e-9, s"$h: $v vs ${r(h)}") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass conserves")
    assert(hosts.filter(_.startsWith("b")).forall(h => got(h) == 0.0),
      "the component unreachable from any seed must hold ZERO rank")
    assert(got("a0") > 0.0)
    // a seed set entirely outside the graph fails loud, never all-zero
    val ex = intercept[IllegalArgumentException] {
      graft.operators.LinkGraph.pageRank(edges.toDF("src", "dst"),
        "src", "dst", seeds = Some(Seq("nope").toDF("host")))
    }
    assert(ex.getMessage.contains("seed"))
    graft.CacheRegistry.releaseAll()
  }

  test("pageRank convergence stop: fewer iterations, ranks identical at tolerance") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val edges = (0 until 60).map { _ =>
      (s"h${rng.nextInt(12)}", s"h${rng.nextInt(12)}")
    }.toSeq.toDF("src", "dst")
    val tol = 1e-7
    val (conv, itConv) = graft.operators.LinkGraph.pageRankWithStats(
      edges, "src", "dst", iterations = 60, tol = tol)
    val convRanks = conv.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.CacheRegistry.releaseAll()
    assert(itConv < 60, s"early stop never fired (ran $itConv)")
    // the stop decides WHEN, never WHAT: the early-stopped result is
    // bit-identical to the fixed-iteration run of the same length
    val fixed = graft.operators.LinkGraph.pageRank(
      edges, "src", "dst", iterations = itConv)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.CacheRegistry.releaseAll()
    assert(convRanks == fixed, "early-stopped != fixed-iteration ranks")
    // and it genuinely converged: one more iteration moves < tol
    val more = graft.operators.LinkGraph.pageRank(
      edges, "src", "dst", iterations = itConv + 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.CacheRegistry.releaseAll()
    val l1 = convRanks.map { case (h, v) => math.abs(v - more(h)) }.sum
    assert(l1 <= tol, s"post-stop movement $l1 > $tol")
  }

  test("pageRank: matches a driver power iteration; mass conserves; weights count") {
    import spark.implicits._
    // seeded random digraph with dangling nodes and parallel edges —
    // every structural case the operator claims to handle
    val rng = new scala.util.Random(11)
    val n = 40
    val rawEdges = (0 until 160).map { _ =>
      (s"h${rng.nextInt(n)}", s"h${rng.nextInt(n - 10)}") // h30..h39 dangle
    } ++ Seq(("h0", "h1"), ("h0", "h1"), ("h0", "h1")) // parallel edges
    val got = graft.operators.LinkGraph
      .pageRank(rawEdges.toDF("src", "dst"), "src", "dst", iterations = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.CacheRegistry.releaseAll()

    // driver reference: same math, plain Scala
    val w = rawEdges.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val hosts = rawEdges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outW = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nn = hosts.size.toDouble
    var r = hosts.map(_ -> 1.0 / nn).toMap
    (0 until 6).foreach { _ =>
      val dMass = hosts.filterNot(outW.contains).map(r).sum
      val contrib = w.toSeq
        .groupBy(_._1._2).view
        .mapValues(_.map { case ((s, _), wt) => r(s) * wt / outW(s) }.sum)
        .toMap
      r = hosts.map(h =>
        h -> (0.15 / nn + 0.85 * (contrib.getOrElse(h, 0.0) + dMass / nn)))
        .toMap
    }
    assert(got.keySet == r.keySet)
    got.foreach { case (h, v) =>
      assert(math.abs(v - r(h)) < 1e-9, s"$h: $v vs ${r(h)}") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9,
      s"mass must conserve: ${got.values.sum}")
    // the triple parallel edge must outweigh a single edge: h0 sends
    // 3 shares of its mass to h1
    assert(r(s"h1") > 0.0)

    val deg = graft.operators.LinkGraph
      .hostDegrees(rawEdges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    val outLinks = rawEdges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inLinks = rawEdges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    hosts.foreach { h =>
      val (od, ol, id, il) = deg(h)
      assert(ol == outLinks.getOrElse(h, 0L), s"$h out_links")
      assert(il == inLinks.getOrElse(h, 0L), s"$h in_links")
      assert(od == rawEdges.filter(_._1 == h).map(_._2).distinct.size.toLong)
      assert(id == rawEdges.filter(_._2 == h).map(_._1).distinct.size.toLong)
    }
  }

  test("pageRank driver gate: local path ≡ forced-distributed path, both teleport modes") {
    import spark.implicits._
    // same structural fixture family as the reference-parity test:
    // dangling nodes, parallel edges, a seeded and an unseeded run.
    // localEdgeLimit = 0 forces the distributed loop; the default gate
    // takes the driver path — ranks must agree to 1e-12 (identical
    // formulas, fold order differs) and iteration counts exactly.
    val rng = new scala.util.Random(23)
    val rawEdges = (0 until 140).map { _ =>
      (s"h${rng.nextInt(30)}", s"h${rng.nextInt(22)}")
    } ++ Seq(("h0", "h1"), ("h0", "h1"))
    val edges = rawEdges.toDF("src", "dst")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (seeds <- Seq(None, Some(Seq("h0", "h3").toDF("host")))) {
      val (loc, itLoc) = graft.operators.LinkGraph.pageRankWithStats(
        edges, "src", "dst", iterations = 5, seeds = seeds, tol = 1e-7)
      val (dist, itDist) = graft.operators.LinkGraph.pageRankWithStats(
        edges, "src", "dst", iterations = 5, seeds = seeds, tol = 1e-7,
        localEdgeLimit = 0L)
      val (lm, dm) = (toMap(loc), toMap(dist))
      graft.CacheRegistry.releaseAll()
      assert(itLoc == itDist, s"iteration counts: $itLoc vs $itDist")
      assert(lm.keySet == dm.keySet)
      lm.foreach { case (h, v) =>
        assert(math.abs(v - dm(h)) < 1e-12, s"$h: $v vs ${dm(h)}") }
    }
  }

  test("hamming64DupPairs: band pigeonhole — 3 bits found, 4-band spread missed") {
    import spark.implicits._
    // bits in 3 distinct bands leave band 3 intact -> always found;
    // 4 bits spread over all 4 bands collide in NO band -> not even a
    // candidate (the documented recall boundary above maxHamming 3)
    val threeBits = (1L << 0) | (1L << 16) | (1L << 32)
    val fourBits = threeBits | (1L << 48)
    val df = Seq((1L, 0L), (2L, threeBits), (3L, fourBits))
      .toDF("id", "fp")
    val pairs = graft.operators.Dedup
      .hamming64DupPairs(df, "id", "fp", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 3)), s"3-bit pair must be found: $pairs")
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 3L),
      s"4-band spread cannot collide in any band: $pairs")
    // (2,3): differ in exactly 1 bit -> found
    assert(pairs.contains((2L, 3L, 1)), s"$pairs")
  }

  test("GIF sub-rectangle/optimized frames quarantine, not silent patch stats") {
    val mm = graft.multimodal.Multimodal
    // hand-built 2-frame GIF whose second frame is a smaller patch than
    // the logical screen (what inter-frame optimization produces):
    // frame stats for it would be patch stats — must decode to None
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      Seq((8, 6), (3, 2)).foreach { case (w, h) =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null,
          writer.getDefaultImageMetadata(
            new javax.imageio.ImageTypeSpecifier(img),
            writer.getDefaultWriteParam)), writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    assert(mm.decodeGifFrameStats(baos.toByteArray).isEmpty,
      "sub-rectangle frame must route to quarantine")
    // full-frame synthetic GIFs still decode exactly
    assert(mm.decodeGifFrameStats(mm.syntheticGif(7L)).isDefined)
  }

  test("subword tokenizer: greedy longest-match, vocab loads, packing plugs in") {
    import spark.implicits._
    val sw = graft.functions.Subword
    // greedy longest-match semantics against a hand vocab (the same
    // cases the DuckDB recursive-CTE oracle replays)
    val v = Set("th", "the", "qu", "er", "ing")
    val ml = 3
    assert(sw.segmentCount("thequering", v, ml) == 4) // the|qu|er|ing
    assert(sw.segmentCount("a", v, ml) == 1)          // char fallback
    assert(sw.segmentCount("zz", v, ml) == 2)
    assert(sw.segmentCount("thth", v, ml) == 2)       // th|th
    // committed vocab is non-trivial and loads from the classpath
    assert(sw.vocab.nonEmpty && sw.vocab.forall(_.length >= 2))
    // trainer determinism incl. the lexicographic tie-break: counts
    // (a,a)=5,(a,b)=3 -> merge "aa"; then (aa,a)=2 ties (a,b)=2 and
    // ("a","b") < ("aa","a") lexicographically -> merge "ab"
    assert(sw.train(Map("aaab" -> 2L, "aab" -> 1L), 2) == Seq("aa", "ab"))
    assert(sw.train(Map("aaab" -> 2L, "aab" -> 1L), 2) ==
      sw.train(Map("aaab" -> 2L, "aab" -> 1L), 2))
    // column form sums per-word counts over normalized words; exact
    // driver-side replay with the full committed vocab
    val docs = Seq((1L, "The Quick batch-value!"), (2L, ""), (3L, "zzz qq"))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
      sw.subwordTokenCount(col("text")).as("n"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    val mlFull = sw.vocab.map(_.length).max
    def oracle(t: String): Long = t.toLowerCase
      .replaceAll("[^a-z0-9]", " ").trim.replaceAll(" +", " ")
      .split(" ").filter(_.nonEmpty)
      .map(w => sw.segmentCount(w, sw.vocab, mlFull).toLong).sum
    assert(got.toSeq == Seq(1L -> oracle("The Quick batch-value!"),
      2L -> 0L, 3L -> oracle("zzz qq")))
    // packing accepts the pluggable tokenizer: n_tokens are subword
    // counts and offsets remain an exact exclusive prefix sum
    val off = graft.operators.Packing
      .packOffsets(docs, "doc_id", "text", seqLen = 4,
        tokenCount = sw.subwordTokenCount)
      .orderBy("doc_id").collect()
    var acc = 0L
    off.foreach { r =>
      assert(r.getAs[Long]("token_offset") == acc)
      acc += r.getAs[Long]("n_tokens")
    }
    assert(off.map(_.getAs[Long]("n_tokens")).toSeq ==
      docs.orderBy("doc_id").collect()
        .map(r => oracle(r.getString(1))).toSeq)
  }

  test("pretrained vocab interop: GPT-2 files parse, markers strip, packing routes") {
    import spark.implicits._
    val sw = graft.functions.Subword
    // marker stripping + alphabet filter
    assert(sw.normalizePiece("Ġthe") == Some("the"))
    assert(sw.normalizePiece("▁The") == Some("the"))
    assert(sw.normalizePiece("<|endoftext|>").isEmpty)
    assert(sw.normalizePiece("Ġ!").isEmpty)
    assert(sw.normalizePiece("Ġa").isEmpty) // single char after strip
    // merges.txt: header skipped, pairs concatenate, markers strip
    assert(sw.parseMerges(Iterator("#version: 0.2", "t h", "Ġth e", "", "x"))
      == Seq("th", "the"))
    // vocab.json: keys only, same normalization
    assert(sw.parseVocabJson("""{"Ġthe": 0, "qu": 1, "!": 2}""").sorted
      == Seq("qu", "the"))
    // the committed fixture loads and is a DIFFERENT piece set than
    // the default vocab (the interop is not a re-export)
    assert(sw.pretrainedVocab.nonEmpty &&
      sw.pretrainedVocab != sw.vocab, "fixture must differ from default")
    assert(sw.pretrainedVocab.forall(p =>
      p.length >= 2 && p.forall(ch => ch.isDigit || (ch >= 'a' && ch <= 'z'))))
    // counting + packing route through the pretrained set
    val docs = Seq((1L, "The Quick batch-value!"), (2L, ""))
      .toDF("doc_id", "text")
    val mlPre = sw.pretrainedVocab.map(_.length).max
    def oracle(t: String): Long = t.toLowerCase
      .replaceAll("[^a-z0-9]", " ").trim.replaceAll(" +", " ")
      .split(" ").filter(_.nonEmpty)
      .map(w => sw.segmentCount(w, sw.pretrainedVocab, mlPre).toLong).sum
    val got = docs.select(col("doc_id"),
      sw.pretrainedTokenCount(col("text")).as("n"))
      .orderBy("doc_id").collect().map(r => r.getLong(1))
    assert(got.toSeq == Seq(oracle("The Quick batch-value!"), 0L))
    val off = graft.operators.Packing
      .packOffsets(docs, "doc_id", "text", seqLen = 4,
        tokenCount = sw.pretrainedTokenCount)
      .orderBy("doc_id").collect()
    var acc = 0L
    off.foreach { r =>
      assert(r.getAs[Long]("token_offset") == acc)
      acc += r.getAs[Long]("n_tokens")
    }
  }

  test("mp4 metadata: box walk reads brand/duration/dims; junk quarantines") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    // closed-form round-trip through the real box layout
    val m = mm.parseMp4Meta(mm.syntheticMp4(13L)).get
    assert(m.brand == "isom")
    assert(m.durationMs == 1000 + 37 * (13 % 97))
    assert(m.width == 16 + 13 % 8 && m.height == 9 + 13 % 5)
    // v1 boxes (64-bit times) parse too: widen the synthetic by hand
    // is covered by offsets in parseMp4Meta; here assert the junk path
    assert(mm.parseMp4Meta(null).isEmpty)
    assert(mm.parseMp4Meta(Array[Byte](1, 2, 3)).isEmpty)
    assert(mm.parseMp4Meta(Array.fill[Byte](64)(0x41)).isEmpty)
    // truncated real payload (box size past end) quarantines, not throws
    assert(mm.parseMp4Meta(mm.syntheticMp4(3L).take(40)).isEmpty)
    // partition-parallel operator: meta columns for good payloads,
    // nulls for junk
    val media = mm.syntheticMp4Media((0L until 4L).toDF("doc_id"), "doc_id")
      .union(Seq((99L, Array[Byte](9, 9, 9))).toDF("media_id", "payload"))
    val out = mm.withVideoMeta(media, "payload").orderBy("media_id").collect()
    assert(out.length == 5)
    assert(out.take(4).forall(r => r.getString(2) == "isom" &&
      r.getLong(3) == 1000 + 37 * (r.getLong(0) % 97)))
    assert(out(4).isNullAt(2) && out(4).isNullAt(3))
  }

  test("mp4 sample tables: stbl walk matches closed-form stts/stsz/stco") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    // closed-form oracle for id: n samples, sizes 100+(id+i)%50,
    // deltas 10+(i%3)*5, one chunk per sample, timescale 600
    def expect(id: Long) = {
      val n = (5 + id % 4).toInt
      val sizes = Array.tabulate(n)(i => (100 + (id + i) % 50).toInt)
      val deltas = Array.tabulate(n)(i => 10 + (i % 3) * 5)
      val dur = deltas.sum.toLong
      val wmean = sizes.zip(deltas).map { case (s, d) => s.toDouble * d }.sum / dur
      (n, sizes.map(_.toLong).sum, dur, wmean)
    }
    for (id <- Seq(0L, 7L, 13L, 42L)) {
      val stats = mm.parseMp4SampleStats(mm.syntheticMp4(id))
      assert(stats.length == 1)
      val t = stats.head
      val (n, bytes, dur, wmean) = expect(id)
      assert(t.trackId == 1 && t.timescale == 600)
      assert(t.nSamples == n && t.nChunks == n)
      assert(t.totalBytes == bytes && t.durationUnits == dur)
      assert(math.abs(t.wmeanSize - wmean) < 1e-9)
    }
    // multi-run stts + uniform stsz: hand-widen a run so expansion
    // logic (count>1 per run, uniform size) is exercised
    assert(mm.parseMp4SampleStats(Array.fill[Byte](64)(0x41)).isEmpty)
    assert(mm.parseMp4SampleStats(mm.syntheticMp4(3L).take(60)).isEmpty)
    // the exploding operator: junk payloads yield one all-null row
    val media = mm.syntheticMp4Media((0L until 3L).toDF("doc_id"), "doc_id")
      .union(Seq((99L, Array[Byte](9, 9, 9))).toDF("media_id", "payload"))
    val out = mm.withVideoSampleStats(media, "payload")
      .orderBy("media_id").collect()
    assert(out.length == 4)
    assert(out.take(3).forall(r => r.getInt(2) == 1 && !r.isNullAt(6)))
    assert(out(3).isNullAt(2) && out(3).isNullAt(6))
  }

  test("webm block stats: cluster walk matches closed-form tables, both block grammars") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    def expect(id: Long) = {
      val nc = (2 + id % 3).toInt
      val cells = for {
        c <- 0 until nc
        j <- 0 until (3 + (id + c) % 3).toInt
      } yield ((50 + (id + c + j) % 40), c * 500L + j * 10)
      (nc, cells.size, cells.map(_._1).sum, cells.map(_._2).min,
        cells.map(_._2).max)
    }
    for (id <- Seq(0L, 5L, 13L, 38L)) {
      val stats = mm.parseWebmBlockStats(mm.syntheticWebm(id))
      assert(stats.length == 1)
      val t = stats.head
      val (nc, nb, bytes, first, last) = expect(id)
      assert(t.trackId == 1L)
      assert(t.nClusters == nc && t.nBlocks == nb)
      assert(t.totalBytes == bytes)
      assert(t.firstTsMs == first && t.lastTsMs == last)
    }
    // junk / truncation quarantine (never throws)
    assert(mm.parseWebmBlockStats(null).isEmpty)
    assert(mm.parseWebmBlockStats(Array.fill[Byte](64)(0x41)).isEmpty)
    assert(mm.parseWebmBlockStats(mm.syntheticWebm(3L).dropRight(20)).isEmpty)
    // exploding operator: all-null row for junk payloads
    val media = mm.syntheticWebmMedia((0L until 3L).toDF("doc_id"), "doc_id")
      .union(Seq((99L, Array[Byte](9, 9, 9))).toDF("media_id", "payload"))
    val out = mm.withWebmBlockStats(media, "payload")
      .orderBy("media_id").collect()
    assert(out.length == 4)
    assert(out.take(3).forall(r => r.getLong(2) == 1L && !r.isNullAt(5)))
    assert(out(3).isNullAt(2) && out(3).isNullAt(5))
  }

  test("webm metadata: EBML walk reads doctype/duration/dims; sniffing routes") {
    val mm = graft.multimodal.Multimodal
    val m = mm.parseWebmMeta(mm.syntheticWebm(21L)).get
    assert(m.brand == "webm")
    assert(m.durationMs == 1500 + 53 * (21 % 89))
    assert(m.width == 32 + 21 % 16 && m.height == 18 + 21 % 9)
    // junk and truncation quarantine
    assert(mm.parseWebmMeta(Array[Byte](0x1A, 0x45)).isEmpty)
    assert(mm.parseWebmMeta(mm.syntheticWebm(3L).take(20)).isEmpty)
    // hostile 64-bit element size (would wrap a naive toInt) quarantines
    val hostile = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte,
      0x01) ++ Array.fill[Byte](7)(0xFF.toByte) ++ Array.fill[Byte](8)(0)
    assert(mm.parseWebmMeta(hostile).isEmpty)
    // the sniffing kernel routes both containers and rejects neither's
    // payloads as the other's
    assert(mm.parseVideoMeta(mm.syntheticWebm(5L)).get.brand == "webm")
    assert(mm.parseVideoMeta(mm.syntheticMp4(5L)).get.brand == "isom")
  }

  test("temperature fractions: extreme skew clamps to grid step, never zero") {
    val s = graft.operators.Sampling
    // alpha = 0 with 10^5:1 skew: raw big fraction = 10^-5 < 1/4096 —
    // the floor would hit exactly 0.0 and silently drop the dominant
    // source; the clamp keeps the smallest nonzero grid step instead
    val f = s.temperatureFractions(
      Map("big" -> 100000L, "small" -> 1L), 0.0)
    assert(f("small") == 1.0)
    assert(f("big") == 1.0 / 4096.0, s"got ${f("big")}")
    // the clamp never inflates fractions already on the grid
    val f2 = s.temperatureFractions(Map("a" -> 1000L, "b" -> 100L), 0.0)
    assert(math.abs(f2("a") - 0.1) < 1.0 / 4096)
  }

  test("data checks: lazy plan (no job until action), name validation") {
    import spark.implicits._
    import graft.operators.Checks.Check
    val acc = spark.sparkContext.longAccumulator("checks_probe")
    val probe = udf { (v: Double) => acc.add(1); v > 0 }
    val df = Seq((1L, 5.0), (2L, -1.0)).toDF("id", "v")
    val out = graft.operators.Checks.audit(df, Seq(Check("p", probe(col("v")))))
    assert(acc.value == 0L, "audit ran a job eagerly")
    val row = out.collect().head
    assert(acc.value > 0L && row.getAs[Long]("n_violations") == 1L)
    // audits compose like any other plan
    assert(out.filter(col("violation_rate") > 0.4).count() == 1)
    intercept[IllegalArgumentException] {
      graft.operators.Checks.audit(df,
        Seq(Check("a", lit(true)), Check("a", lit(false))))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Checks.audit(df, Seq(Check("__n", lit(true))))
    }
  }

  test("length quantiles: duplicate rounded names rejected up front") {
    import spark.implicits._
    val docs = Seq(("a", "w w")).toDF("source", "text")
    intercept[IllegalArgumentException] {
      graft.operators.CorpusStats
        .lengthQuantiles(docs, "source", "text", Seq(0.25, 0.254))
    }
  }

  test("pseudo-perplexity self-LM mode tokenizes the corpus once (cache)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("doc_id", "text")
    val out = graft.operators.LanguageModel
      .pseudoPerplexity(docs, "doc_id", "text")
    out.collect()
    // both the LM-build side and the scoring join read the persisted
    // token frame: the executed plan scans the cache, not the corpus
    // twice
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"expected cached token scans in:\n$plan")
    spark.sharedState.cacheManager.clearCache()
  }

  /** Clustered gaussian embedding fixture shared by the semantic-dedup
    * and k-means tests. */
  private def clusteredVecs(seed: Int, n: Int, nCenters: Int, dim: Int) = {
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(nCenters)(Array.fill(dim)(rng.nextGaussian() * 3))
    (0L until n.toLong).map { i =>
      val c = centers(rng.nextInt(nCenters))
      (i, c.map(v => (v + rng.nextGaussian() * 0.3).toFloat))
    }
  }

  /** Local all-pairs cosine oracle with the engine's exact arithmetic
    * (left-fold norm, left-fold dot). */
  private def bruteCosinePairs(vecs: Seq[(Long, Array[Float])],
                               threshold: Double): Map[(Long, Long), Double] = {
    def norm(v: Array[Double]) = {
      val s = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      if (s == 0.0) v else v.map(_ / s)
    }
    val nv = vecs.map { case (id, v) => id -> norm(v.map(_.toDouble)) }
    (for {
      (a, va) <- nv; (b, vb) <- nv if a < b
      cos = va.zip(vb).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      if cos >= threshold
    } yield (a, b) -> cos).toMap
  }

  test("semantic dedup: nClusters=1 is exact all-pairs; k-means run is its same-cluster restriction") {
    import spark.implicits._
    val vecs = clusteredVecs(seed = 31, n = 120, nCenters = 4, dim = 12)
    val df = vecs.toDF("vec_id", "embedding")
    val thr = 0.8
    val oracle = bruteCosinePairs(vecs, thr)

    // degenerate single cluster == brute force (pairs AND values)
    val all = Dedup.semanticDupPairs(df, "vec_id", "embedding",
      nClusters = 1, threshold = thr).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(all.keySet == oracle.keySet,
      s"all-pairs mismatch: ${all.keySet.diff(oracle.keySet)} / ${oracle.keySet.diff(all.keySet)}")
    all.foreach { case (k, c) =>
      assert(math.abs(c - oracle(k)) < 1e-12, s"$k: $c vs ${oracle(k)}") }

    // k-means run: exactly the oracle pairs whose endpoints share a
    // cluster (no more, no less), and clusters agree with kmeansAssign
    val assign = Similarity.kmeansAssign(df, "vec_id", "embedding", nClusters = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sem = Dedup.semanticDupPairs(df, "vec_id", "embedding",
      nClusters = 4, threshold = thr).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2), r.getDouble(3)))
    val expected = oracle.keySet.filter { case (a, b) => assign(a) == assign(b) }
    assert(sem.map(_._1).toSet == expected,
      s"same-cluster restriction mismatch (got ${sem.length}, want ${expected.size})")
    sem.foreach { case (k, cl, c) =>
      assert(cl == assign(k._1), s"pair $k cluster $cl vs assignment ${assign(k._1)}")
      assert(math.abs(c - oracle(k)) < 1e-12)
    }
    // on well-separated clusters the restriction loses little recall
    assert(expected.size.toDouble >= 0.8 * oracle.size,
      s"fixture should keep most pairs within clusters: ${expected.size}/${oracle.size}")
  }

  test("kmeans assign/stats: argmin distances verified locally, inertia adds up") {
    import spark.implicits._
    val vecs = clusteredVecs(seed = 37, n = 150, nCenters = 5, dim = 10)
    val df = vecs.toDF("vec_id", "embedding")
    val rows = Similarity.kmeansAssign(df, "vec_id", "embedding", nClusters = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.length == vecs.length)
    // recompute the quantizer exactly and check each row's argmin+dist2
    val centers = Similarity.trainQuantizer(df, "vec_id", "embedding", 5)
    val byId = vecs.toMap
    rows.foreach { case (id, cl, d2) =>
      val v = byId(id).map(_.toDouble)
      val dists = centers.map(c => v.zip(c).foldLeft(0.0) {
        case (acc, (x, y)) => acc + (x - y) * (x - y) })
      val best = dists.indexOf(dists.min)
      assert(cl == best, s"id=$id assigned $cl, nearest is $best")
      assert(math.abs(d2 - dists(best)) < 1e-9, s"id=$id dist2 $d2 vs ${dists(best)}")
    }
    val stats = Similarity.kmeansClusterStats(df, "vec_id", "embedding", 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(stats.map(_._2).sum == vecs.length.toLong)
    val inertia = stats.map(_._3).sum
    val direct = rows.map(_._3).sum
    assert(math.abs(inertia - direct) < 1e-6 * math.max(1.0, direct))
  }

  test("bloom contamination: hash-exact equal to the inverted-index path, even at fpp=0.5") {
    import spark.implicits._
    // bench items 1-2; doc 10 embeds bench-1's text, doc 11 shares a
    // partial trigram overlap, 12-13 are clean
    val bench = Seq(
      (1L, "the standard benchmark question about gravity waves"),
      (2L, "name the capital city of an imaginary country")).toDF("bid", "btext")
    val docs = Seq(
      (10L, "intro text then the standard benchmark question about gravity waves appears verbatim here"),
      (11L, "an unrelated note that mentions the capital city of nowhere important"),
      (12L, "completely clean training document with original content"),
      (13L, "another clean document about spark physical plans")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "bench_id", "shared_ngrams", "overlap_frac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    val exact = run(Dedup.contamination(docs, bench, "doc_id", "text",
      "bid", "btext", n = 3, minShared = 2, maxDf = 1000))
    assert(exact.nonEmpty && exact.exists(_._1 == 10L),
      s"fixture must plant contamination: ${exact.mkString(";")}")
    // fpp=0.5 floods the prefilter with false positives; the exact
    // verify join must still reduce to the identical result
    for (fpp <- Seq(0.01, 0.5)) {
      val bloomed = run(Dedup.bloomContamination(docs, bench, "doc_id", "text",
        "bid", "btext", n = 3, minShared = 2, maxDf = 1000, fpp = fpp))
      assert(bloomed.sameElements(exact),
        s"fpp=$fpp: ${bloomed.mkString(";")} vs ${exact.mkString(";")}")
    }
    // the probe is the codegen'd BloomMightContain expression (r12):
    // the plan that touches every training shingle has no ScalaUDF
    val plan = Dedup.bloomContamination(docs, bench, "doc_id", "text",
      "bid", "btext", n = 3, minShared = 2, maxDf = 1000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      s"bloom prefilter must stay inside codegen:\n$plan")
  }

  test("top tokens: exact counts, doc frequency, deterministic tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Alpha beta beta gamma!"),
      (2L, "alpha ALPHA delta"),
      (3L, "beta gamma gamma zeta"),
      (4L, "")).toDF("doc_id", "text")
    val got = CorpusStats.topTokens(docs, "text", k = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // occurrences: alpha 3, beta 3, gamma 3, delta 1, zeta 1
    // tie at 3 breaks alphabetically; docfreq: alpha 2, beta 2, gamma 2
    assert(got.toSeq == Seq(
      (1, "alpha", 3L, 2L), (2, "beta", 3L, 2L),
      (3, "gamma", 3L, 2L), (4, "delta", 1L, 1L)), got.mkString(";"))
  }

  test("token entropy: hand-checked Shannon/Renyi-2, exact counts, top share") {
    import spark.implicits._
    // group a: ids (1,1,2,3) -> p = (1/2, 1/4, 1/4)
    //   Shannon = 1.5 bits; Renyi-2 = -log2(6/16) = log2(16/6);
    //   top share = 2/4. group b: uniform (7,8) -> both entropies 1.
    val docs = Seq(("a", "x"), ("b", "y")).toDF("source", "text")
    val fakeIds = (c: org.apache.spark.sql.Column) =>
      when(c === "x", typedLit(Seq(1, 1, 2, 3)))
        .otherwise(typedLit(Seq(7, 8)))
    val got = CorpusStats.tokenEntropy(docs, "source", "text", fakeIds)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    def bits(x: Double) = math.log(x) / math.log(2.0)
    assert(got(0)._1 == "a" && got(0)._2 == 4L && got(0)._3 == 3L)
    assert(math.abs(got(0)._4 - 1.5) < 1e-9, s"shannon ${got(0)._4}")
    assert(math.abs(got(0)._5 - bits(16.0 / 6.0)) < 1e-6,
      s"renyi2 ${got(0)._5}")
    assert(got(0)._6 == 0.5)
    assert(got(1) == (("b", 2L, 2L, 1.0, 1.0, 0.5)))
    // plan shape: two aggregates, no window (the 100-TB contract)
    val plan = CorpusStats.tokenEntropy(docs, "source", "text", fakeIds)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "entropy must not use a window")
  }

  test("paragraph dedup: global keep-first, intra-doc order preserved") {
    import spark.implicits._
    // boilerplate "header text" in docs 2, 1(pos1), 3; intra-doc repeat
    // of "dup dup" inside doc 3; unique paragraphs untouched
    val in = Seq(
      (2L, Seq("header text", "doc two body")),
      (1L, Seq("doc one intro", "header text", "doc one outro")),
      (3L, Seq("dup dup", "doc three body", "dup dup", "header text")),
      (4L, Seq("completely unique"))).toDF("doc_id", "paras")
    val got = Dedup.paragraphDedup(in, "doc_id", "paras").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // keeper of "header text" is global min (id,pos) = (1,1); keeper of
    // "dup dup" is (3,0) — second occurrence inside doc 3 must drop
    assert(got(1L) == ((3L, 3L, "doc one intro header text doc one outro")))
    assert(got(2L) == ((2L, 1L, "doc two body")))
    assert(got(3L) == ((4L, 2L, "dup dup doc three body")))
    assert(got(4L) == ((1L, 1L, "completely unique")))
  }

  test("url canonicalization: variants fold, junk quarantines as null") {
    import spark.implicits._
    val urls = Seq(
      "http://A.Example/x",             // case host
      "HTTPS://a.example:443/x",        // case scheme + default port
      "http://a.example/x/",            // trailing slash
      "http://a.example/x#sec2",        // fragment
      "http://a.example/x?utm_source=t&utm_campaign=c", // tracking only
      "http://a.example/x?q=1&utm_source=t",  // tracking after real param
      "http://a.example/x?utm_source=t&q=1",  // tracking before real param
      "http://a.example:8080/x",        // NON-default port survives
      "http://a.example/x?q=a/",        // slash inside query value kept
      "not a url at all",               // quarantine
      "//missing.scheme/x")             // quarantine
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
    val got = Dedup.urlDedupFlags(urls.toDF("id", "url"), "id", "url")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got(0L).contains("http://a.example/x"))
    assert(got(1L).contains("https://a.example/x"))
    assert(got(2L).contains("http://a.example/x"))
    assert(got(3L).contains("http://a.example/x"))
    assert(got(4L).contains("http://a.example/x"))
    assert(got(5L).contains("http://a.example/x?q=1"))
    assert(got(6L).contains("http://a.example/x?q=1"))
    assert(got(7L).contains("http://a.example:8080/x"))
    assert(got(8L).contains("http://a.example/x?q=a/"))
    assert(got(9L).isEmpty && got(10L).isEmpty)
    // dedup flags: first (min id) of the folded group keeps
    val flags = Dedup.urlDedupFlags(urls.toDF("id", "url"), "id", "url")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(!flags(0L) && flags(2L) && flags(3L) && flags(4L),
      s"keep-first on the folded group: $flags")
    assert(!flags(9L) && !flags(10L), "quarantine rows never flagged dup")
  }

  test("chunking: stride/overlap arithmetic, tail chunk, empty doc") {
    import spark.implicits._
    // 10 words, size 4, overlap 1 (stride 3): [0,4) [3,7) [6,10)
    val words10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val got = Seq((1L, words10), (2L, ""), (3L, "a b"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.chunkWords(col("text"), 4, 1).as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(got(2L).isEmpty, "empty doc yields no chunks")
    assert(got(3L) == Seq("a b"), "short doc is one whole chunk")
    // 11 words: tail chunk is short but every word is covered
    val words11 = (1 to 11).map(i => s"w$i").mkString(" ")
    val t = Seq((1L, words11)).toDF("doc_id", "text")
      .select(TextFunctions.chunkWords(col("text"), 4, 1).as("ch"))
      .collect().head.getSeq[String](0)
    assert(t == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10 w11"))
    // zero overlap degenerates to disjoint spans
    val z = Seq((1L, words10)).toDF("doc_id", "text")
      .select(TextFunctions.chunkWords(col("text"), 5, 0).as("ch"))
      .collect().head.getSeq[String](0)
    assert(z == Seq("w1 w2 w3 w4 w5", "w6 w7 w8 w9 w10"))
  }

  test("host blocklist: exact + subdomain match, no suffix false positives") {
    import spark.implicits._
    val rows = Seq(
      "http://bad.example/x",          // exact
      "http://ads.bad.example/x",      // subdomain
      "http://deep.ads.bad.example/x", // nested subdomain
      "http://notbad.example/x",       // suffix but NOT a subdomain
      "http://BAD.EXAMPLE:80/x",       // case + port folds first
      "http://good.example/x",
      "junk",                          // unparseable -> false
      // r9 ADVICE bypass probes: non-default port and userinfo may
      // not defeat the blocklist
      "http://bad.example:8080/x",
      "http://u@bad.example/x",
      "http://u:pw@bad.example:8443/x",
      "http://u@ads.bad.example:8080/x",
      // userinfo that merely CONTAINS a blocked name on a clean host
      // must not create a false positive
      "http://bad.example@good.example/x",
      // multiple '@' signs: browsers split host at the LAST '@', so
      // a lazy userinfo strip would keep "y@bad.example" and bypass
      // the blocklist while the browser fetches bad.example
      "http://x@y@bad.example/x",
      "http://good.example@another@bad.example:8080/x",
      // ...and the greedy strip must not flip the converse: blocked
      // names inside a MULTI-@ userinfo on a clean host stay clean
      "http://bad.example@bad.example@good.example/x")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
    val got = rows.toDF("id", "url")
      .select(col("id"), graft.functions.UrlFunctions
        .hostBlocked(col("url"), Seq("bad.example")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(0L -> true, 1L -> true, 2L -> true, 3L -> false,
      4L -> true, 5L -> false, 6L -> false, 7L -> true, 8L -> true,
      9L -> true, 10L -> true, 11L -> false, 12L -> true, 13L -> true,
      14L -> false), s"$got")
  }

  test("paragraph dedup: normalization folds case/punct variants to one keeper") {
    import spark.implicits._
    val in = Seq(
      (10L, Seq("The Header!", "body ten")),
      (11L, Seq("the header", "body eleven"))).toDF("doc_id", "paras")
    val got = Dedup.paragraphDedup(in, "doc_id", "paras").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(10L -> 2L, 11L -> 1L))
  }

  test("paragraph dedup: empty and NULL paragraph arrays are excluded, matching the window anchor") {
    import spark.implicits._
    val in = Seq(
      (1L, Seq("alpha body", "beta body")),
      (2L, Seq.empty[String]),                 // empty array: no occurrences
      (3L, null.asInstanceOf[Seq[String]]),    // NULL array
      (4L, Seq("alpha body"))                  // all paras owned elsewhere
    ).toDF("doc_id", "paras")
    val combiner = Dedup.paragraphDedup(in, "doc_id", "paras")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val windowed = Dedup.paragraphDedupWindowed(in, "doc_id", "paras")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // the differential anchor holds on the empty/NULL edge, not just
    // on dense fixtures: both forms omit docs 2 and 3, and doc 4
    // (every paragraph kept elsewhere) appears with n_kept = 0
    assert(combiner.toSeq == windowed.toSeq, s"${combiner.toSeq} vs ${windowed.toSeq}")
    assert(combiner.map(_._1).toSeq == Seq(1L, 4L))
    assert(combiner.find(_._1 == 4L).get._3 == 0L)
  }

  test("leakage-safe split: NULL-text quarantine rows are kept, each its own group") {
    import spark.implicits._
    val in = Seq(
      (1L, "the same text"),
      (2L, "the same text"),
      (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Sampling.leakageSafeSplit(in, "doc_id", "text",
      Seq("train" -> 0.5, "test" -> 0.5)).collect()
    // nothing silently dropped: all 4 rows come back (the inner join
    // on the fingerprint key must not eat NULL-text rows)
    assert(got.length == 4, s"expected 4 rows, got ${got.length}")
    // exact-dup docs still land in the same split
    val byId = got.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(1L) == byId(2L))
  }

  test("profile: counts, typed min/max, moments, nulls; approx mode near exact") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a"), Some(2.0)),
      (Some(2L), Some("b"), None),
      (Some(2L), None, Some(4.0)),
      (None, Some("a"), Some(6.0)))
      .toDF("id", "tag", "v")
    val got = graft.operators.CorpusStats.profile(df, Seq("id", "tag", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = got("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 1 && id.getLong(3) == 2)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 2.0)
    assert(id.isNullAt(6) && id.isNullAt(7), "numeric cols: no string lane")
    assert(math.abs(id.getDouble(8) - 5.0 / 3) < 1e-6) // mean ignores nulls
    val tag = got("tag")
    assert(tag.getLong(2) == 1 && tag.getLong(3) == 2)
    assert(tag.getString(6) == "a" && tag.getString(7) == "b")
    assert(tag.isNullAt(4) && tag.isNullAt(5) && tag.isNullAt(8) &&
      tag.isNullAt(9), "string cols: no numeric lanes")
    val v = got("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 3)
    assert(v.getDouble(8) == 4.0 && v.getDouble(9) == 2.0) // sd of 2,4,6
    // approx mode: same metrics except the distinct estimator; HLL at
    // rsd 5% is exact-ish on tiny cardinalities
    val approx = graft.operators.CorpusStats
      .profile(df, Seq("id", "tag", "v"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx == Map("id" -> 2L, "tag" -> 2L, "v" -> 3L))
    // one scan: the exact plan may Expand, but must contain no join
    val plan = graft.operators.CorpusStats.profile(df, Seq("id", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"profile must not join:\n$plan")
  }
}
