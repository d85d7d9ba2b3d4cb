package graft.operators

import graft.functions.{TextFunctions, UrlFunctions}
import graft.slope.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized property tests for the round-9 operators: each
  * trial draws a random instance and checks the distributed result
  * against an independently-written in-memory oracle (the same
  * discipline as the FDR/prox property tests in the slope suite). */
class OperatorPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9]", " ").replaceAll(" +", " ").trim

  test("property: paragraphDedup equals in-memory keep-first on random corpora") {
    import spark.implicits._
    val vocabParas = Vector("alpha beta", "Gamma Delta!", "epsilon",
      "zeta eta theta", "iota", "KAPPA lambda", "mu nu xi")
    for (seed <- 1 to 8) {
      val rng = new scala.util.Random(seed)
      val docs = (0L until (3 + rng.nextInt(6))).map { id =>
        id -> Seq.fill(1 + rng.nextInt(5))(
          vocabParas(rng.nextInt(vocabParas.size)))
      }
      // oracle: global first (id, pos) per normalized paragraph keeps
      val keep = scala.collection.mutable.Set[(Long, Int)]()
      val seen = scala.collection.mutable.Set[String]()
      for ((id, ps) <- docs.sortBy(_._1); (p, i) <- ps.zipWithIndex)
        if (seen.add(norm(p))) keep += ((id, i))
      val expected = docs.map { case (id, ps) =>
        id -> ((ps.length.toLong,
          ps.zipWithIndex.count { case (_, i) => keep((id, i)) }.toLong,
          ps.zipWithIndex.collect { case (p, i) if keep((id, i)) => p }
            .mkString(" ")))
      }.toMap
      val got = Dedup.paragraphDedup(
        docs.toDF("doc_id", "paras"), "doc_id", "paras").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got == expected, s"seed $seed: $got vs $expected")
    }
  }

  test("property: chunkWords slices exactly words[i*stride, i*stride+size)") {
    import spark.implicits._
    for (seed <- 1 to 10) {
      val rng = new scala.util.Random(100 + seed)
      val n = rng.nextInt(40)
      val size = 1 + rng.nextInt(8)
      val overlap = rng.nextInt(size)
      val stride = size - overlap
      val words = (1 to n).map(i => s"w$i")
      val text = words.mkString(" ")
      val got = Seq(Tuple1(text)).toDF("text")
        .select(TextFunctions.chunkWords(col("text"), size, overlap).as("c"))
        .collect().head.getSeq[String](0)
      // oracle: n_chunks = 1 + ceil(max(n - size, 0) / stride), chunk i
      // is exactly words[i*stride, i*stride + size)
      val nChunks = if (n == 0) 0
        else 1 + math.ceil(math.max(n - size, 0).toDouble / stride).toInt
      val expected = (0 until nChunks).map(i =>
        words.slice(i * stride, i * stride + size).mkString(" "))
      assert(got == expected,
        s"seed $seed n=$n size=$size overlap=$overlap: $got vs $expected")
      // coverage: every word position appears in some chunk
      if (n > 0) {
        val covered = got.zipWithIndex.flatMap { case (c, i) =>
          c.split(" ").zipWithIndex.map { case (w, j) => (i * stride + j, w) }
        }.toMap
        assert(covered.size == n, s"coverage gap: ${covered.size} of $n")
      }
    }
  }

  test("property: canonicalizeUrl is idempotent over a URL grammar") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val urls = (1 to 200).map { _ =>
      val scheme = Seq("http", "HTTP", "https", "Https")(rng.nextInt(4))
      val host = Seq("a.example", "A.Example", "sub.B.example")(rng.nextInt(3))
      val port = Seq("", ":80", ":443", ":8080")(rng.nextInt(4))
      val path = Seq("", "/", "/x", "/x/", "/X/y")(rng.nextInt(5))
      val query = Seq("", "?q=1", "?utm_source=t", "?q=1&utm_campaign=c&r=2",
        "?utm_a=1&utm_b=2", "?href=keep")(rng.nextInt(6))
      val frag = Seq("", "#sec")(rng.nextInt(2))
      s"$scheme://$host$port$path$query$frag"
    }
    val once = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val twice = once.toSeq.toDF("id", "c")
      .select(col("id"), UrlFunctions.canonicalizeUrl(col("c")).as("c2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    once.foreach { case (id, c) =>
      assert(twice(id) == c, s"not idempotent: ${urls(id.toInt)} -> $c -> ${twice(id)}")
    }
  }

  test("property: incrementalDupFlags equals in-memory oracle on random splits") {
    import spark.implicits._
    val vocab = Vector("red fox", "blue bird!", "GREEN tree", "red  fox",
      "night sky", "open sea")
    for (seed <- 1 to 8) {
      val rng = new scala.util.Random(200 + seed)
      val all = (0L until (6 + rng.nextInt(8))).map(id =>
        id -> vocab(rng.nextInt(vocab.size)))
      val cut = 1 + rng.nextInt(all.size - 1)
      val (corpus, batch) = (all.take(cut), all.drop(cut))
      val corpusK = corpus.groupBy(d => norm(d._2)).map { case (f, ds) =>
        f -> ds.map(_._1).min }
      val batchFirst = batch.groupBy(d => norm(d._2)).map { case (f, ds) =>
        f -> ds.map(_._1).min }
      val expected = batch.map { case (id, t) =>
        val f = norm(t)
        corpusK.get(f) match {
          case Some(c) => id -> (("dup_of_corpus", c))
          case None if batchFirst(f) != id =>
            id -> (("dup_in_batch", batchFirst(f)))
          case None => id -> (("new", id))
        }
      }.toMap
      val got = Dedup.incrementalDupFlags(
        corpus.toDF("doc_id", "text"), batch.toDF("doc_id", "text"),
        "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(got == expected, s"seed $seed cut=$cut: $got vs $expected")
    }
  }
}
