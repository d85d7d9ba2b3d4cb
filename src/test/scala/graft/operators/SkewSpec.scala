package graft.operators

import graft.slope.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-skew evidence for the pair generators' quadratic guards.
  *
  * Every shipped fixture is sized so `maxBucket`/`maxDf` provably drop
  * nothing; these tests construct the corpus shape the guards exist
  * for — a boilerplate block shared by a large fraction of documents,
  * which collapses into one mega-bucket (LSH) / high-df shingles
  * (inverted index) — and assert, per operator:
  *
  *  (a) BOUND: with the guard binding, the candidate volume (rows into
  *      the verify/aggregate stage) stays under its closed-form bound,
  *      while the unguarded volume demonstrably blows past it;
  *  (b) RECALL: the guard's cost is quantified — pairs found with the
  *      guard are a subset of pairs found without it, every planted
  *      NON-boilerplate near-dup pair survives, and the only losses
  *      are boilerplate-internal pairs (the pairs one deliberately
  *      spends: at 100 TB they are the quadratic blowup itself).
  *
  * Measured numbers are recorded in SKEW.md.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- adversarial corpus ----------------------------------------
  // 120 boilerplate docs: identical 40-word body + 1 unique marker word
  //   (pairwise jaccard ~0.9 -> every boilerplate pair is a true
  //   near-dup AND they all share LSH buckets: the mega-bucket).
  // 20 planted pairs: per-pair private 30-word content, second doc
  //   differs in 1 word (~0.8 3-gram jaccard) — true near-dups that
  //   must SURVIVE the guard (their buckets are tiny).
  // 60 unique docs: private random words — no pairs expected.
  val nBoiler = 120
  val boilerIds: Set[Long] = (0L until nBoiler.toLong).toSet
  lazy val docs: Seq[(Long, String)] = {
    val rng = new scala.util.Random(1234)
    val body = (0 until 40).map(i => s"common$i").mkString(" ")
    val boiler = (0 until nBoiler).map(i => (i.toLong, s"$body marker$i"))
    val pairs = (0 until 20).flatMap { p =>
      val words = Array.tabulate(30)(i => s"p${p}w$i")
      val a = words.mkString(" ")
      val b = { val w = words.clone(); w(7) = s"p${p}alt"; w.mkString(" ") }
      Seq((1000L + 2 * p, a), (1001L + 2 * p, b))
    }
    val unique = (0 until 60).map { d =>
      (2000L + d, Array.tabulate(30)(i => s"u${d}w${rng.nextInt(100000)}").mkString(" "))
    }
    boiler ++ pairs ++ unique
  }
  lazy val df = { import spark.implicits._; docs.toDF("doc_id", "text") }
  val nDocs = 220 // 120 + 40 + 60
  val plantedPairs: Set[(Long, Long)] =
    (0 until 20).map(p => (1000L + 2 * p, 1001L + 2 * p)).toSet

  def pairSet(out: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    out.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  def isBoilerPair(p: (Long, Long)): Boolean =
    boilerIds(p._1) && boilerIds(p._2)

  test("minhash: maxBucket bounds candidate volume; only boilerplate recall spent") {
    val bands = 8; val maxBucket = 10
    val guarded = Dedup.minhashCandidates(df, "doc_id", "text",
      n = 3, numHashes = 32, bands = bands, maxBucket = maxBucket).count()
    val unguarded = Dedup.minhashCandidates(df, "doc_id", "text",
      n = 3, numHashes = 32, bands = bands, maxBucket = Int.MaxValue).count()
    // closed form: each doc sits in ONE bucket per band; a kept bucket
    // has <= maxBucket members, so per band each doc pairs with <
    // maxBucket others => total < bands * n * (maxBucket - 1) / 2
    val bound = bands.toLong * nDocs * (maxBucket - 1) / 2
    assert(guarded <= bound, s"guarded candidates $guarded > bound $bound")
    // the mega-bucket dominates the unguarded volume (~bands * 120*119/2)
    assert(unguarded > bound * 2,
      s"fixture not adversarial enough: unguarded $unguarded vs bound $bound")

    val pg = pairSet(Dedup.minhashDupPairs(df, "doc_id", "text",
      n = 3, numHashes = 32, bands = bands, threshold = 0.7,
      maxBucket = maxBucket))
    val pu = pairSet(Dedup.minhashDupPairs(df, "doc_id", "text",
      n = 3, numHashes = 32, bands = bands, threshold = 0.7,
      maxBucket = Int.MaxValue))
    assert(pg.subsetOf(pu), "guard must only remove pairs, never invent them")
    val lost = pu -- pg
    assert(lost.forall(isBoilerPair),
      s"guard lost non-boilerplate pairs: ${lost.filterNot(isBoilerPair)}")
    // every planted pair the UNGUARDED run finds must survive the
    // guard (the 32-hash estimate can miss a ~0.81-jaccard pair at
    // threshold 0.7 — that is LSH estimation noise, not the guard)
    assert((pu & plantedPairs).subsetOf(pg),
      s"guard lost planted pairs: ${(pu & plantedPairs) -- pg}")
    assert((pu & plantedPairs).size >= 15,
      s"fixture too hard: only ${(pu & plantedPairs).size}/20 planted visible")
    val recall = if (pu.isEmpty) 1.0 else pg.size.toDouble / pu.size
    info(f"minhash: candidates $guarded/$unguarded (bound $bound), " +
      f"recall $recall%.3f, lost ${lost.size} (all boilerplate-internal)")
  }

  test("simhash: maxBucket bounds candidate volume; only boilerplate recall spent") {
    val maxBucket = 10
    val guarded = Dedup.simhashCandidates(df, "doc_id", "text",
      maxBucket = maxBucket).count()
    val unguarded = Dedup.simhashCandidates(df, "doc_id", "text",
      maxBucket = Int.MaxValue).count()
    val bound = 4L * nDocs * (maxBucket - 1) / 2 // 4 fixed bands
    assert(guarded <= bound, s"guarded candidates $guarded > bound $bound")
    assert(unguarded > bound * 2,
      s"fixture not adversarial enough: unguarded $unguarded vs bound $bound")

    val pg = pairSet(Dedup.simhashDupPairs(df, "doc_id", "text",
      maxHamming = 3, maxBucket = maxBucket))
    val pu = pairSet(Dedup.simhashDupPairs(df, "doc_id", "text",
      maxHamming = 3, maxBucket = Int.MaxValue))
    assert(pg.subsetOf(pu))
    val lost = pu -- pg
    assert(lost.forall(isBoilerPair),
      s"guard lost non-boilerplate pairs: ${lost.filterNot(isBoilerPair)}")
    // planted pairs that the UNGUARDED run finds must all survive the
    // guard (simhash's hamming<=3 may not catch every planted pair —
    // that is LSH estimation, not the guard's doing)
    assert((pu & plantedPairs).subsetOf(pg))
    info(s"simhash: candidates $guarded/$unguarded (bound $bound), " +
      s"lost ${lost.size} of ${pu.size} (all boilerplate-internal)")
  }

  test("ngram jaccard: maxDf bounds candidate volume; only boilerplate recall spent") {
    val maxDf = 20
    val guarded = Dedup.ngramCandidates(df, "doc_id", "text",
      n = 3, maxDf = maxDf).count()
    val unguarded = Dedup.ngramCandidates(df, "doc_id", "text",
      n = 3, maxDf = Int.MaxValue).count()
    // closed form: every kept shingle has df <= maxDf, so it emits
    // <= maxDf*(maxDf-1)/2 pair rows; postings <= nDocs * maxShingles
    val maxShinglesPerDoc = 39 // 41-word boiler docs have 39 3-grams
    val keptShingles = nDocs.toLong * maxShinglesPerDoc // ultra-safe cap
    val bound = keptShingles * maxDf * (maxDf - 1) / 2
    assert(guarded <= bound, s"guarded candidates $guarded > bound $bound")
    // tighter demonstration: the guard removed the df=80 boilerplate
    // shingles' 80*79/2 pair rows each
    assert(unguarded - guarded >= 38L * (nBoiler.toLong * (nBoiler - 1) / 2),
      s"boilerplate shingles not pruned: $unguarded -> $guarded")

    val pg = Dedup.ngramJaccardPairs(df, "doc_id", "text",
      n = 3, threshold = 0.7, maxDf = maxDf)
    val pgSet = pairSet(pg)
    val puSet = pairSet(Dedup.ngramJaccardPairs(df, "doc_id", "text",
      n = 3, threshold = 0.7, maxDf = Int.MaxValue))
    assert(pgSet.subsetOf(puSet))
    val lost = puSet -- pgSet
    assert(lost.forall(isBoilerPair),
      s"guard lost non-boilerplate pairs: ${lost.filterNot(isBoilerPair)}")
    assert(plantedPairs.subsetOf(pgSet),
      s"planted pairs lost: ${plantedPairs -- pgSet}")
    // planted-pair jaccard is UNCHANGED by the cut (their shingles all
    // have df 2 <= maxDf): exactness survives for surviving pairs
    val jg = pg.filter(col("id_a") === 1000L).select("jaccard").head().getDouble(0)
    assert(math.abs(jg - 25.0 / 31.0) < 1e-12,
      s"surviving pair's jaccard drifted: $jg")
    info(s"ngram: candidates $guarded/$unguarded, lost ${lost.size} of " +
      s"${puSet.size} (all boilerplate-internal)")
  }

  test("embedding LSH: maxBucket bounds candidate volume; planted pairs survive") {
    import spark.implicits._
    val dim = 16; val bands = 4; val nBits = 8; val maxBucket = 10
    val rng = new scala.util.Random(555)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    // 120 IDENTICAL vectors (same bucket in every band: the mega-bucket),
    // 20 planted near-parallel pairs (cos ~0.98), 60 unique directions
    val shared = unit()
    val boiler = (0L until 120L).map(i => (i, shared.clone()))
    val pairs = (0 until 20).flatMap { p =>
      val a = unit()
      val b = a.zipWithIndex.map { case (x, i) =>
        (x + (if (i == 0) 0.15f else 0.0f)) }
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      Seq((1000L + 2 * p, a), (1001L + 2 * p, b.map(x => (x / nb).toFloat)))
    }
    val unique = (0 until 60).map(d => (2000L + d, unit()))
    val vdf = (boiler ++ pairs ++ unique).toDF("vec_id", "embedding")

    val guarded = Dedup.embeddingCandidates(vdf, "vec_id", "embedding",
      dim = dim, nBits = nBits, bands = bands, seed = 42L,
      maxBucket = maxBucket).count()
    val unguarded = Dedup.embeddingCandidates(vdf, "vec_id", "embedding",
      dim = dim, nBits = nBits, bands = bands, seed = 42L,
      maxBucket = Int.MaxValue).count()
    val bound = bands.toLong * 220 * (maxBucket - 1) / 2
    assert(guarded <= bound, s"guarded candidates $guarded > bound $bound")
    assert(unguarded > bound * 2,
      s"fixture not adversarial enough: unguarded $unguarded vs bound $bound")

    val pg = pairSet(Dedup.embeddingDupPairs(vdf, "vec_id", "embedding",
      dim = dim, threshold = 0.9, nBits = nBits, bands = bands,
      maxBucket = maxBucket))
    val pu = pairSet(Dedup.embeddingDupPairs(vdf, "vec_id", "embedding",
      dim = dim, threshold = 0.9, nBits = nBits, bands = bands,
      maxBucket = Int.MaxValue))
    assert(pg.subsetOf(pu))
    val lost = pu -- pg
    assert(lost.forall(isBoilerPair),
      s"guard lost non-boilerplate pairs: ${lost.filterNot(isBoilerPair)}")
    assert((pu & plantedPairs).subsetOf(pg))
    // the planted pairs must actually be discoverable in this fixture
    assert((pu & plantedPairs).size >= 15,
      s"fixture too hard: only ${(pu & plantedPairs).size}/20 planted pairs visible")
    info(s"embedding: candidates $guarded/$unguarded (bound $bound), " +
      s"lost ${lost.size} of ${pu.size} (all boilerplate-internal)")
  }

  test("semantic dedup: maxCluster bounds candidate volume; losses confined to over-cap clusters") {
    // Unlike the LSH guards (where a planted pair caught in the
    // mega-bucket still collides in OTHER bands), a k-means cell is a
    // pair's ONLY meeting place — so the guard's exact contract is:
    // guarded output == unguarded output restricted to clusters with
    // <= maxCluster members, bit-identical cosines included. That is
    // what this test asserts, plus the closed-form volume bound and a
    // seed-stable floor on planted-pair recall.
    import spark.implicits._
    val dim = 16; val nClusters = 16; val maxCluster = 60
    val rng = new scala.util.Random(777)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    // 300 IDENTICAL vectors: k-means collapses several strided-init
    // centroids onto them and puts them all in ONE cell — the
    // mega-cluster the guard exists for. 20 near-parallel planted
    // pairs (cos ~0.99), 60 unique random unit vectors.
    val shared = unit()
    val nBoilerVec = 300
    val boiler = (0L until nBoilerVec.toLong).map(i => (i, shared.clone()))
    val pairs = (0 until 20).flatMap { p =>
      val a = unit()
      val b = a.zipWithIndex.map { case (x, i) =>
        (x + (if (i == 0) 0.15f else 0.0f)) }
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      Seq((1000L + 2 * p, a), (1001L + 2 * p, b.map(x => (x / nb).toFloat)))
    }
    val unique = (0 until 60).map(d => (2000L + d, unit()))
    val vdf = (boiler ++ pairs ++ unique).toDF("vec_id", "embedding")
    val nVecs = nBoilerVec + 40 + 60

    def candMap(maxC: Int): Map[(Long, Long), (Int, Double)] =
      Dedup.semanticCandidates(vdf, "vec_id", "embedding",
        nClusters = nClusters, maxCluster = maxC).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getInt(2), r.getDouble(3))).toMap
    val candU = candMap(Int.MaxValue)
    val candG = candMap(maxCluster)

    val bound = nVecs.toLong * (maxCluster - 1) / 2
    assert(candG.size <= bound,
      s"guarded candidates ${candG.size} > bound $bound")
    assert(candU.size > bound * 2,
      s"fixture not adversarial enough: unguarded ${candU.size} vs bound $bound")

    // cluster membership counts, recovered from the unguarded pairs
    // (every member of a cluster of size >= 2 appears in some pair)
    val clusterSize: Map[Int, Int] = candU.toSeq
      .flatMap { case ((a, b), (c, _)) => Seq(c -> a, c -> b) }
      .distinct.groupBy(_._1).map { case (c, m) => c -> m.size }
    val overCap = clusterSize.filter(_._2 > maxCluster).keySet
    assert(overCap.nonEmpty, "fixture produced no over-cap cluster")

    // exact contract: drop over-cap clusters from the unguarded
    // output and you get the guarded output, cosines bit-identical
    val expected = candU.filter { case (_, (c, _)) => !overCap(c) }
    assert(candG == expected,
      s"guarded != unguarded-minus-overcap: sizes ${candG.size} vs ${expected.size}")

    // recall floor (deterministic under seed 777): planted pairs that
    // avoided the mega-cluster survive the guard
    val surviving = plantedPairs.filter(p =>
      candG.get(p).exists(_._2 >= 0.9))
    assert(surviving.size >= 10,
      s"fixture too hard: only ${surviving.size}/20 planted pairs survive the guard")
    info(s"semantic: candidates ${candG.size}/${candU.size} (bound $bound), " +
      s"over-cap clusters ${overCap.map(clusterSize).toSeq.sorted.mkString(",")}, " +
      s"planted recall ${surviving.size}/20")
  }

  test("posting-list skew: combiner rewrites equal the window forms; boilerplate collapses map-side") {
    import spark.implicits._
    import graft.functions.TextFunctions
    // adversarial shape (r9 VERDICT #4): 10% of docs share one
    // boilerplate paragraph AND one boilerplate word run, so both the
    // paragraph fingerprint and each boilerplate 5-gram have a posting
    // list of 60 docs — the window forms ship each such list into ONE
    // sorted partition; the combiner rewrites must produce identical
    // output with no Window/posting-list partition at all
    // exactly 10 words = exactly one 10-word span, identical everywhere
    val boiler = "all rights reserved contact us for more information today now"
    val docs = (0L until 600L).map { i =>
      val own = (0 until 40).map(w => s"u${i}w$w").mkString(" ")
      (i, if (i % 10 == 0) s"$boiler $own" else own)
    }.toDF("doc_id", "text").repartition(8)
    val paras = docs.select(col("doc_id"),
      TextFunctions.spanArray(col("text"), 10).as("paras"))

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val pNew = Dedup.paragraphDedup(paras, "doc_id", "paras")
    val pOld = Dedup.paragraphDedupWindowed(paras, "doc_id", "paras")
    assert(rows(pNew) == rows(pOld),
      "paragraph combiner rewrite must match the window form exactly")
    val nNew = Dedup.ngramNovelty(docs, "doc_id", "text", n = 5)
    val nOld = Dedup.ngramNoveltyWindowed(docs, "doc_id", "text", n = 5)
    assert(rows(nNew) == rows(nOld),
      "novelty combiner rewrite must match the window form exactly")

    // the rewrites carry NO window operator: the first-owner aggregate
    // is partial (map-side combined), so the hot key arrives at the
    // reducer as <= one row per map partition instead of its whole
    // posting list
    Seq(pNew, nNew).foreach { d =>
      val plan = d.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"combiner form must not contain a window:\n$plan")
      assert(plan.contains("partial_min"),
        s"first-owner aggregate must map-side combine:\n$plan")
    }
    // and the boilerplate really is the skew shape: its occurrence
    // list is 60 docs deep (10% of the corpus), vs 1 for unique paras
    val occ = paras
      .select(col("doc_id"), explode(col("paras")).as("para"))
      .groupBy(TextFunctions.fingerprint(col("para")).as("fp"))
      .agg(count(lit(1)).as("c")).agg(max("c")).head.getLong(0)
    assert(occ == 60L, s"hot paragraph multiplicity $occ")

    // keepBestPerCluster under the same shape: the 60 boilerplate docs
    // form ONE mega-cluster; the combiner must equal a row_number
    // window reference (ties planted via score = id % 7) with no
    // Window node and a map-side-combined max
    val clusters = docs.select(col("doc_id").as("id"),
      when(col("doc_id") % 10 === 0, 0L).otherwise(col("doc_id"))
        .as("cluster_id"))
    val scores = docs.select(col("doc_id").as("id"),
      (col("doc_id") % 7).cast("int").as("score"))
    val kNew = Dedup.keepBestPerCluster(clusters, scores)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("score").desc, col("id"))
    val kRef = clusters.join(scores, Seq("id"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("id").as("keep_id"),
        col("score").as("keep_score"))
    assert(rows(kNew) == rows(kRef),
      "keepBest combiner must match the window reference exactly")
    val kPlan = kNew.queryExecution.executedPlan.toString
    assert(!kPlan.contains("Window"), kPlan)
    assert(kPlan.contains("partial_max") || kPlan.contains("partial(max"),
      kPlan)
  }
}
