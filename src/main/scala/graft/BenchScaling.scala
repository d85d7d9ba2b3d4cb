package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-family scaling curve: time each pair-generating operator on
  * deterministic 1x / 3x / 10x replications of the documents corpus
  * and fit the log-log scaling exponent.
  *
  * Replication that does NOT distort the measurement: replica k > 0
  * prefixes every word with `r{k}`, so replicas share no shingles or
  * fingerprints with each other or the base — the k-fold corpus
  * behaves like k independent corpora of the same length/duplicate
  * distribution (the shape of natural corpus growth), not like a
  * corpus where every doc suddenly has k-1 near-duplicates. Shingle
  * document frequencies are therefore scale-invariant and the shipped
  * maxDf/maxBucket guards keep provably dropping nothing: the curve
  * measures the operators, not the guards (SkewSpec covers guards).
  */
object BenchScaling {

  /** k deterministic replicas: ids offset by 10M per replica, words
    * of replica k prefixed `r{k}` (replica 0 = the original corpus). */
  def replicate(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text"))
    (0 until k).map { r =>
      if (r == 0) base
      else base.select(
        (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(lit(s"r$r"), w)), " ").as("text"))
    }.reduce(_ union _)
  }

  /** k deterministic replicas of the embedding corpus: replica k > 0
    * applies a seeded diagonal ±1 sign pattern — an ORTHOGONAL
    * transform, so within-replica inner products (and therefore the
    * pair structure semantic dedup measures) are exactly preserved,
    * while cross-replica cosines become Rademacher-weighted dots that
    * concentrate near 0 (≪ any dedup threshold). The k-fold corpus
    * behaves like k independent embedding spaces of identical shape —
    * the natural-growth analogue of [[replicate]] for vectors. */
  def replicateEmb(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val base = emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    (0 until k).map { r =>
      if (r == 0) base
      else {
        val rng = new scala.util.Random(1234L + r)
        val signs = Array.fill(64)(if (rng.nextBoolean()) 1.0 else -1.0)
        base.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
          zip_with(col("embedding"), lit(signs),
            (v, s) => v * s).as("embedding"))
      }
    }.reduce(_ union _)
  }

  // mirrors the q_* query parameters exactly (SparkEntry.scala)
  private val MaxDf = 1000
  private val Par = 32

  /** `bench` is FIXED across scales (eval sets don't grow with the
    * corpus), so both contamination variants should scale linearly in
    * the training side; the bloom row additionally shows the absolute
    * win from prefiltering the shuffle. `emb` is the replicated
    * embedding corpus; semantic dedup runs at nClusters ∝ √n (the IVF
    * sizing rule — per-cluster candidate volume then grows ~√n, so the
    * expected asymptotic exponent is ~1.5, not 2; the measured small-n
    * exponent also carries per-job scheduler floors). */
  def ops(d: DataFrame, bench: DataFrame, emb: DataFrame,
          k: Int): Seq[(String, () => Long)] = Seq(
    ("exact", () => Dedup.exactGroups(d, "doc_id", "text").count()),
    ("minhash", () => Dedup.minhashDupPairs(d, "doc_id", "text",
      n = 2, numHashes = 32, bands = 16, threshold = 0.3,
      parallelism = Par).count()),
    ("simhash", () => Dedup.simhashDupPairs(d, "doc_id", "text",
      maxHamming = 8, parallelism = Par).count()),
    ("ngram", () => Dedup.ngramJaccardPairs(d, "doc_id", "text",
      n = 3, threshold = 0.05, maxDf = MaxDf,
      parallelism = Par).count()),
    ("cc", () => Dedup.dupClusters(Dedup.ngramJaccardPairs(d, "doc_id",
      "text", n = 3, threshold = 0.05, maxDf = MaxDf,
      parallelism = Par)).count()),
    ("contamination", () => Dedup.contamination(d, bench,
      "doc_id", "text", "bid", "btext",
      n = 3, minShared = 2, maxDf = MaxDf).count()),
    ("contamination_bloom", () => Dedup.bloomContamination(d, bench,
      "doc_id", "text", "bid", "btext",
      n = 3, minShared = 2, maxDf = MaxDf, fpp = 0.01).count()),
    ("semantic", () => Dedup.semanticDupPairs(emb, "vec_id", "embedding",
      nClusters = math.ceil(8 * math.sqrt(k.toDouble)).toInt,
      threshold = 0.4, parallelism = Par).count()))

  /** Least-squares slope of log(t) on log(scale): ~1 linear, ~2
    * quadratic. Scheduler floors (~100 ms/job) bias the small-scale
    * points DOWN in cost, which biases the exponent UP — treat it as
    * an upper bound on the data-driven exponent. */
  def exponent(pts: Seq[(Int, Double)]): Double = {
    val xs = pts.map(p => math.log(p._1.toDouble))
    val ys = pts.map(p => math.log(math.max(p._2, 1e-4)))
    val mx = xs.sum / xs.size; val my = ys.sum / ys.size
    val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = xs.map(x => (x - mx) * (x - mx)).sum
    num / den
  }

  case class OpCurve(op: String, secByScale: Seq[(Int, Double)], exp: Double)

  def run(spark: SparkSession, sfDir: String, scales: Seq[Int],
          reps: Int): Seq[OpCurve] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // fixed benchmark side, mirroring q_contamination's eval stand-in
    val bench = docs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("bid"), col("text").as("btext"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bench.count()
    // materialize each replicated corpus once so the timed ops measure
    // the operator, not the replication projection
    val corpora = scales.map { k =>
      val d = replicate(docs, k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      val e = replicateEmb(embs, k).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count()
      (k, d, e)
    }
    def opsAt(c: (Int, DataFrame, DataFrame)) = ops(c._2, bench, c._3, c._1)
    val names = opsAt(corpora.head).map(_._1)
    // warm-up at the smallest scale (JIT/codegen)
    opsAt(corpora.head).foreach { case (_, f) => f() }
    val samples = scala.collection.mutable.Map[(String, Int), List[Double]]()
      .withDefaultValue(Nil)
    // round-robin reps (one contention spike pollutes <=1 rep per cell)
    for (rep <- 1 to reps; c <- corpora; (name, f) <- opsAt(c)) {
      val k = c._1
      val t0 = System.nanoTime()
      f()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scaling] $name%-8s ${k}x rep$rep $dt%7.2fs")
      samples((name, k)) = samples((name, k)) :+ dt
    }
    corpora.foreach { c => c._2.unpersist(); c._3.unpersist() }
    bench.unpersist()
    names.map { name =>
      // MIN across reps: timing noise on this box is additive spikes
      // (5-40x), so the minimum is the spike-robust estimate of the
      // work — a median-of-2 would average a spike into the fit
      val pts = scales.map(k => (k, samples((name, k)).min))
      OpCurve(name, pts, exponent(pts))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val curves = run(spark, sfDir, Seq(1, 3, 10), reps)
    val json = curves.map { c =>
      val by = c.secByScale.map { case (k, t) => s""""${k}x":$t""" }
        .mkString(",")
      f""""${c.op}":{$by,"exponent":${c.exp}%.2f}"""
    }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
