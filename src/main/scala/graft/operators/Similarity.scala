package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two physical strategies with the same logical contract
  * (query id -> top-k corpus neighbors by cosine):
  *
  *  - [[bruteForceTopK]]: broadcast the (small) query set against the
  *    full corpus — one narrow map stage + two-phase per-query top-k
  *    (partial bounded heaps map-side, tiny merge), no corpus shuffle.
  *    Exact. The right plan whenever |queries| is
  *    driver-broadcastable, at ANY corpus size.
  *  - [[lshTopK]]: random-hyperplane bucket join — both sides shuffle
  *    on the bucket id only; recall traded for candidate-set size via
  *    `nBits`/`probes`. The scale path when the query set itself is
  *    huge (all-pairs-ish workloads).
  */
object Similarity {

  /** Bounded top-k accumulator over (score, id) rows, ordered by
    * (score desc, id asc). Used through `functions.udaf`, so Spark runs
    * it as an ObjectHashAggregate with a PARTIAL stage: every partition
    * reduces its candidates to <= 2k rows map-side and only those tiny
    * states shuffle — a per-query top-k never funnels the full corpus's
    * candidate rows through one reducer (which is what a
    * `row_number over (partition by query_id)` window would do). */
  private final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def prune(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      if (s.length <= k) s else s.sortWith(better).take(k)
    def zero: Seq[(Double, Long)] = Vector.empty
    def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] = {
      val b = buf :+ row
      if (b.length >= 2 * k) prune(b) else b
    }
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      prune(a ++ b)
    def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
      prune(buf).sortWith(better)
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder()
  }

  /** Two-phase top-k: per-partition bounded partial aggregation, then a
    * tiny merge of <= 2k-row states per query. Emits
    * (query_id, rank, neighbor_id, score) with rank 1..k by
    * (score desc, neighbor_id asc) — identical contract to a window
    * row_number, without the per-query funnel. */
  private def topKSelect(scored: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k), ExpressionEncoder[(Double, Long)]())
    scored.groupBy("query_id")
      .agg(agg(col("score"), col("neighbor_id").cast("long")).as("tops"))
      .select(col("query_id"), posexplode(col("tops")).as(Seq("r0", "t")))
      .select(col("query_id"), (col("r0") + 1).cast("int").as("rank"),
        col("t._2").as("neighbor_id"), col("t._1").as("score"))
  }

  /** Exact top-k by cosine: broadcast-join queries x corpus, two-phase
    * top-k per query. `queries`/`corpus` need (idCol, vecCol). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    // normalize each side once; the quadratic stage is then a bare dot.
    // (Measured: for wide vectors the statically-unrolled dot loses to
    // the HOF form once codegen splits the giant expression, so no dim
    // fast path here.)
    val q = queries.select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("cv"))
    val pairScore = dot(col("qv"), col("cv"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"), pairScore.as("score"))
    topKSelect(scored, k)
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * (MLlib, seeded) partitions the corpus into `nLists` cells; each
    * query scores only the corpus vectors in its `nProbe` nearest
    * cells. The classic FAISS-style scale path when both sides are
    * large: corpus shuffles once on cell id, queries replicate only
    * nProbe times, and candidate volume is corpus/nLists * nProbe.
    */
  /** Deterministic coarse quantizer: Lloyd's k-means run driver-locally
    * over a bounded, hash-ordered corpus sample — the FAISS pattern (the
    * quantizer always trains on a sample, so this is also the 100-TB
    * shape: `orderBy(hash).limit(n)` is a partial per-partition top-n,
    * never a full sort). Sequential driver FP order makes the centers a
    * pure function of the data; MLlib's KMeans aggregates partials in
    * task-completion order, so its centers carry run-to-run jitter that
    * can flip boundary cell assignments. */
  private[graft] def trainQuantizer(corpus: DataFrame, idCol: String,
                                    vecCol: String, nLists: Int,
                                    maxIter: Int = 10,
                                    sampleN: Int = 65536): Array[Array[Double]] = {
    val sample = corpus
      .select(col(vecCol).cast("array<double>").as("v"),
        xxhash64(col(vecCol).cast("array<double>"), col(idCol)).as("h"),
        col(idCol).cast("string").as("tid"))
      .orderBy("h", "tid")
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample(0).length
    def nearest(cs: Array[Array[Double]], v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var j = 0
        val cc = cs(c)
        while (j < dim) { val t = v(j) - cc(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    // evenly-strided init over the hash-ordered sample (hash order is a
    // deterministic pseudo-random permutation, so strides behave like a
    // seeded random init)
    var centers = Array.tabulate(nLists)(i =>
      sample(((i.toLong * sample.length) / nLists).toInt).clone())
    var it = 0
    while (it < maxIter) {
      val sums = Array.fill(nLists)(new Array[Double](dim))
      val cnt = new Array[Long](nLists)
      var i = 0
      while (i < sample.length) {
        val v = sample(i)
        val c = nearest(centers, v)
        val s = sums(c)
        var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
        cnt(c) += 1
        i += 1
      }
      centers = Array.tabulate(nLists)(c =>
        if (cnt(c) > 0) sums(c).map(_ / cnt(c)) else centers(c))
      it += 1
    }
    centers
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
              excludeSelf: Boolean = true): DataFrame = {
    val centers = trainQuantizer(corpus, idCol, vecCol, nLists)

    def cellDists(v: Column): Column = array(centers.zipWithIndex.map {
      case (c, i) =>
        struct(l2Sq(v, array(c.map(lit(_)): _*)).as("d"), lit(i).as("cell"))
    }: _*)

    val c = corpus.select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("cv"),
      element_at(array_sort(cellDists(col(vecCol))), 1).getField("cell").as("cell"))
    val q = queries.select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("qv"),
      explode(transform(slice(array_sort(cellDists(col(vecCol))), 1, nProbe),
        s => s.getField("cell"))).as("cell"))
    val scored = q.join(c, "cell")
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("qv"), col("cv")).as("score"))
      .distinct()
    topKSelect(scored, k)
  }

  /** Approximate top-k via sign-bit LSH buckets with multiprobe.
    *
    * Each corpus vector lands in one bucket; each query probes its own
    * bucket plus every 1-bit-flip neighbor up to `probes` extra buckets
    * (classic multiprobe LSH — recovers most recall lost to bit
    * boundaries without replicating the corpus).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int, dim: Int,
              nBits: Int = 12, probes: Int = 4, seed: Long = 42L,
              excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("cv"),
      hyperplaneBucket(col(vecCol), dim, nBits, seed).as("bucket"))
    val qb = queries.select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("qv"),
      hyperplaneBucket(col(vecCol), dim, nBits, seed).as("b0"))
    // probe buckets: own bucket + single-bit flips (deterministic order)
    val probeList = qb.select(col("query_id"), col("qv"),
      explode(array((col("b0") +:
        (0 until math.min(probes, nBits))
          .map(i => col("b0").bitwiseXOR(lit(1L << i)))): _*)).as("bucket"))
    val scored = probeList.join(c, "bucket")
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("qv"), col("cv")).as("score"))
      .distinct()
    topKSelect(scored, k)
  }
}
