package graft.operators

import graft.functions.{PrefixSum, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: the concat-and-chunk
  * layout (every LLM pretraining pipeline's final step — concatenate
  * documents in a deterministic order, then cut fixed-length
  * sequences; documents may straddle a cut).
  *
  * The whole computation is one global ordered prefix sum of token
  * counts — exactly the single-reducer trap `PrefixSum` exists for, so
  * at 100 TB the token offsets come from the range-bucketed two-pass
  * plan (no `Exchange SinglePartition` anywhere), and the per-doc
  * sequence span is pure arithmetic on the offset. Token counts are
  * integers, so the prefix sum is bit-equal to the naive window form.
  *
  * Both operators are parameterized by the TOKENIZER (`tokenCount`, a
  * text-column => count-column function): whitespace words by default,
  * [[graft.functions.Subword.subwordTokenCount]] for BPE-style subword
  * counts — a real pretraining pipeline packs subword tokens, and the
  * two counts differ enough (1.3-1.7×) to shift every offset and
  * straddle statistic. The plan shape is identical either way; only
  * the count expression changes.
  */
object Packing {

  /** Per-document packing offsets: where each doc lands in the packed
    * token stream of `seqLen`-token sequences, ordered by `idCol`
    * (which must be numeric, distinct and non-null — the PrefixSum
    * contract).
    *
    * Output columns: idCol, `n_tokens`, `token_offset` (exclusive
    * prefix sum), `first_seq` / `last_seq` (the sequence ids the doc
    * occupies; empty docs take first_seq = last_seq = the sequence at
    * their offset). `last_seq - first_seq > 0` marks docs straddling a
    * cut — the rows an attention-masking or no-split policy needs. */
  def packOffsets(docs: DataFrame, idCol: String, textCol: String,
                  seqLen: Int,
                  tokenCount: org.apache.spark.sql.Column =>
                    org.apache.spark.sql.Column =
                    TextFunctions.wsTokenCount): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val counted = docs.select(col(idCol),
      tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val cum = PrefixSum.inclusive(counted, Seq.empty, idCol,
      "n_tokens", "__cum")
    cum
      .withColumn("token_offset", (col("__cum") - col("n_tokens")).cast("long"))
      .withColumn("first_seq", (col("token_offset") / seqLen).cast("long"))
      .withColumn("last_seq",
        ((col("token_offset") + greatest(col("n_tokens"), lit(1L)) - 1)
          / seqLen).cast("long"))
      .drop("__cum")
  }

  /** Sequence packing WITHOUT document splitting (Krell et al. 2021,
    * "Efficient Sequence Packing without Cross-contamination"): each
    * bin holds whole documents up to `seqLen` tokens — no straddling,
    * no cross-document attention contamination, the layout fine-tuning
    * and alignment pipelines use where [[packOffsets]]'s concat-and-cut
    * is the pretraining one.
    *
    * Exact bin packing is NP-hard; the standard approximation is
    * first-fit-decreasing (FFD, ≤ 11/9·OPT + 6/9 bins). FFD is
    * inherently sequential, so the distributed form shards documents
    * into `nBuckets` deterministic hash buckets and runs FFD
    * INDEPENDENTLY per bucket — each bucket's packing depends only on
    * its own (length desc, id) sorted members, so the result is a pure
    * function of (data, seqLen, nBuckets): partition layout, task
    * timing, and cluster size cannot change a single assignment
    * (golden-able, and re-runnable incrementally per bucket). The
    * approximation cost of sharding is bounded: each bucket wastes at
    * most one partially-empty tail bin per capacity class.
    *
    * Docs LONGER than seqLen cannot pack whole; they are flagged
    * `oversize` in their own single-doc bin (callers route them to the
    * splitting packer or truncation — never silently dropped).
    *
    * Output: (id, n_tokens, bucket, bin, oversize) — `bin` is dense
    * per bucket in FFD order. 100-TB shape: one narrow projection, one
    * hash repartition on the bucket key, per-partition sorted greedy
    * packing via mapPartitions (the documented last-resort tier — FFD
    * is genuinely imperative); driver sees nothing. Per-doc cost is
    * O(open bins) per bucket; production bucket sizes (1e5-1e6 docs)
    * keep that trivial next to the scan. */
  def packWithoutSplitting(docs: DataFrame, idCol: String, textCol: String,
                           seqLen: Int, nBuckets: Int = 32,
                           tokenCount: org.apache.spark.sql.Column =>
                             org.apache.spark.sql.Column =
                             TextFunctions.wsTokenCount): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val counted = docs.select(col(idCol).cast("long").as("id"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"),
      pmod(xxhash64(col(idCol)), lit(nBuckets)).cast("int").as("bucket"))
    val packed = counted
      .repartition(nBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("n_tokens").desc, col("id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // rows arrive grouped by bucket (sorted); FFD state resets at
        // each bucket boundary so co-located buckets stay independent
        var curBucket = -1
        var bins = scala.collection.mutable.ArrayBuffer[Long]() // remaining
        it.map { case (id, n, bucket) =>
          if (bucket != curBucket) {
            curBucket = bucket
            bins = scala.collection.mutable.ArrayBuffer[Long]()
          }
          if (n > seqLen) {
            // oversize: its own flagged bin, marked -1 so the first-fit
            // scan below skips it for every n >= 0 (a 0-token doc must
            // not land in an oversize doc's dead bin)
            bins += -1L
            (id, n, bucket, bins.length - 1, true)
          } else {
            var i = 0
            while (i < bins.length && bins(i) < n) i += 1
            if (i == bins.length) bins += seqLen.toLong
            bins(i) -= n
            (id, n, bucket, i, false)
          }
        }
      }
      .toDF("id", "n_tokens", "bucket", "bin", "oversize")
    packed.withColumnRenamed("id", idCol)
  }

  /** Sequence-level manifest: for each packed sequence, how many docs
    * contribute tokens to it and how many of those straddle either
    * boundary — the packing-quality summary (a high straddle share
    * means short seqLen or long docs). Derived from [[packOffsets]] by
    * exploding each doc's [first_seq, last_seq] span; a doc touches
    * len/seqLen + 2 sequences at most, so the explode is bounded. */
  def packManifest(docs: DataFrame, idCol: String, textCol: String,
                   seqLen: Int,
                   tokenCount: org.apache.spark.sql.Column =>
                     org.apache.spark.sql.Column =
                     TextFunctions.wsTokenCount): DataFrame = {
    val off = packOffsets(docs, idCol, textCol, seqLen, tokenCount)
      .filter(col("n_tokens") > 0)
    off
      .select(col(idCol), col("first_seq"), col("last_seq"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("first_seq") =!= col("last_seq"), 1L).otherwise(0L))
          .as("n_straddling"))
  }
}
