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
