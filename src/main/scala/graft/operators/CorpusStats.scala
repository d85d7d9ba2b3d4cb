package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus distribution analytics over discrete statistics (token
  * counts, char lengths): exact quantiles the scalable way.
  *
  * Spark's exact `percentile` buffers every value of a group in one
  * aggregation buffer — fine for small groups, a memory wall for a
  * 100-TB source. Token lengths are a small DISCRETE domain, so the
  * exact quantile reduces to a histogram: groupBy (group, value)
  * count, cumulative count over the per-group histogram (a window over
  * ≤ |distinct values| rows per group, never over documents), then
  * the type-1 quantile q(p) = min value whose cumulative count
  * reaches ceil(p·n). Integer-only logic — the same formula replays
  * identically in any engine, which is what makes the oracle exact. */
object CorpusStats {

  /** Per-`groupCol` exact token-length quantiles at `probs`
    * (type-1/lower order statistic). Output: groupCol, n_docs, and one
    * `p{percent}` long column per requested probability. `tokenCount`
    * picks the tokenizer (whitespace default; pass
    * [[graft.functions.Subword.subwordTokenCount]] for subword
    * lengths — the count a sequence-length planner actually needs). */
  def lengthQuantiles(docs: DataFrame, groupCol: String, textCol: String,
                      probs: Seq[Double],
                      tokenCount: org.apache.spark.sql.Column =>
                        org.apache.spark.sql.Column =
                        TextFunctions.wsTokenCount): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1))
    val names = probs.map(p => "p" + math.round(p * 100))
    require(names.distinct.size == names.size,
      s"quantile probs round to duplicate column names: ${names.mkString(",")}")
    val hist = docs
      .select(col(groupCol),
        tokenCount(col(textCol)).cast("long").as("len"))
      .groupBy(groupCol, "len").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(groupCol).orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(Window.partitionBy(groupCol)))
    val qCols = probs.map { p =>
      val name = "p" + math.round(p * 100)
      min(when(col("cum") >= ceil(lit(p) * col("n")), col("len"))).as(name)
    }
    cum.groupBy(groupCol)
      .agg(max(col("n")).as("n_docs"), qCols: _*)
  }

  /** Corpus-level top-`k` token frequencies (exact heavy hitters) over
    * the normalized text: one explode + one groupBy count (map-side
    * combine does the heavy lifting — the shuffle carries one row per
    * DISTINCT token per map partition, not per occurrence), then a
    * two-phase top-k: a per-partition `k`-row sort-limit prunes the
    * tail before the single-partition final limit, so only
    * partitions × k rows ever funnel to one task — never the full
    * vocabulary. Deterministic total order: count desc, token asc.
    * Emits (rank, token, n_occurrences, n_docs). `n_docs` is the
    * document frequency (distinct docs containing the token), counted
    * in the same aggregate via the pre-deduplicated per-doc token set.
    */
  /** Corpus-wide (token, n_occurrences, n_docs) aggregate — the
    * unranked core of [[topTokens]]. Batch-only as written: doc
    * frequency needs the per-doc distinct aggregation first, and
    * chained streaming aggregations are unsupported. Streams get the
    * SAME output from `DocStreams.streamingTokenCounts` (one
    * flatMapGroupsWithState with per-batch doc dedup, parity-tested)
    * or occurrence-only counts from [[tokenOccurrences]]. */
  def tokenCounts(docs: DataFrame, textCol: String): DataFrame = {
    // one row per (doc, distinct token): occurrence counts come from
    // summing the per-doc count, doc frequency from counting rows
    val perDoc = docs
      .select(TextFunctions.normalizedWords(col(textCol)).as("__w"),
        monotonically_increasing_id().as("__doc"))
      .select(col("__doc"), explode(col("__w")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("__doc", "token").agg(count(lit(1)).as("__occ"))
    perDoc.groupBy("token")
      .agg(sum("__occ").as("n_occurrences"), count(lit(1)).as("n_docs"))
  }

  /** Occurrence-only token counts: ONE keyed aggregation over the
    * exploded token stream — the form a complete-mode STREAMING query
    * supports (state = one row per distinct token, map-side combined
    * per micro-batch). Batch result is identical to
    * [[tokenCounts]]'s `n_occurrences` column. */
  def tokenOccurrences(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.normalizedWords(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))

  def topTokens(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val counts = tokenCounts(docs, textCol)
    // the partition-less window runs AFTER the k-row limit: its input
    // is the TakeOrderedAndProject survivor set (<= k rows already on
    // one task), never the vocabulary — Spark's single-partition
    // warning here is about k rows, by construction
    val w = Window.orderBy(col("n_occurrences").desc, col("token"))
    counts
      .orderBy(col("n_occurrences").desc, col("token")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("token"), col("n_occurrences"), col("n_docs"))
  }
}
