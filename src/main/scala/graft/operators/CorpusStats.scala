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

  /** Per-group TOKEN-DISTRIBUTION entropy under an arbitrary
    * tokenizer — the tokenizer-SELECTION diagnostic the fertility
    * queries don't capture (two tokenizers with equal fertility can
    * produce very differently-shaped id distributions; Shannon/Rényi
    * efficiency of the token distribution is the published predictor
    * of downstream quality — Zouhar et al. 2023, "Tokenization and
    * the Theory of Compression"). Per `groupCol`:
    *
    *  - `n_tokens` / `distinct_tokens` — exact BIGINT;
    *  - `shannon_bits` = −Σ pᵢ log₂ pᵢ computed as
    *    (ln N − Σ cᵢ·ln cᵢ / N) / ln 2 — counts stay exact integers,
    *    ONE float sum (the q_token_drift parity discipline, round 6);
    *  - `renyi2_bits` = −log₂ Σ pᵢ² = (2·ln N − ln Σ cᵢ²) / ln 2 with
    *    Σ cᵢ² an EXACT integer sum in decimal(38,0) — a Long square
    *    overflows once any count passes ~3×10⁹, which a 100-TB corpus
    *    (~10¹³ tokens) reaches for every token above a 0.02% share;
    *    decimal keeps the sum exact to 10³⁸ (ANSI-safe, no silent
    *    wrap). The collision entropy, most sensitive to head-heavy
    *    vocabularies;
    *  - `top_token_share` = max cᵢ / N.
    *
    * 100-TB shape: one tokenize pass → map-side-combined
    * groupBy(group, id) → a vocab×groups-sized frame; the entropy
    * aggregate runs over THAT, never over documents. No windows. */
  def tokenEntropy(docs: DataFrame, groupCol: String, textCol: String,
                   tokens: org.apache.spark.sql.Column =>
                     org.apache.spark.sql.Column): DataFrame = {
    val counts = docs
      .select(col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("id"))
      .groupBy("grp", "id").agg(count(lit(1)).as("c"))
    val ln2 = math.log(2.0)
    counts.groupBy("grp")
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("distinct_tokens"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("__sumclnc"),
        sum(col("c").cast("decimal(38,0)") * col("c").cast("decimal(38,0)"))
          .as("__sumc2"),
        max("c").as("__cmax"))
      .select(col("grp"), col("n_tokens"), col("distinct_tokens"),
        round((log(col("n_tokens").cast("double"))
          - col("__sumclnc") / col("n_tokens")) / ln2, 6)
          .as("shannon_bits"),
        round((lit(2.0) * log(col("n_tokens").cast("double"))
          - log(col("__sumc2").cast("double"))) / ln2, 6)
          .as("renyi2_bits"),
        round(col("__cmax").cast("double") / col("n_tokens"), 6)
          .as("top_token_share"))
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

  /** Column profile — the data-quality audit every snapshot publish
    * runs: one row per profiled column with row/null/distinct counts,
    * min/max, and numeric moments. The whole profile is ONE aggregate
    * over ONE scan, unpivoted driver-free with an explode (the
    * one-row aggregate is the only thing the explode touches).
    *
    * Distinct counts are the expensive part. `exact = true` uses real
    * `count(DISTINCT c)` — Spark plans multiple distinct aggregates
    * via an Expand that replicates the scan once per profiled column,
    * the honest cost of exactness. `exact = false` swaps in
    * single-pass HLL sketches (`approx_count_distinct`, default rsd
    * 5%) — the 100-TB default, one scan total, no Expand; the other
    * metrics are unchanged. Min/max surface as rounded doubles for
    * numeric columns and raw strings for string columns — two typed
    * column pairs, no cross-engine cast-format trap.
    *
    * Mean/stddev round to 6/4 decimals: both are tree-reduced double
    * sums whose fold order varies run to run; the rounding absorbs
    * last-ULP noise, same convention as the moments queries. */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no column $c"))
    val numeric = cols.map(c => c ->
      df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .toMap
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val aggs = cols.flatMap { c =>
      val nd =
        if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(col(c)).cast("long").as(s"__nn_$c"),
        nd.cast("long").as(s"__nd_$c"),
        (if (numeric(c)) round(min(col(c)).cast("double"), 6)
         else nullD).as(s"__minn_$c"),
        (if (numeric(c)) round(max(col(c)).cast("double"), 6)
         else nullD).as(s"__maxn_$c"),
        (if (numeric(c)) nullS else min(col(c)).cast("string"))
          .as(s"__mins_$c"),
        (if (numeric(c)) nullS else max(col(c)).cast("string"))
          .as(s"__maxs_$c"),
        // cast BEFORE rounding: avg of a decimal column is decimal,
        // and the unpivot array needs one struct type across columns
        (if (numeric(c)) round(avg(col(c)).cast("double"), 6) else nullD)
          .as(s"__mean_$c"),
        (if (numeric(c)) round(stddev_samp(col(c)).cast("double"), 4)
         else nullD).as(s"__sd_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("column"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$c")).as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__minn_$c").as("min_num"), col(s"__maxn_$c").as("max_num"),
      col(s"__mins_$c").as("min_str"), col(s"__maxs_$c").as("max_str"),
      col(s"__mean_$c").as("mean"), col(s"__sd_$c").as("stddev")))
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
