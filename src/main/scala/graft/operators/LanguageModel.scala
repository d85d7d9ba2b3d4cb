package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus unigram language model + pseudo-perplexity quality scoring —
  * the cheap LM-based quality filter of the classic training-data
  * pipelines (CCNet-style: score every document against a language
  * model and gate on the score), with a unigram model so the whole
  * thing stays declarative and engine-checkable.
  *
  * 100-TB shape: the LM is ONE groupBy over exploded words (map-side
  * combined); scoring is ONE keyed equi-join (word) + per-doc
  * aggregation. Nothing driver-side, no UDFs, vocabulary never needs
  * to fit anywhere but a shuffle partition. At trillion-token scale
  * the LM side is still tiny next to the corpus (vocab ~10^7 rows),
  * so Spark/AQE broadcasts it when it fits and sort-merges when not —
  * both correct.
  */
object LanguageModel {

  /** Unigram log-probabilities of the corpus: (word, logp) with
    * logp = ln(count / total). Deterministic: counts are exact longs
    * and the log runs per-word. */
  def unigramLogProbs(docs: DataFrame, textCol: String): DataFrame = {
    val words = docs
      .select(explode(TextFunctions.normalizedWords(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val counts = words.groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("word"),
        (log(col("cnt").cast("double")) - log(col("total").cast("double")))
          .as("logp"))
  }

  /** Pseudo-perplexity of every document under the corpus unigram LM:
    * ppl = exp(-mean logp over the doc's words). Low = stereotypical
    * (high-frequency vocabulary), high = rare/garbled vocabulary —
    * the gate signal. `lm` defaults to a model built from `docs`
    * itself (no OOV by construction); pass an external LM plus
    * `oovLogp` (a floor log-probability) to score a corpus against a
    * reference corpus, where unseen words must not drop rows.
    *
    * Execution cost in self-LM mode: the plan references the
    * normalize+explode subtree twice (LM aggregation and scoring
    * join) — Spark cannot reuse a non-identical subtree — so the
    * token frame is persisted (MEMORY_AND_DISK, lazily: it fills on
    * the caller's first action) and both sides read the cache; the
    * corpus text is tokenized ONCE. The cache has no internal release
    * point (this operator runs no action), so it lives until LRU
    * eviction or the caller's `spark.catalog.clearCache()` — it is
    * exploded-words-sized, the price of not scanning the corpus
    * twice. External-LM mode touches the corpus once and persists
    * nothing. */
  def pseudoPerplexity(docs: DataFrame, idCol: String, textCol: String,
                       lm: Option[DataFrame] = None,
                       oovLogp: Double = math.log(1e-9)): DataFrame = {
    val tokensRaw = docs
      .select(col(idCol),
        explode(TextFunctions.normalizedWords(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    // self-LM mode scans tokens twice -> cache them (lazy persist);
    // external-LM mode scans once -> no cache needed
    val tokens = if (lm.isEmpty)
      tokensRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else tokensRaw
    val model = lm.getOrElse {
      val counts = tokens.groupBy("word").agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum("cnt").as("total"))
      counts.crossJoin(broadcast(total))
        .select(col("word"),
          (log(col("cnt").cast("double")) - log(col("total").cast("double")))
            .as("logp"))
    }
    tokens.join(model, Seq("word"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        avg(coalesce(col("logp"), lit(oovLogp))).as("mean_logp"))
      .select(col(idCol), col("n_words"),
        exp(-col("mean_logp")).as("pseudo_ppl"))
  }
}
