package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document-quality rule gates and corpus-distribution drift checks.
  *
  * [[gopherFlags]] bundles the classic Gopher rule set (Rae et al.
  * 2021, "Scaling Language Models: Methods, Analysis & Insights from
  * Training Gopher", Appendix A1.1) adapted to delimiter-free text:
  * each rule is an auditable boolean column, `pass` is their
  * conjunction, and every underlying signal is emitted alongside so a
  * filtered doc explains itself. Everything is codegen'd built-ins
  * over ONE projection — no shuffle, no UDF, oracle-replayable.
  *
  * [[tokenDrift]] measures Jensen-Shannon divergence between each
  * group's unigram distribution and the whole corpus — the
  * distribution-shift check a corpus-versioning pipeline runs before
  * accepting a new snapshot or mixture weight change.
  */
object Quality {

  /** Stopword list for the ≥2-distinct-stopwords rule (Gopher's
    * "must contain 2 of the, be, to, of, and, that, have, with"). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document Gopher rule flags.
    *
    * Rules (delimiter-free adaptation — the line-shape rules of the
    * paper need line boundaries the caller's text may not have; the
    * repetition rule family is covered by `uniqueWordRatio` and the
    * span/paragraph dedup operators):
    *  - `r_word_count`:   minWords <= words <= maxWords
    *  - `r_mean_word_len`: 3 <= mean word length <= 10
    *  - `r_symbol_ratio`: (# + ellipsis occurrences) / words <= 0.1
    *  - `r_alpha_words`:  >= 80% of whitespace words contain a letter
    *  - `r_stopwords`:    >= 2 distinct Gopher stopwords present
    *  - `r_unique_words`: distinct/total normalized words >= minUnique
    */
  def gopherFlags(df: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minUnique: Double = 0.3): DataFrame = {
    val t = col(textCol)
    val wc = TextFunctions.wordCount(t)
    val mwl = TextFunctions.meanWordLength(t)
    val symbols = TextFunctions.occurrences(t, "#") +
      TextFunctions.occurrences(t, "...")
    val symbolRatio = when(wc === 0, lit(0.0))
      .otherwise(symbols.cast("double") / wc)
    val rawWords = split(trim(t), "\\s+")
    val alphaRatio = when(wc === 0, lit(0.0))
      .otherwise(size(filter(rawWords, w => w.rlike("[A-Za-z]")))
        .cast("double") / wc)
    val stopHits = size(array_intersect(
      array_distinct(TextFunctions.normalizedWords(t)),
      array(GopherStopwords.map(lit(_)): _*)))
    val uniq = TextFunctions.uniqueWordRatio(t)
    val rWc = wc >= minWords && wc <= maxWords
    val rMwl = mwl >= 3.0 && mwl <= 10.0
    val rSym = symbolRatio <= 0.1
    val rAlpha = alphaRatio >= 0.8
    val rStop = stopHits >= 2
    val rUniq = uniq >= minUnique
    df.select(col(idCol).as("id"),
      wc.as("n_words"), round(mwl, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(alphaRatio, 6).as("alpha_word_ratio"),
      stopHits.as("stopword_hits"), round(uniq, 6).as("unique_ratio"),
      rWc.as("r_word_count"), rMwl.as("r_mean_word_len"),
      rSym.as("r_symbol_ratio"), rAlpha.as("r_alpha_words"),
      rStop.as("r_stopwords"), rUniq.as("r_unique_words"),
      (rWc && rMwl && rSym && rAlpha && rStop && rUniq).as("pass"))
  }

  /** Per-group EMBEDDING drift vs the whole corpus: cosine between
    * each group's mean embedding and the corpus mean embedding — the
    * representation-space counterpart of [[tokenDrift]] (a source
    * whose centroid swings away from the corpus signals topical/
    * quality shift even when its vocabulary looks stable).
    *
    * Plan: ONE pass explodes (group, dim, value); per-(group, dim)
    * sum+count aggregates map-side; the corpus per-dim mean DERIVES
    * from the group sums (groups x dim rows — tiny, persisted so its
    * three consumers don't re-scan the corpus); the cosine folds over
    * dim rows per group. Nothing driver-side, nothing quadratic. */
  def embeddingDrift(df: DataFrame, groupCol: String,
                     vecCol: String): DataFrame = {
    val e = df.select(col(groupCol).as("grp"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "v")))
    val g = graft.CacheRegistry.register(e.groupBy("grp", "i")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val gm = g.select(col("grp"), col("i"), (col("s") / col("n")).as("m"))
    val cm = g.groupBy("i")
      .agg((sum("s") / sum("n")).as("c"))
    val agg = gm.join(cm, Seq("i"))
      .groupBy("grp")
      .agg(sum(col("m") * col("c")).as("mc"),
        sum(col("m") * col("m")).as("mm"),
        sum(col("c") * col("c")).as("cc"))
    val nv = g.groupBy("grp").agg(max("n").as("n_vecs"))
    agg.join(nv, Seq("grp"))
      .select(col("grp"),
        round(when(sqrt(col("mm")) === 0.0 || sqrt(col("cc")) === 0.0, 0.0)
          .otherwise(col("mc") / (sqrt(col("mm")) * sqrt(col("cc")))), 6)
          .as("drift_cosine"),
        col("n_vecs"))
  }

  /** Per-group unigram-distribution drift vs the whole corpus:
    * Jensen-Shannon divergence (natural log; 0 = identical, ln 2 =
    * disjoint), plus token totals. The drift gate of corpus
    * versioning: a new snapshot or mixture whose sources moved too far
    * from the reference distribution gets flagged before training.
    *
    * Plan: ONE tokenize pass -> per-(group, token) counts (map-side
    * combined); the count frame is persisted (MEMORY_AND_DISK, lazy —
    * the same contract as `LanguageModel.pseudoPerplexity`'s token
    * cache) because three derived aggregates and the probe side all
    * read it and Spark cannot reuse a non-identical subtree — without
    * the cache the corpus would tokenize four times. Corpus totals
    * derive from the group counts, never a second scan. The JS sum is
    * a per-group aggregate over joined rows; zero-probability terms
    * contribute 0 on their absent side by the JS convention — handled
    * exactly, no smoothing constant to tune. Cost note: the group x
    * corpus-vocab frame is linear in |vocab| * |groups| — groups here
    * are sources/splits (tens), not documents. */
  def tokenDrift(df: DataFrame, groupCol: String,
                 textCol: String): DataFrame = {
    val tok = df.select(col(groupCol).as("grp"),
      explode(TextFunctions.normalizedWords(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val gt = graft.CacheRegistry.register(
      tok.groupBy("grp", "token").agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val gTot = gt.groupBy("grp").agg(sum("c").as("gn"))
    val cTok = gt.groupBy("token").agg(sum("c").as("cc"))
    val cTot = cTok.agg(sum("cc").as("cn"))
    // per (group, token): p = group relative freq, q = corpus relative
    // freq. q > 0 wherever the corpus has the token; p = 0 tokens (in
    // corpus, not in group) contribute q/2 * ln(q/m) via the corpus
    // side, which requires the FULL token set per group -> build it
    // with the corpus-token x group frame joined to group counts
    val full = cTok.crossJoin(broadcast(gTot))
      .join(gt, Seq("grp", "token"), "left")
      .crossJoin(broadcast(cTot))
      .select(col("grp"), col("token"),
        (coalesce(col("c"), lit(0L)).cast("double") / col("gn")).as("p"),
        (col("cc").cast("double") / col("cn")).as("q"))
    val m = (col("p") + col("q")) / 2.0
    val term =
      when(col("p") > 0.0, col("p") * log(col("p") / m) / 2.0).otherwise(0.0) +
        when(col("q") > 0.0, col("q") * log(col("q") / m) / 2.0).otherwise(0.0)
    full.groupBy("grp")
      .agg(round(sum(term), 6).as("js_divergence"),
        count(when(col("p") > 0.0, 1)).as("n_group_tokens"),
        count(lit(1)).as("n_corpus_tokens"))
      .select(col("grp"), col("js_divergence"),
        col("n_group_tokens"), col("n_corpus_tokens"))
  }
}
