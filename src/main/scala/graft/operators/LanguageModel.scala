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

  /** Fan a SMALL input out before the per-row tokenize/transform work
    * — same rationale as the dedup family's spread: a sub-megabyte
    * parquet arrives as ONE scan partition, serializing all regex and
    * n-gram construction onto a single task (measured 10-16 s at
    * sf0.1 on one core vs sub-second spread over 32). `parallelism =
    * 0` leaves large inputs' natural splits alone. */
  private def spread(df: DataFrame, parallelism: Int): DataFrame =
    if (parallelism > 0) df.repartition(parallelism) else df

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
                       oovLogp: Double = math.log(1e-9),
                       parallelism: Int = 0): DataFrame = {
    val tokensRaw = spread(docs, parallelism)
      .select(col(idCol),
        explode(TextFunctions.normalizedWords(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    // self-LM mode scans tokens twice -> cache them (lazy persist);
    // external-LM mode scans once -> no cache needed
    val tokens = if (lm.isEmpty)
      graft.CacheRegistry.register(tokensRaw
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
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

  /** Bigram pseudo-perplexity with Stupid Backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation") — the CCNet-style
    * LM gate upgraded to word ORDER sensitivity: a shuffled-word
    * document keeps its unigram score exactly (same multiset) but its
    * bigram score collapses, which is what makes this a real quality
    * gate rather than a vocabulary check.
    *
    * Score of token i given its predecessor v (raw counts, as in the
    * paper — Stupid Backoff is deliberately unnormalized):
    *   S(w|v) = c(vw) / c(v)            if the bigram was seen
    *          = alpha * c(w) / N        otherwise (backoff, alpha=0.4)
    * and the document's first token scores S(w) = c(w)/N. The context
    * count c(v) is the FULL unigram count of v (the paper's serving
    * simplification; doc-final tokens inflate it by at most 1/doc).
    * pseudo_ppl_bigram = exp(-mean log S over the doc's tokens).
    *
    * 100-TB shape, same discipline as the unigram gate: the LM is TWO
    * groupBys over one exploded token pass (unigram + bigram counts,
    * both map-side combined); scoring is keyed equi-joins (word;
    * (prev, word)) + one per-doc aggregation. Bigram pairs come from a
    * per-row `transform` over the word array — positions never need a
    * window or a self-join, so nothing shuffles per token except the
    * count/score joins themselves. The model sides are vocab-sized;
    * AQE broadcasts them when they fit. Tokens are persisted across
    * the three scans (same caveat as self-LM mode above). */
  def bigramPseudoPerplexity(docs: DataFrame, idCol: String, textCol: String,
                             alpha: Double = 0.4,
                             parallelism: Int = 0): DataFrame =
    ngramPseudoPerplexity(docs, idCol, textCol, 2, alpha, parallelism)
      .withColumnRenamed("pseudo_ppl_2", "pseudo_ppl_bigram")

  /** Trigram pseudo-perplexity with Stupid Backoff — one more order
    * toward the CCNet-style 5-gram gate (r9 VERDICT #2). Catches
    * PHRASE-level disfluency the bigram model scores flat: swapping
    * two distant sentence halves preserves (almost) every bigram but
    * breaks the trigrams spanning each junction.
    *
    * Score of token i with contexts u = w(i-2), v = w(i-1):
    *   S(w|u,v) = c(uvw) / c(uv)              if the trigram was seen
    *            = alpha * S(w|v)              otherwise,
    *   S(w|v)   = c(vw) / c(v)                if the bigram was seen
    *            = alpha * c(w) / N            otherwise,
    * with the doc's first token scoring S(w) = c(w)/N and the second
    * S(w|v) — exactly [[bigramPseudoPerplexity]]'s recursion one level
    * deeper (Brants et al. 2007; raw counts, deliberately
    * unnormalized; alpha = 0.4). pseudo_ppl_tri = exp(-mean log S).
    *
    * 100-TB shape unchanged from the bigram gate: the LM is THREE
    * groupBys over one exploded token pass (uni/bi/tri counts, all
    * map-side combined); the trigram denominator c(uv) is the already
    * -built bigram count keyed one position over — a vocab-sized
    * self-join of model frames, never a corpus pass. Scoring is keyed
    * equi-joins ((word); (prev, word); (prev2, prev, word)) + one
    * per-doc aggregation; contexts come from the same per-row
    * `transform`, so positions never need a window or a self-join.
    * Tokens persist across the scans via the CacheRegistry release
    * contract like both lower-order gates. */
  def trigramPseudoPerplexity(docs: DataFrame, idCol: String,
                              textCol: String,
                              alpha: Double = 0.4,
                              parallelism: Int = 0): DataFrame =
    ngramPseudoPerplexity(docs, idCol, textCol, 3, alpha, parallelism)
      .withColumnRenamed("pseudo_ppl_3", "pseudo_ppl_tri")

  /** Context column names of an order-k gram, most distant first. */
  private[graft] def ctxCols(k: Int): Seq[String] =
    (k - 1 to 1 by -1).map(j => s"prev$j")

  /** Separator for single-column n-gram keys. `normalizeText` output is
    * [a-z0-9 ] with single spaces, so U+0001 cannot occur in a word —
    * the concatenated key is COLLISION-FREE (exact, not a hash). One
    * string key per exchange instead of k keeps the near-corpus-sized
    * order-k frames' shuffles narrow and their sort comparisons single
    * -memcmp. */
  private[graft] val GramSep = "\u0001"

  /** The order-k gram key of a token row: context words most distant
    * first, then the word. Only valid where the components are non-null
    * (class-filtered frames); with nulls present concat_ws skips them,
    * yielding a string with fewer separators that can never equal a
    * true k-gram key — a harmless guaranteed-miss for left joins. */
  private[graft] def gramKey(k: Int): org.apache.spark.sql.Column =
    concat_ws(GramSep, ((if (k == 1) Seq.empty else ctxCols(k)) :+ "word")
      .map(col): _*)

  /** The n-gram token frame: one row per token with `word` and its
    * `prev1..prev{order-1}` context columns (null at doc starts). Raw
    * split (not pre-filtered) so token POSITIONS mirror the oracle
    * exactly; normalizeText collapses runs of spaces, so the only
    * empty word is the whole-empty-text case, filtered after explode.
    * Works unchanged on a streaming `src` (pure per-row transform). */
  private[graft] def tokenizeNgrams(src: DataFrame, idCol: Option[String],
                                    textCol: String, order: Int,
                                    parallelism: Int): DataFrame = {
    // the token frame is the native NgramTokens expression — the
    // transform(sequence, struct(element_at..)) HOF it replaced was
    // interpreter-bound (outside whole-stage codegen, one boxed struct
    // + `order` element_at probes per token) and alone cost ~11 s of
    // q_pseudo_ppl_5's ~12 s at sf0.1; the kernel splits once and
    // shares each word's UTF8String across the adjacent tokens'
    // context fields. Same split semantics, same null-context rule —
    // every oracle hash unchanged.
    val pairs = graft.functions.NgramTokens.ngramTokens(
      TextFunctions.normalizeText(col(textCol)), order)
    val idCols = idCol.map(col).toSeq
    spread(src, parallelism)
      .select((idCols :+ explode(pairs).as("t")): _*)
      .select((idCols ++ (col("t.word").as("word") +:
        (1 until order).map(k => col(s"t.prev$k").as(s"prev$k")))): _*)
      .filter(length(col("word")) > 0)
  }

  /** Stupid-Backoff model frames from a token frame: order-k frame
    * keyed by the single-column `gram` key ([[gramKey]]) with `ls` =
    * ln c_k(u, w) − ln c_{k−1}(u) — each denominator is the already
    * -built order-(k−1) count frame, whose gram string IS the order-k
    * gram's separator-truncated prefix (`substring_index`), so the
    * denominator stays a model-frame join, never a corpus pass; order
    * 1 carries ln c(w) − ln N.
    *
    * SINGLE-EXCHANGE build (r10 VERDICT ask #2): each token row emits
    * its (k, gram) key for EVERY order whose context is fully present
    * (k = 1 always, k ≥ 2 while prev_{k−1} is non-null) in one
    * projection, and ONE map-side-combined groupBy counts all orders
    * together — 1 scan of the token frame + 1 shuffle instead of
    * `order` of each. The combined exchange carries the same
    * distinct-gram partial rows the k separate exchanges did; only
    * the scan/stage/job-launch overhead collapses. The counts frame
    * is persisted (CacheRegistry contract) because every per-order
    * model slices it twice (numerator + the order-(k−1) denominator). */
  private[graft] def buildNgramModels(modelTokens: DataFrame,
                                      order: Int): Map[Int, DataFrame] = {
    val keyStructs = filter(
      array((1 to order).map { k =>
        val g = if (k == 1) gramKey(1)
          else when(col(s"prev${k - 1}").isNotNull, gramKey(k))
            .otherwise(lit(null).cast("string"))
        struct(lit(k).as("k"), g.as("gram"))
      }: _*),
      s => s.getField("gram").isNotNull)
    val counts = graft.CacheRegistry.register(
      modelTokens.select(explode(keyStructs).as("t"))
        .select(col("t.k").as("k"), col("t.gram").as("gram"))
        .groupBy("k", "gram").agg(count(lit(1)).cast("double").as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def order_k(k: Int) =
      counts.filter(col("k") === k).select("gram", "cnt")
    val c1 = order_k(1)
    val total = c1.agg(sum("cnt").as("n"))
    val uniLs = c1.crossJoin(broadcast(total))
      .select(col("gram"), (log(col("cnt")) - log(col("n"))).as("ls"))
    val models = scala.collection.mutable.Map[Int, DataFrame](1 -> uniLs)
    for (k <- 2 to order) {
      // the context (k-1)-gram's key = this key's first k-1 parts
      val ctx = order_k(k - 1).select(col("gram").as("ctx"),
        col("cnt").as("cctx"))
      models(k) = order_k(k)
        .withColumn("ctx", substring_index(col("gram"), GramSep, k - 1))
        .join(ctx, "ctx")
        .select(col("gram"), (log(col("cnt")) - log(col("cctx"))).as("ls"))
    }
    models.toMap
  }

  /** Position-class predicate over a [[tokenizeNgrams]] frame: class 1
    * = the doc's first token (no context), class k < order = exactly
    * the token at position k-1 (k-1 context words, no more), class
    * `order` = every later token (full context). Disjoint and
    * exhaustive because a null prev_k implies null prev_{k+1}. */
  private[graft] def positionClassFilter(k: Int, order: Int) =
    if (k == 1) col("prev1").isNull
    else if (k < order) col(s"prev${k - 1}").isNotNull &&
      col(s"prev$k").isNull
    else col(s"prev${order - 1}").isNotNull

  /** Order-`order` Stupid-Backoff pseudo-perplexity — the general gate
    * behind [[bigramPseudoPerplexity]] and [[trigramPseudoPerplexity]],
    * at `order = 5` the full CCNet/KenLM-order fluency filter. Score of
    * token i with context u = the k-1 preceding words, k = min(order,
    * i+1):
    *   S(w|u) = c(uw) / c(u)        if the k-gram was seen
    *          = alpha * S(w|u')     otherwise (u' drops the most
    *                                distant context word; recursion
    *                                bottoms out at S(w) = c(w)/N),
    * alpha = 0.4 (Brants et al. 2007; raw counts, deliberately
    * unnormalized). Output: (idCol, n_words, pseudo_ppl_<order>) with
    * pseudo_ppl = exp(-mean log S).
    *
    * Self-LM scoring discipline (the r10 rewrite): with `modelDocs`
    * unset the models are built from the very token frame being
    * scored, so every observed k-gram is in its own model frame by
    * construction and the alpha branches can never fire. Each position
    * CLASS therefore takes exactly ONE inner model join — position
    * p < order-1 (one row per doc each) joins the order-(p+1) frame,
    * positions >= order-1 join the order-`order` frame. The classes
    * are disjoint and exhaustive because a null prev_k implies null
    * prev_{k+1}.
    *
    * External-LM mode (`modelDocs = Some(reference)`) is the CCNet
    * production shape — train the LM on a clean reference corpus,
    * score the crawl — and there backoff IS live: ALL classes score
    * in ONE pass of the token frame (the streamingLmGate shape; r16
    * optimization round) — left joins against orders `order`..1, then
    * a position CASE selects each class's alpha-coalesce chain,
    * bottoming out at `oovLogp` (the floor for words the reference
    * corpus has never seen, with the accumulated alpha chain applied —
    * S(w) = exp(oovLogp) at order 1). A class-k token's gram_j for
    * j > k concat_ws-skips its null prevs — a guaranteed join miss
    * whose ls_j the CASE never reads.
    * [[graft.streaming.DocStreams.streamingLmGate]] is the streaming
    * face: the same models as stream-static joins.
    *
    * 100-TB shape: `order` groupBys over ONE exploded token pass (all
    * map-side combined); each denominator c(u) is the already-built
    * order-(k-1) count frame keyed one position over — model-frame
    * joins, never a corpus pass. Contexts come from the same per-row
    * `transform`, so positions never need a window or a self-join;
    * the only corpus-token-sized exchange is the final class join,
    * partial-aggregated and spillable. Tokens persist across the
    * scans via the CacheRegistry release contract. */
  def ngramPseudoPerplexity(docs: DataFrame, idCol: String,
                            textCol: String, order: Int,
                            alpha: Double = 0.4,
                            parallelism: Int = 0,
                            modelDocs: Option[DataFrame] = None,
                            oovLogp: Double = math.log(1e-9)): DataFrame = {
    require(order >= 2 && order <= 8,
      s"order must be in [2, 8] (unigram = pseudoPerplexity), got $order")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    // self-LM mode scans the token frame `order` + 1 times (model build
    // + one inner join per position class) -> persist; external mode
    // scores in ONE pass (below) and the model corpus is scanned once
    // by the combined count groupBy -> no token cache needed on either
    // side (r16 optimization round: two persists and their fill passes
    // removed)
    val tokensRaw = tokenizeNgrams(docs, Some(idCol), textCol, order,
      parallelism)
    val tokens = if (modelDocs.isEmpty)
      graft.CacheRegistry.register(tokensRaw
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    else tokensRaw
    val modelTokens = modelDocs.map(md =>
      tokenizeNgrams(md, None, textCol, order, parallelism))
      .getOrElse(tokens)
    val models = buildNgramModels(modelTokens, order)
    // position class k scores with the order-k model: class 1 = first
    // token, class k < order = exactly the token at position k-1,
    // class `order` = every later token
    def classFilter(k: Int) = positionClassFilter(k, order)
    val perDoc = if (modelDocs.isEmpty) {
      // self-LM fast path: every observed k-gram is in its own model
      // frame, so the backoff branches are dead and ONE inner join
      // per class suffices (see the scaladoc argument). The bulk class
      // (`order`) joins exactly one model frame — at 100 TB this is
      // the minimal corpus-token join count, which is why the class
      // split stays (the one-pass form below would probe every order).
      val classLs = (1 to order).map { k =>
        tokens.filter(classFilter(k))
          .select(col(idCol), gramKey(k).as("gram"))
          .join(models(k), "gram").select(col(idCol), col("ls"))
      }
      classLs.reduce(_ unionByName _)
    } else {
      // external-LM mode: backoff is LIVE, and EVERY class routes
      // through left joins — so score all classes in ONE pass of the
      // token frame (the streamingLmGate shape, r16 optimization
      // round): left-join orders `order`..1 once, then select the
      // class-k alpha chain with a position CASE. Join count on the
      // bulk class is unchanged (it already routed through `order`
      // joins); the former per-class token scans (`order` of them),
      // the class union, and the token persist all disappear. Each
      // per-token value is bit-identical: gram_j for a class-k token
      // with j > k concat_ws-skips the null prevs — a guaranteed join
      // miss whose ls_j the class CASE never reads.
      var df = tokens
      for (j <- order to 1 by -1)
        df = df.withColumn(s"gram$j", gramKey(j))
          .join(models(j).withColumnRenamed("ls", s"ls$j")
            .withColumnRenamed("gram", s"gram$j"), Seq(s"gram$j"), "left")
      // ln(alpha) is the cost of DESCENDING an order; the OOV floor
      // replaces S at order 1, it is not one more backoff step
      def chain(k: Int) = {
        var e: org.apache.spark.sql.Column =
          coalesce(col("ls1"), lit(oovLogp))
        for (j <- 2 to k) e = coalesce(col(s"ls$j"), log(lit(alpha)) + e)
        e
      }
      var ls = chain(order)
      for (k <- order - 1 to 1 by -1)
        ls = when(col(s"prev$k").isNull, chain(k)).otherwise(ls)
      df.select(col(idCol), ls.as("ls"))
    }
    perDoc
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), avg(col("ls")).as("mean_ls"))
      .select(col(idCol), col("n_words"),
        exp(-col("mean_ls")).as(s"pseudo_ppl_$order"))
  }

  /** Moore-Lewis cross-entropy-difference data selection (Moore &
    * Lewis 2010, "Intelligent Selection of Language Model Training
    * Data") — the classic contrastive in-domain selector: score every
    * pool document under an IN-DOMAIN LM and under the POOL's own LM,
    * and rank by the difference
    *
    *   ce_diff(d) = H_in(d) − H_pool(d)
    *
    * (per-token cross-entropies in nats). Low ce_diff = the document
    * looks like the in-domain corpus RELATIVE to how typical it is of
    * the pool — the normalization that makes this beat a plain
    * in-domain-LM gate (which just prefers short/stereotypical text).
    * Both LMs are order-`order` Stupid-Backoff models
    * ([[buildNgramModels]]; Brants et al. 2007, raw counts, alpha
    * backoff). Output: (idCol, n_words, ce_in, ce_out, ce_diff) —
    * empty documents vanish (no tokens), like every gate in this file.
    *
    * Against the in-domain models backoff is LIVE (the pool contains
    * n-grams/words the in-domain corpus never saw): the alpha chain
    * rides as a coalesce, bottoming out at `oovLogp` — exactly
    * [[ngramPseudoPerplexity]]'s external mode. Against the pool's own
    * models the backoff branches are provably dead (every observed
    * k-gram is in its model frame by construction), so a class-k
    * token's pool join is a guaranteed HIT. Both scores ride ONE pass
    * of the token frame (the streamingCeDiffGate shape; r16
    * optimization round): left joins against both model sets for
    * orders `order`..1, then a position CASE selects each side's
    * class-k value, one final per-doc aggregation — no per-class
    * token scans, no class union.
    *
    * 100-TB shape: the pool corpus is tokenized ONCE (cached token
    * frame shared by the pool-model build and both scorings — at scale
    * the tokenize pass dominates, so calling the two ppl operators
    * separately would double it); the in-domain corpus is by
    * definition small next to the pool. All model builds are map-side
    * combined groupBys; scoring is keyed equi-joins with vocab-sized
    * right sides (AQE broadcasts them when they fit); no windows, no
    * self-joins, the only corpus-sized exchange is the final per-doc
    * aggregation, partial-aggregated and spillable. */
  def crossEntropyDiff(docs: DataFrame, idCol: String, textCol: String,
                       inDomainDocs: DataFrame, order: Int = 3,
                       alpha: Double = 0.4,
                       oovLogp: Double = math.log(1e-9),
                       parallelism: Int = 0): DataFrame = {
    require(order >= 2 && order <= 8,
      s"order must be in [2, 8], got $order")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    // the pool token frame feeds the pool-model build AND the one-pass
    // scoring below (2 scans) -> persist; the in-domain corpus is
    // scanned exactly once by its combined count groupBy -> no cache
    // (r16 optimization round: one persist + fill pass removed)
    val tokens = graft.CacheRegistry.register(
      tokenizeNgrams(docs, Some(idCol), textCol, order, parallelism)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val inTokens = tokenizeNgrams(inDomainDocs, None, textCol, order,
      parallelism)
    val inModels = buildNgramModels(inTokens, order)
    val poolModels = buildNgramModels(tokens, order)
    // ONE pass of the token frame scores BOTH models (the
    // streamingCeDiffGate shape, r16 optimization round): left-join
    // in-domain and pool frames for orders `order`..1 once, then pick
    // each side's class-k value with a position CASE — the former
    // per-class token scans, the class union, and their stages
    // disappear; per-token values are bit-identical (a class-k token's
    // gram_j for j > k is a guaranteed join miss never read by the
    // CASE; its pool gram_k is a guaranteed HIT, so the left join
    // equals the old inner join on the class-k rows).
    var scored = tokens
    for (j <- order to 1 by -1)
      scored = scored.withColumn(s"gram$j", gramKey(j))
        .join(inModels(j).select(col("gram").as(s"gram$j"),
          col("ls").as(s"ls_in$j")), Seq(s"gram$j"), "left")
        .join(poolModels(j).select(col("gram").as(s"gram$j"),
          col("ls").as(s"ls_out$j")), Seq(s"gram$j"), "left")
    def chainIn(k: Int) = {
      var e: org.apache.spark.sql.Column =
        coalesce(col("ls_in1"), lit(oovLogp))
      for (j <- 2 to k) e = coalesce(col(s"ls_in$j"), log(lit(alpha)) + e)
      e
    }
    def classCase(of: Int => org.apache.spark.sql.Column) = {
      var e = of(order)
      for (k <- order - 1 to 1 by -1)
        e = when(col(s"prev$k").isNull, of(k)).otherwise(e)
      e
    }
    scored.select(col(idCol), classCase(chainIn).as("ls_in"),
        classCase(k => col(s"ls_out$k")).as("ls_out"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        avg(col("ls_in")).as("mean_ls_in"),
        avg(col("ls_out")).as("mean_ls_out"))
      .select(col(idCol), col("n_words"),
        (-col("mean_ls_in")).as("ce_in"),
        (-col("mean_ls_out")).as("ce_out"),
        (col("mean_ls_out") - col("mean_ls_in")).as("ce_diff"))
  }
}
