package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting / sampling for training pipelines.
  *
  * Everything here assigns by CONTENT HASH, never `rand()`: a row's
  * split is a pure function of its key, so it survives reruns, engine
  * swaps, partition-layout changes, and corpus growth — the property
  * that makes train/test contamination auditable. The hash is the
  * first 32 bits of md5 (available identically in any engine, which
  * keeps the assignment DuckDB-oracle-checkable), mapped to [0, 1).
  */
object Sampling {

  /** Uniform [0,1) bucket from the key + salt (md5-based, engine-portable). */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("double") / 4294967296.0

  /** Adds a `split` column assigning each row to one of `splits`
    * (name -> fraction) by hash bucket; fractions carve cumulative
    * ranges of [0,1) in order, any remainder joins the LAST split.
    * Same key + salt => same split, forever. */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Double)],
                salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0), "fractions must be >= 0")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"fractions sum ${splits.map(_._2).sum} > 1")
    val bucket = hashBucket(col(keyCol), salt)
    var acc = 0.0
    val cums = splits.map { case (name, f) => acc += f; (name, acc) }
    var assign: Column = null
    cums.foreach { case (name, c) =>
      assign = if (assign == null) when(bucket < c, name)
        else assign.when(bucket < c, name)
    }
    df.withColumn("split", coalesce(assign, lit(splits.last._1)))
  }

  /** Deterministic subsample: keep rows whose hash bucket falls below
    * `fraction` — the rerun-stable form of `df.sample(fraction)`. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = "graft"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    df.filter(hashBucket(col(keyCol), salt) < fraction)
  }

  /** Temperature keep-fractions for source mixing (the multilingual-LM
    * convention): target mixture p_g ∝ n_g^alpha, so the keep rate of
    * group g is r_g ∝ n_g^(alpha-1), normalized to max 1 (filtering
    * can only downsample — the dominant source keeps everything,
    * smaller sources keep proportionally more of their share).
    * alpha = 1 keeps every group whole; alpha = 0 equalizes expected
    * kept counts. Fractions are floored to the 1/4096 dyadic grid so
    * the [0,1) threshold compare is binary-exact in every engine —
    * same trick as [[hashSplit]]'s dyadic boundaries, but clamped UP
    * to the smallest nonzero grid step: every group's true rate is
    * > 0 (counts are positive), so flooring a dominant group to
    * exactly 0.0 under extreme skew (ratio beyond 4096^(1/(1-alpha)))
    * would silently drop the whole source — a floor-to-zero is a grid
    * artifact, never the requested mixture. Driver-side math: the
    * input is one count per GROUP, never per row. */
  def temperatureFractions(counts: Map[String, Long],
                           alpha: Double): Map[String, Double] = {
    require(counts.nonEmpty && counts.values.forall(_ > 0))
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0, 1], got $alpha")
    val raw = counts.map { case (g, n) => g -> math.pow(n.toDouble, alpha - 1) }
    val mx = raw.values.max
    raw.map { case (g, r) =>
      g -> math.max(1.0 / 4096.0, math.floor(r / mx * 4096.0) / 4096.0)
    }
  }

  /** Deterministic source-mixture sampling: keep each row iff its hash
    * bucket < fraction(its group); groups missing from the map keep
    * `defaultFraction` of their rows. Composes [[hashBucket]] with a
    * per-group threshold, so the kept set is a pure function of
    * (key, salt, fractions) — rerun/engine/layout-stable like every
    * sampler here, and a pure filter at the scan (no shuffle). */
  def mixtureSample(df: DataFrame, keyCol: String, groupCol: String,
                    fractions: Map[String, Double],
                    defaultFraction: Double = 1.0,
                    salt: String = "graft"): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction))
      .forall(f => f >= 0 && f <= 1), "fractions must be in [0, 1]")
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (g, f)) => when(col(groupCol) === g, f).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt) < frac)
  }

  /** LEAKAGE-SAFE split: [[hashSplit]] keyed by each document's
    * duplicate-cluster CANONICAL id instead of its own id, so every
    * member of a duplicate group lands in the same split — the
    * train/test-leakage guard (a near-copy of a test doc in train is
    * exactly the contamination eval decks exist to prevent, and
    * id-keyed splitting produces it whenever the corpus has dups).
    *
    * This overload derives the canonical from the EXACT normalized-
    * text fingerprint (one map-side-combined groupBy + one keyed join
    * — the [[graft.operators.Dedup.exactGroups]] identity); for
    * near-dup safety pass a cluster column from
    * [[graft.operators.Dedup.dupClusters]] to the column overload.
    * Both the fingerprint and the split bucket are md5-derived, so the
    * assignment replays in any engine.
    *
    * NULL text (quarantine rows from the JSONL/WARC sources) cannot be
    * silently dropped by the inner join (NULL != NULL under equi-join
    * semantics): each NULL-text row gets a per-id sentinel fingerprint
    * — its own singleton group, which is also semantically right (no
    * text means nothing to leak). */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       splits: Seq[(String, Double)],
                       salt: String = "graft"): DataFrame = {
    val fp = coalesce(graft.functions.TextFunctions.fingerprint(col(textCol)),
      concat(lit("@nulltext:"), col(idCol).cast("string")))
    val withFp = df.withColumn("__lsfp", fp)
    val canon = withFp.groupBy("__lsfp")
      .agg(min(col(idCol)).as("__lscanon"))
    leakageSafeSplitByKey(withFp.join(canon, Seq("__lsfp")), "__lscanon",
      splits, salt).drop("__lsfp", "__lscanon")
  }

  /** Column overload of [[leakageSafeSplit]]: the caller supplies the
    * cluster/canonical key (e.g. `dupClusters` output joined on) and
    * the split is keyed by it. */
  def leakageSafeSplitByKey(df: DataFrame, canonicalCol: String,
                            splits: Seq[(String, Double)],
                            salt: String = "graft"): DataFrame =
    hashSplit(df, canonicalCol, splits, salt)

  /** Rebalance every group toward caller-supplied TARGET WEIGHTS (the
    * DoReMi/data-mixing shape: "train on 30% web, 40% books, 30%
    * code"), by deterministic hash downsampling only — no group is
    * ever upsampled. The achievable mixture is the largest c with
    * c * w_g <= tokens_g for all g, i.e. c = min_g tokens_g / w_g;
    * keep fraction f_g = c * w_g / tokens_g (the binding group keeps
    * everything; expected kept tokens are exactly proportional to the
    * weights). Generalizes [[rebalanceToMinTokens]] (= equal weights).
    *
    * 100-TB shape identical to it: per-group token totals in ONE
    * map-side-combined groupBy, the scaling constant derived in-plan
    * via a broadcast min, fractions broadcast-joined onto one scan,
    * keep = engine-portable md5 bucket compare. Groups absent from
    * `weights` get weight 0 (dropped) — an explicit mixture decision,
    * not an accident, so it requires `weights` to cover every group
    * unless `allowMissing`. */
  def rebalanceToWeights(df: DataFrame, idCol: String, groupCol: String,
                         tokensCol: String, weights: Map[String, Double],
                         allowMissing: Boolean = false,
                         salt: String = "rebalance"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "rebalanceToWeights: weights must be positive")
    val wCol = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (g, wv)) => when(col(groupCol) === g, wv).otherwise(acc)
    }
    val tot = graft.CacheRegistry.register(df
      .groupBy(col(groupCol))
      .agg(sum(col(tokensCol)).as("__tok"))
      .withColumn("__w", wCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    if (!allowMissing) {
      val missing = tot.filter(col("__w").isNull)
        .select(col(groupCol)).limit(10).collect().map(_.get(0))
      require(missing.isEmpty,
        s"rebalanceToWeights: groups without a weight: " +
          s"${missing.mkString(", ")} — pass allowMissing = true to DROP them")
    }
    val c = tot.filter(col("__w").isNotNull)
      .agg(min(col("__tok").cast("double") / col("__w")).as("__c"))
    val frac = tot.crossJoin(broadcast(c))
      .select(col(groupCol),
        when(col("__w").isNull, 0.0)
          .otherwise(least(lit(1.0),
            col("__c") * col("__w") / col("__tok").cast("double")))
          .as("keep_fraction"))
    df.join(broadcast(frac), Seq(groupCol))
      .withColumn("keep",
        hashBucket(col(idCol), salt) < col("keep_fraction"))
  }

  /** Token-budget equalization across groups: every group is
    * deterministically downsampled (hash order, like every sampler
    * here) so its EXPECTED kept token total matches the smallest
    * group's — the "don't let CommonCrawl drown the books" rebalance,
    * stated in tokens rather than rows because training budgets are
    * token budgets. Keep fraction f_g = min_tokens / tokens_g, derived
    * IN-PLAN (one groupBy + one broadcast min — no driver map, unlike
    * [[temperatureFractions]] which takes counts the caller collected);
    * the dominant groups downsample, the smallest keeps everything.
    *
    * Output = input rows + `keep_fraction` + `keep`; callers filter on
    * `keep` or audit the flags. 100-TB shape: the fraction table is
    * |groups| rows joined broadcast onto one scan; the keep decision
    * is a pure per-row hash compare. */
  def rebalanceToMinTokens(df: DataFrame, idCol: String, groupCol: String,
                           tokensCol: String,
                           salt: String = "rebalance"): DataFrame = {
    // persist the |groups|-row totals frame: BOTH the global min and
    // the fraction projection consume it, and without the cache each
    // consumer re-tokenizes the corpus from the scan (the tokenDrift/
    // pseudoPerplexity cache contract; the frame is groups-sized)
    val tot = graft.CacheRegistry.register(df.groupBy(col(groupCol))
      .agg(sum(col(tokensCol)).as("__tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val mn = tot.agg(min(col("__tok")).as("__mn"))
    val frac = tot.crossJoin(broadcast(mn))
      .select(col(groupCol),
        (col("__mn").cast("double") / col("__tok")).as("keep_fraction"))
    df.join(broadcast(frac), Seq(groupCol))
      .withColumn("keep",
        hashBucket(col(idCol), salt) < col("keep_fraction"))
  }

  /** Per-group quota cap: keep at most `quota` rows per group, chosen
    * in deterministic hash order (`hashBucket(id)` asc, id asc) — the
    * "cap CommonCrawl at N docs, books at M" mixing step, stable
    * across reruns/engines/layouts like every sampler here.
    *
    * EXACT top-`quota`-per-group without sorting whole groups: a
    * hash-threshold prefilter keeps ~`margin x quota + slack` rows per
    * group (every dropped row has a LARGER bucket than every kept row,
    * so the group's true top-quota survives whenever at least `quota`
    * rows land under the threshold), and only the survivors are
    * window-ranked — the per-group sort input is O(quota), not
    * O(group). Groups where the prefilter left fewer than `quota`
    * survivors (binomially negligible at margin 2, but handled, not
    * assumed) are re-ranked from their full row set, so the result is
    * always exactly the naive `row_number() <= quota` cut. */
  def groupQuotaCap(df: DataFrame, idCol: String, groupCol: String,
                    quota: Int, salt: String = "graft",
                    margin: Double = 2.0, slack: Int = 100): DataFrame = {
    require(quota >= 1, "quota must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val b = hashBucket(col(idCol), salt)
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val joined = df.join(counts, Seq(groupCol))
    val frac = least(lit(1.0), (lit(margin * quota + slack)) / col("__n"))
    val pre = joined.filter(b < frac)
    // groups whose survivor set can't certify the exact top-quota:
    // fewer than quota survived AND the prefilter actually dropped rows.
    // Derived from `counts` (every group), not from `pre` — a group the
    // prefilter emptied ENTIRELY has no row in `pre.groupBy` and must
    // still fall back to full re-ranking, not vanish from the result.
    val survivors = pre.groupBy(col(groupCol)).agg(count(lit(1)).as("__s"))
    val under = counts.join(survivors, Seq(groupCol), "left")
      .withColumn("__s0", coalesce(col("__s"), lit(0L)))
      .filter(col("__s0") < quota && col("__s0") < col("__n"))
      .select(col(groupCol))
    val certified = pre.join(under, Seq(groupCol), "left_anti")
    val fallback = df.join(under, Seq(groupCol), "left_semi")
      .join(counts, Seq(groupCol))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    certified.unionByName(fallback)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__n", "__rn")
  }

  /** Quality-ordered token-budget cut: keep the best documents, in
    * (`qualityCol` DESC, `idCol` ASC) order, whose INCLUSIVE running
    * token total stays within `budget` — the "top up the training mix
    * to N tokens with the best data" curation step. Adds `cum_tokens`
    * (the running total at each kept doc).
    *
    * The naive form is a cumulative sum over a GLOBAL sort — a
    * single-reducer wall at 100 TB. This runs it as two scale-safe
    * stages: (1) per-quality-LEVEL token subtotals (one row per
    * distinct quality value) get an exclusive prefix via the
    * range-bucketed [[graft.functions.PrefixSum]]; (2) within each
    * level, the per-doc running sum uses PrefixSum again partitioned
    * by quality and range-bucketed on `idCol` — so even a level
    * holding half the corpus (quality scores tie heavily) never
    * funnels through one task. All sums are integer-exact in double,
    * so the result is bit-equal to the naive window in any engine —
    * the oracle replays it as one `sum() OVER (ORDER BY quality DESC,
    * id)` window.
    *
    * `qualityCol` and `idCol` must be non-null; `idCol` distinct. */
  def tokenBudgetFilter(df: DataFrame, idCol: String, qualityCol: String,
                        tokensCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    // one row per distinct quality level -> exclusive prefix of the
    // levels ABOVE it (ascending in -quality = descending in quality)
    val lvl = df.groupBy(col(qualityCol).as("__q"))
      .agg(sum(col(tokensCol)).as("__lvl_t"))
      .withColumn("__negq", -col("__q"))
    val prior = graft.functions.PrefixSum
      .inclusive(lvl, Seq.empty, "__negq", "__lvl_t", "__cum_lvl")
      .withColumn("__prior", col("__cum_lvl") - col("__lvl_t"))
      .select(col("__q"), col("__prior"))
    // within-level running sum, range-bucketed on id (no single-task
    // window even when one quality level dominates the corpus)
    val withIn = graft.functions.PrefixSum
      .inclusive(df, Seq(qualityCol), idCol, tokensCol, "__in_lvl")
    withIn
      .join(prior, withIn(qualityCol) === prior("__q"))
      .withColumn("cum_tokens", (col("__prior") + col("__in_lvl")).cast("long"))
      .filter(col("cum_tokens") <= budget)
      .drop("__q", "__prior", "__in_lvl")
  }

  /** DSIR importance weights — Data Selection via Importance
    * Resampling (Xie et al. 2023): the hashed-feature contrastive
    * selector that scales where an explicit n-gram LM
    * ([[LanguageModel.crossEntropyDiff]], Moore-Lewis) would carry an
    * unbounded vocabulary. Features are the document's unigrams AND
    * bigrams over normalized words, hashed into `buckets` cells
    * (md5-derived, engine-portable like every hash in this file);
    * target and raw (pool) bucket distributions get add-one smoothing;
    * a document's log importance weight is the bag-of-features
    * log-likelihood ratio
    *
    *   log w(d) = Σ_{g ∈ grams(d)} [ln p_target(b(g)) − ln p_raw(b(g))]
    *
    * with p(b) = (c_b + 1) / (N + buckets). High log_w = the document
    * looks like the target distribution relative to the pool — the
    * paper resamples with these as Gumbel-perturbed keys; this
    * operator returns the deterministic weights (callers rank or
    * threshold; [[hashSample]] composes for the stochastic step).
    * Output: (idCol, n_feats, log_w); empty documents vanish.
    *
    * 100-TB shape: the pool is tokenized ONCE (cached feature frame
    * shared by the raw-count build and the scoring join); the λ table
    * is EXACTLY `buckets` rows — broadcast by construction, which is
    * the whole point of hashing: scoring is one broadcast-joined
    * map-side pass + one per-doc aggregation, no vocabulary-sized
    * state anywhere. Counts are map-side-combined groupBys; no
    * windows, no self-joins. */
  /** The DSIR feature frame: one row per unigram AND bigram of the
    * normalized words, reduced to its md5 hash bucket (GramSep joins
    * bigram parts — collision-free, the separator cannot occur in a
    * normalized word). Shared by [[dsirWeights]] and the streaming
    * gate ([[graft.streaming.DocStreams]]); works unchanged on a
    * streaming `src` (pure per-row transform). */
  private[graft] def dsirFeatures(src: DataFrame, id: Option[String],
                                  textCol: String, buckets: Int,
                                  parallelism: Int): DataFrame = {
    val toks = LanguageModel.tokenizeNgrams(src, id, textCol, 2,
      parallelism)
    val idCols = id.map(col).toSeq
    val uni = toks.select((idCols :+ col("word").as("gram")): _*)
    val bi = toks.filter(col("prev1").isNotNull)
      .select((idCols :+ concat_ws(LanguageModel.GramSep,
        col("prev1"), col("word")).as("gram")): _*)
    uni.unionByName(bi).select((idCols :+
      pmod(conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long"),
        lit(buckets.toLong)).as("bucket")): _*)
  }

  /** The add-one-smoothed DSIR bucket log-likelihood ratio
    *   λ(b) = ln((ct_b + 1) / (Nt + B)) − ln((cr_b + 1) / (Nr + B))
    * as a Column over nullable count columns (null ⇒ 0 — an
    * unobserved bucket). The ONE definition both the batch operator
    * and [[graft.streaming.DocStreams.streamingDsirGate]] score with:
    * their doc-for-doc parity is pinned by StreamingSpec, so the
    * formula must not fork. */
  private[graft] def dsirLambdaCol(ct: Column, cr: Column, nt: Column,
                                   nr: Column, buckets: Int): Column =
    log(coalesce(ct, lit(0L)).cast("double") + 1.0) -
      log(nt.cast("double") + buckets.toDouble) -
      log(coalesce(cr, lit(0L)).cast("double") + 1.0) +
      log(nr.cast("double") + buckets.toDouble)

  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetDocs: DataFrame, buckets: Int = 8192,
                  parallelism: Int = 0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def featureFrame(src: DataFrame, id: Option[String]): DataFrame =
      dsirFeatures(src, id, textCol, buckets, parallelism)
    val feats = graft.CacheRegistry.register(
      featureFrame(docs, Some(idCol))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val rawCounts = feats.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val tCounts = featureFrame(targetDocs, None)
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val rawTot = rawCounts.agg(sum("cr").as("nr"))
    val tTot = tCounts.agg(sum("ct").as("nt"))
    // λ per bucket; left join suffices (every scored bucket is in the
    // raw counts by construction — the pool contains the docs)
    val lam = rawCounts.join(tCounts, Seq("bucket"), "left")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tTot))
      .select(col("bucket"), dsirLambdaCol(col("ct"), col("cr"),
        col("nt"), col("nr"), buckets).as("lam"))
    // explicit broadcast: λ is ≤ `buckets` rows BY CONSTRUCTION, but
    // Catalyst's size estimate for an aggregate over corpus scans is
    // corpus-sized — at 100 TB the auto-planner would sort-merge the
    // token-sized feats frame on 8k keys instead of map-side scoring
    feats.join(broadcast(lam), "bucket")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"), sum(col("lam")).as("log_w"))
  }

  /** DSIR's resampling step, derandomized: Gumbel-top-k sampling
    * WITHOUT replacement (the Xie et al. 2023 selection rule — taking
    * the k largest `w_i/T + Gumbel_i` draws exactly the softmax-
    * weighted sample) with the Gumbel noise derived from the row's
    * CONTENT HASH instead of `rand()`, like every sampler in this
    * file: g_i = −ln(−ln(u_i)) with u_i the md5 [0,1) bucket of
    * (id, salt), nudged by +0.5/2³² so u ∈ (0,1) strictly (the
    * all-zero hash would otherwise send g to −∞ and deterministically
    * exile that row). Same id + salt + weights ⇒ same sample,
    * forever — rerun-stable, engine-replayable, auditable.
    *
    * `sample_key` = round(w/T + g, 6): quantized to the 1e-6 grid
    * with the id as tiebreak, so the SELECTION BOUNDARY is
    * engine-exact (the [[temperatureFractions]] dyadic-grid argument
    * — a rank decided by the last ulp of ln would replay differently
    * across engines). Temperature T sharpens (T→0: plain top-k by
    * weight) or flattens (T→∞: uniform hash sample) the draw.
    *
    * 100-TB shape: one narrow projection + TakeOrderedAndProject —
    * per-partition k-heaps, only k rows ever reach the driver; no
    * global sort, no shuffle of the corpus. */
  def dsirResample(df: DataFrame, idCol: String, weightCol: String,
                   k: Int, salt: String = "graft",
                   temperature: Double = 1.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
      lit(salt))), 1, 8), 16, 10).cast("double") + 0.5) / 4294967296.0
    val gumbel = -log(-log(u))
    df.withColumn("sample_key",
        round(col(weightCol).cast("double") / temperature + gumbel, 6))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
  }
}
