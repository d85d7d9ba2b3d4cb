package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Model-based language identification: a char-trigram multinomial
  * Naive Bayes classifier, trained DECLARATIVELY (one map-side-combined
  * groupBy over an exploded character-trigram pass — the same
  * one-scan/one-shuffle discipline as the LM gates) and scored with a
  * broadcast model join + one per-doc aggregation.
  *
  * This is the default language-ID path; the tiny marker-word
  * heuristic ([[TextFunctions.langId]]) stays as the test anchor the
  * model must beat on the fixture's ground truth (LangIdSpec +
  * q_lang_confusion vs q_lang_confusion_nb).
  *
  * EXACTNESS: log-probabilities are quantized to integers
  * (round(ln(p)·1e6) as BIGINT) at model-build time, so per-document
  * scores are BIGINT SUMS — associative, order-independent, and
  * bit-identical across engines. A float score would depend on
  * summation order (Spark partials vs the oracle's single pass) and
  * could flip an argmax on a near-tie; the only cross-engine risk left
  * is ln() differing in the last ulp exactly at a .5·1e-6 rounding
  * boundary, negligible over a vocabulary of thousands.
  *
  * Model, with Laplace smoothing (alpha = 1):
  *   lp(g|l)  = ln(c_lg + 1) − ln(N_l + V)   for grams seen anywhere,
  *   floor(l) = ln(1) − ln(N_l + V)          for grams unseen in l,
  *   prior(l) = ln(n_docs_l / n_docs),
  * where N_l = Σ_g c_lg and V = |distinct grams|. Docs with no
  * trigram (empty text) score prior-only.
  *
  * 100-TB shape: training is ONE shuffle (groupBy(lang, gram) with
  * map-side combine; the exchange is model-sized, not corpus-sized).
  * The per-language totals, vocabulary size and priors are an
  * L+1-row driver collect (L = #languages — label-set-sized by
  * definition). Scoring broadcasts the (V × L) model and aggregates
  * per doc with partial aggregation, so the only corpus-sized exchange
  * is doc-count rows wide.
  */
object LangId {

  /** Quantization scale for integer log-probs. */
  val Q = 1e6

  /** Sub-MB parquet arrives as ONE scan partition, serializing the
    * normalize + trigram transform onto a single task (the documented
    * text-operator trap: 10-16 s single-core at sf0.1 vs sub-second
    * over 32) — every trigram consumer spreads its input first. */
  private def spread(df: DataFrame, parallelism: Int): DataFrame =
    if (parallelism > 0) df.repartition(parallelism) else df

  /** Character trigrams of the space-padded normalized text: positions
    * 1..len−2 of `' ' + normalizeText(c) + ' '`. Empty/short texts
    * yield an empty array. Pure projection — no shuffle.
    *
    * The window is the native [[graft.functions.CharTrigrams]]
    * expression: the declarative `transform(sequence, substr)` form it
    * replaced was O(len²) per doc and interpreter-bound (higher-order
    * functions evaluate outside whole-stage codegen), which made the
    * trigram pass dominate the whole NB path at sf0.1 (~10s of a ~12s
    * query at 4 cores). Same strings, same order, same empty-array
    * contract — every oracle hash unchanged. */
  def charTrigrams(c: Column): Column =
    graft.functions.CharGrams.charTrigrams(
      concat(lit(" "), TextFunctions.normalizeText(c), lit(" ")))

  /** A trained model: per-language stats + the quantized per-gram
    * log-prob frame (gram, lpq_<lang> ...), ready to broadcast. */
  case class NbModel(langs: Seq[String],
                     priorQ: Map[String, Long],
                     floorQ: Map[String, Long],
                     model: DataFrame)

  /** Train the NB model from labeled docs. `langs` is discovered from
    * the data (sorted — the sort IS the deterministic argmax
    * tie-break order downstream). */
  def trainNb(labeled: DataFrame, textCol: String,
              langCol: String, parallelism: Int = 0): NbModel = {
    val counts = graft.CacheRegistry.register(
      spread(labeled, parallelism).select(col(langCol).as("lang"),
        explode(charTrigrams(col(textCol))).as("gram"))
        .groupBy("lang", "gram").agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // label-set-sized driver collects (L rows, 1 row, L rows)
    val nL = counts.groupBy("lang").agg(sum("c").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v = counts.select("gram").distinct().count()
    val docCounts = labeled.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a training language whose docs yield ZERO trigrams cannot be
    // scored (no counts, no floor mass) — Spark would drop it while
    // the SQL replay keeps it prior-only, a silent divergence; fail
    // loud instead (same contract as personalized PageRank's seed set)
    val missing = docCounts.keySet -- nL.keySet
    require(missing.isEmpty,
      s"training language(s) with no trigrams: ${missing.toSeq.sorted.mkString(", ")}")
    val langs = nL.keys.toSeq.sorted
    val nDocs = docCounts.values.sum.toDouble
    // HALF_UP (away from zero), matching Spark's and DuckDB's round():
    // these are negative values, where math.round (toward +inf) differs
    def q(x: Double): Long = BigDecimal(x * Q)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    val priorQ = langs.map(l =>
      l -> q(math.log(docCounts(l) / nDocs))).toMap
    val floorQ = langs.map(l =>
      l -> q(-math.log(nL(l) + v.toDouble))).toMap
    // pivot to one row per gram with a quantized lp per language;
    // unseen-in-l grams fall back to the floor at SCORING time
    val model = counts
      .groupBy("gram").pivot("lang", langs).agg(first("c"))
      .select(col("gram") +: langs.map { l =>
        round((log(col(s"`$l`") + 1.0) - log(lit(nL(l) + v.toDouble))) * Q)
          .cast("long").as(s"lpq_$l")
      }: _*)
    NbModel(langs, priorQ, floorQ, model)
  }

  /** One-call train-and-classify over a single labeled corpus (the
    * fixture shape: ground-truth `lang` trains, every doc is scored).
    * Production splits the two: train on the labeled reference, score
    * the crawl with [[classify]]. */
  def langIdNb(labeled: DataFrame, idCol: String, textCol: String,
               langCol: String, parallelism: Int = 0): DataFrame = {
    val m = trainNb(labeled, textCol, langCol, parallelism)
    classify(labeled, m, idCol, textCol, parallelism)
  }

  /** Classify `docs` with a trained model: (idCol, lang_pred). Ties
    * (and trigram-less docs, which score prior-only) break to the
    * alphabetically smallest language — total and deterministic. */
  def classify(docs: DataFrame, m: NbModel, idCol: String,
               textCol: String, parallelism: Int = 0): DataFrame = {
    // ONE projection pass scores every language (r16 optimization
    // round): the quantized model is ALPHABET-BOUNDED (normalizeText
    // emits [a-z0-9 ], so <= 37^3 distinct trigrams at any corpus
    // scale) — collect it once, broadcast, and fold each document's
    // gram array through [[graft.functions.NbGramScores]]. The sums
    // are exact LONG additions of exactly the values the former
    // explode -> broadcast-join -> groupBy plan summed (per-language
    // floors substituted at map build, whole-miss grams score the
    // floor vector, trigram-less docs fold to zero), and integer
    // addition is order-free — value-identical by construction, with
    // no exploded gram row, join probe, or partial-agg row per
    // trigram (18.7 s of task CPU at sf0.1, profiled). The streaming
    // gate keeps the model DATAFRAME join (stream-static shape).
    val spark = docs.sparkSession
    val L = m.langs.length
    val floorArr = m.langs.map(m.floorQ).toArray
    val rows = m.model.collect()
    val map = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, Array[Long]](rows.length * 2)
    rows.foreach { r =>
      val v = new Array[Long](L)
      var l = 0
      while (l < L) {
        v(l) = if (r.isNullAt(l + 1)) floorArr(l) else r.getLong(l + 1)
        l += 1
      }
      map.put(org.apache.spark.unsafe.types.UTF8String
        .fromString(r.getString(0)), v)
    }
    val bc = spark.sparkContext.broadcast(map)
    val withSums = spread(docs, parallelism).select(col(idCol),
      graft.functions.NbGramScores.column(
        charTrigrams(col(textCol)), bc, floorArr).as("__s"))
    val totals = m.langs.zipWithIndex.map { case (l, i) =>
      (element_at(col("__s"), i + 1) + lit(m.priorQ(l))).as(s"t_$l") }
    val t = withSums.select(col(idCol) +: totals: _*)
    val mx = greatest(m.langs.map(l => col(s"t_$l")): _*)
    // first language (in sorted order) reaching the max — fold from the
    // back so earlier langs overwrite later ones
    val pick = m.langs.reverse.foldLeft(lit("und")) { case (acc, l) =>
      when(col(s"t_$l") === mx, lit(l)).otherwise(acc)
    }
    t.select(col(idCol), pick.as("lang_pred"))
  }
}
