package graft.operators

import graft.functions.{ByteBpe, TextFunctions, UnigramLm}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE TOKENIZER TRAINING (r12 verdict ask #1): learn the
  * merge table from the corpus the engine will later pack — promoted
  * from test-side driver code (the old Gpt2VocabGen collected every
  * document to the driver) to a first-class operator a real pipeline
  * can run on the corpus it trains on.
  *
  * Algorithm (the published BPE training loop — Sennrich et al. 2016,
  * and the byte-level discipline of the GPT-2 encoder,
  * github.com/openai/gpt-2):
  *
  *  1. PRETOKEN COUNTS — one distributed pass: explode each document
  *     into byte→unicode-MAPPED GPT-2 pretokens (the codegen'd
  *     [[graft.functions.Gpt2Pretokens]] expression), `groupBy(pt)`
  *     count. The state from here on is the DISTINCT-pretoken table
  *     (Zipf-bounded: vocabulary-sized, not corpus-sized).
  *  2. Per merge step: count every ADJACENT SYMBOL PAIR weighted by
  *     pretoken count (one aggregate over the distinct-pretoken
  *     table), take the argmax — highest count, ties broken by the
  *     lexicographically SMALLEST (left, right) in the mapped-symbol
  *     alphabet — with a `limit(1)` collect (TakeOrdered, one row to
  *     the driver), then apply the winning merge to every pretoken's
  *     symbol sequence and iterate.
  *
  * Driver state is the merge list only — p-sized, never data-sized
  * (the SLOPE fit-loop discipline). Each iteration is one shuffle of
  * pair counts over the distinct-pretoken table plus a one-row
  * collect; the corpus itself is touched exactly once, in step 1.
  * The per-iteration frame is `localCheckpoint`ed so 384 iterations
  * do not accumulate 384 plans of lineage.
  *
  * MERGE APPLICATION stays declarative (whole-stage codegen, no UDF):
  * a symbol sequence is rendered as TAB-wrapped symbols
  * (`\t s1 \t\t s2 \t…` — the mapped alphabet is ≥ U+0021, so no
  * symbol can contain a tab) and the merge applied with the built-in
  * `replace`, whose left-to-right non-overlapping scan IS the BPE
  * pass semantics: wrapping each symbol in its own tab pair means a
  * match can only start and end on true symbol boundaries (a mapped
  * pattern can never match mid-symbol, and adjacent matches share no
  * characters, so `[a,a,a,a]` merging (a,a) yields `[aa,aa]`, not the
  * shared-delimiter bug `[aa,a,a]`), and `replace` resumes scanning
  * AFTER the replacement, exactly the `j += 2` of the array pass.
  *
  * Byte-for-byte equivalent to the driver-side reference trainer
  * ([[graft.functions.Subword.trainMerges]]) on any corpus: identical
  * pair counting (all adjacent pairs, overlapping occurrences
  * included), identical argmax tie-break (Spark's UTF8String binary
  * order, DuckDB's binary VARCHAR order, and Scala's UTF-16 order all
  * agree on the mapped alphabet — every symbol char is a BMP code
  * point, where UTF-8 byte order = code-point order = UTF-16 order),
  * identical left-to-right merge application, identical stop
  * condition. Asserted by TokenizerSpec's differential and by
  * Gpt2VocabGen, which now calls this operator and reproduces the
  * committed fixture byte-for-byte.
  *
  * 100-TB shape: the corpus-sized work is ONE scan + ONE groupBy; the
  * training loop runs over the distinct-pretoken table (memory-bounded
  * by the vocabulary, cluster-sharded), each step one map-side-combined
  * aggregate whose result is further reduced to a single driver row by
  * TakeOrdered. Nothing document-sized ever reaches the driver.
  */
object Tokenizer {

  /** Train `nMerges` byte-level BPE merges on `textCol` of `docs`.
    * Returns the RAW merge sequence in training order, in the mapped
    * symbol alphabet (the exact lines of a GPT-2 `merges.txt`). The
    * sequence can contain a repeated pair only via duplicate-producer
    * re-formation (two merges yielding the same string) — callers
    * writing a merges file apply `.distinct`, mirroring the reference
    * trainer. Stops early when no adjacent pair remains.
    *
    * `minCount` prunes pretokens rarer than the threshold AFTER the
    * count pass — the standard vocabulary-scale state control for a
    * 100-TB corpus, where long-tail pretokens (typos, hashes,
    * unsegmented runs) dominate the DISTINCT table while contributing
    * counts far below any merge argmax. The default 1 keeps every
    * pretoken (exact reference-trainer equivalence); production runs
    * at corpus scale set it to a small constant and shrink the
    * training state by orders of magnitude with no effect on the top
    * merges (a pair made only of sub-threshold pretokens can never
    * beat one backed by the Zipf head). */
  def trainBpe(docs: DataFrame, textCol: String,
               nMerges: Int, minCount: Long = 1L): IndexedSeq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    // 1. the ONE corpus-sized pass: distinct mapped pretokens + counts,
    //    symbols initialized to single mapped chars (each one byte)
    var words = docs
      .select(explode(ByteBpe.gpt2Pretokens(col(textCol))).as("pt"))
      .groupBy("pt").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(
        expr("transform(sequence(1, length(pt)), i -> substring(pt, i, 1))")
          .as("syms"),
        col("cnt"))
      .localCheckpoint()

    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      // 2a. pair counts: every adjacent pair (overlapping included,
      //     the trainMerges contract), weighted by pretoken count
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(syms) - 2)," +
            " i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"),
          col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        // 2b. argmax, ONE row to the driver: highest count, then
        //     lexicographically smallest pair (binary order — equals
        //     the reference trainer's and the oracle's tie-break)
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        merges += ((a, b))
        // 2c. apply the merge declaratively: tab-wrapped rendering +
        //     literal replace (left-to-right non-overlapping = the BPE
        //     pass), split back to symbols; lineage truncated per step
        val rend = concat(lit("\t"), array_join(col("syms"), "\t\t"),
          lit("\t"))
        val rep = org.apache.spark.sql.functions.replace(rend,
          lit("\t" + a + "\t\t" + b + "\t"), lit("\t" + a + b + "\t"))
        words = words
          .withColumn("__r", rep)
          // strip the single wrapping tab at each end, split on the
          // double-tab separators (substring is code-point-exact and
          // every mapped symbol char is one code point)
          .select(
            split(expr("substring(__r, 2, length(__r) - 2)"), "\t\t")
              .as("syms"),
            col("cnt"))
          .localCheckpoint()
        m += 1
      }
    }
    merges.result()
  }

  /** Distributed WORDPIECE training (the BERT discipline): like
    * [[trainBpe]] but merges maximize the LIKELIHOOD score
    * `count(ab) / (count(a) · count(b))` — the pair whose merge most
    * increases corpus likelihood under a unigram piece model — instead
    * of raw pair frequency, and symbols carry the `##` continuation
    * prefix (a word's first character is unprefixed, the rest are
    * `##`-prefixed; merging `(a, ##b)` yields `a + b`, preserving
    * `a`'s prefix status). Published algorithm: Schuster & Nakajima
    * 2012, as implemented by the BERT/HF wordpiece trainers.
    *
    * Words come from the engine's shared normalization
    * ([[TextFunctions.normalizedWords]] — the [a-z0-9] alphabet every
    * text operator and the SQL oracle share), so the state here is the
    * DISTINCT-word table: vocabulary-sized, Zipf-bounded, never
    * corpus-sized. Per merge step: one pair-count aggregate, one
    * symbol-count aggregate (both map-side-combined over the distinct
    * table; the symbol table is vocab-sized so the score join
    * BROADCASTS it twice), a one-row TakeOrdered argmax to the driver,
    * then the same tab-wrapped declarative merge application as
    * [[trainBpe]] (`##` is outside the word alphabet but tab-free, so
    * the rendering stays unambiguous).
    *
    * DETERMINISM: the score is an IEEE double `c / (sa · sb)` computed
    * identically by Spark and the DuckDB oracle replay (exact integer
    * counts cast to double, one multiply, one divide — no
    * order-dependent summation), ties broken by the lexicographically
    * smallest (left, right); two rationals that round to the same
    * double fall through to the same tie-break in both engines.
    *
    * Returns merge pairs in training order; the right side of every
    * pair is `##`-prefixed by construction. The resulting vocab is
    * alphabet ∪ merge results (see `graft.WordPieceVocabGen`). Stops
    * early when no adjacent pair remains. */
  def trainWordPiece(docs: DataFrame, textCol: String, nMerges: Int,
                     minCount: Long = 1L): IndexedSeq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    // the ONE corpus-sized pass: distinct normalized words + counts,
    // symbols = first char bare, the rest ##-prefixed
    var words = docs
      .select(explode(TextFunctions.normalizedWords(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(
        expr("transform(sequence(1, length(w)), i -> CASE WHEN i = 1" +
          " THEN substring(w, 1, 1)" +
          " ELSE concat('##', substring(w, i, 1)) END)").as("syms"),
        col("cnt"))
      .localCheckpoint()

    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      // symbol counts over ALL words (denominators), pair counts over
      // words with >= 2 symbols; both one aggregate over the distinct
      // table. The symbol frame is vocab-sized — broadcast both joins.
      val symc = words
        .select(explode(col("syms")).as("s"), col("cnt"))
        .groupBy("s").agg(sum("cnt").as("sc"))
      val pairs = words
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(syms) - 2)," +
            " i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"),
          col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
      val top = pairs
        .join(broadcast(symc.select(col("s").as("a"), col("sc").as("sa"))), "a")
        .join(broadcast(symc.select(col("s").as("b"), col("sc").as("sb"))), "b")
        .orderBy(
          (col("c").cast("double") /
            (col("sa").cast("double") * col("sb").cast("double"))).desc,
          col("a").asc, col("b").asc)
        .limit(1)
        .select("a", "b")
        .collect()
      if (top.isEmpty) done = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        // the right side of an adjacent pair is always a continuation
        // (it sits at word position >= 1) — merge strips its prefix
        require(b.startsWith("##"),
          s"wordpiece invariant violated: right symbol '$b' not ##-prefixed")
        val merged = a + b.substring(2)
        merges += ((a, b))
        val rend = concat(lit("\t"), array_join(col("syms"), "\t\t"),
          lit("\t"))
        val rep = org.apache.spark.sql.functions.replace(rend,
          lit("\t" + a + "\t\t" + b + "\t"), lit("\t" + merged + "\t"))
        words = words
          .withColumn("__r", rep)
          .select(
            split(expr("substring(__r, 2, length(__r) - 2)"), "\t\t")
              .as("syms"),
            col("cnt"))
          .localCheckpoint()
        m += 1
      }
    }
    merges.result()
  }

  /** Quantize a (negative) log value to the engine's integer scale —
    * HALF_UP (away from zero), the LangId convention matching Spark's
    * and DuckDB's round(). */
  private def quantizeCost(x: Double): Long =
    BigDecimal(x * 1e6)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  /** Distributed UNIGRAM-LM training (the SentencePiece discipline,
    * Kudo 2018, hard-EM form): seed a candidate vocabulary with the
    * most frequent substrings, then alternate Viterbi segmentation of
    * the corpus under the current piece costs (E) with cost
    * re-estimation from piece usage (M). Returns (piece, quantized
    * cost) pairs sorted by piece — the [[graft.functions.UnigramLm]]
    * model file format.
    *
    * Algorithm per round, all over the DISTINCT-word table
    * (vocabulary-sized, the trainBpe/trainWordPiece state discipline):
    *
    *  - SEED: every substring of length 1..maxPieceLen of every
    *    distinct word, weighted by word count — one explode + one
    *    map-side-combined groupBy. All single characters are kept
    *    (they are the coverage floor: with them every word segments);
    *    multi-char candidates keep the top (vocabSize − alphabet) by
    *    (frequency desc, piece asc) — a deterministic vocab-sized
    *    TakeOrdered. Initial cost(p) = round(−ln(freq_p / Σfreq)·1e6).
    *  - E: Viterbi-segment each distinct word under the broadcast
    *    model ([[UnigramLm.segmentPieces]] — exact integer costs,
    *    fewest-tokens tie-break), explode the pieces, groupBy sum of
    *    word counts → usage. The segmentation closure runs over the
    *    distinct-word table only, never the corpus.
    *  - M: multi-char pieces with zero usage drop out (the pruning
    *    step); single characters always survive (usage floor 1) so
    *    coverage never regresses; cost = round(−ln(usage/Σusage)·1e6).
    *
    * Deterministic end to end: exact integer counts, one double ln per
    * piece quantized HALF_UP, deterministic tie-breaks — the committed
    * model regenerates byte-identically (`UnigramVocabGen`), and
    * TokenizerSpec re-derives it with an independent driver
    * implementation. 100-TB shape: the corpus is touched ONCE (the
    * distinct-word pass); each EM round is one vocab-bounded
    * segmentation pass + one aggregate; driver state is the model
    * (vocab-sized). */
  def trainUnigram(docs: DataFrame, textCol: String, vocabSize: Int = 300,
                   maxPieceLen: Int = 6, emRounds: Int = 2,
                   minCount: Long = 1L): Seq[(String, Long)] = {
    require(vocabSize >= 2, s"vocabSize must be >= 2, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(emRounds >= 1, s"emRounds must be >= 1, got $emRounds")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TextFunctions.normalizedWords(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // SEED frequencies: every substring occurrence, weighted
      val subs = words
        .select(explode(expr(
          s"""flatten(transform(sequence(1, length(w)),
              i -> transform(sequence(i, least(length(w), i + ${maxPieceLen - 1})),
                j -> substring(w, i, j - i + 1))))""")).as("p"),
          col("cnt"))
        .groupBy("p").agg(sum("cnt").as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val singles = subs.filter(length(col("p")) === 1)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      require(singles.nonEmpty, "empty corpus: no seed alphabet")
      val nMulti = math.max(0, vocabSize - singles.length)
      val multis = subs.filter(length(col("p")) > 1)
        .orderBy(col("c").desc, col("p").asc)
        .limit(nMulti)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      subs.unpersist()
      var freqs: Map[String, Long] = (singles ++ multis).toMap
      var model: Map[String, Long] = {
        val tot = freqs.values.map(_.toDouble).sum
        freqs.map { case (p, c) => p -> quantizeCost(-math.log(c / tot)) }
      }
      val ml = maxPieceLen
      var r = 0
      while (r < emRounds) {
        val bc = spark.sparkContext.broadcast(model)
        val segUdf = udf((w: String) =>
          UnigramLm.segmentPieces(w, bc.value, ml))
        // E: usage counts under the current model (distinct-word table
        // only — the closure never touches the corpus)
        val usage = words
          .select(explode(segUdf(col("w"))).as("p"), col("cnt"))
          .groupBy("p").agg(sum("cnt").as("c"))
          .collect().map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
        bc.destroy()
        // M: prune unused multi-char pieces; singles keep a floor of 1
        val kept = model.keysIterator.flatMap { p =>
          val u = usage.getOrElse(p, 0L)
          if (u > 0L) Some(p -> u)
          else if (p.length == 1) Some(p -> 1L)
          else None
        }.toMap
        val tot = kept.values.map(_.toDouble).sum
        model = kept.map { case (p, u) =>
          p -> quantizeCost(-math.log(u / tot)) }
        freqs = kept
        r += 1
      }
      model.toSeq.sortBy(_._1)
    } finally words.unpersist()
  }
}
