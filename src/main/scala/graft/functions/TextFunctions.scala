package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: normalization, token statistics, quality signals,
  * heuristic language ID, and document fingerprints.
  *
  * Everything here is built from Spark SQL built-ins (codegen'd,
  * whole-stage-compatible — no UDFs), so filters and projections built
  * on these columns still push down / fuse. Every function is
  * deterministic, which is what makes the DuckDB oracle checks in
  * `graft.SparkEntry` possible.
  */
object TextFunctions {

  /** Lowercase, fold all non-alphanumerics to spaces, collapse runs of
    * whitespace, trim. The canonical form used by dedup + fingerprints. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9]", " "), " +", " "))

  /** Whitespace-delimited word count (0 for blank/empty). */
  def wordCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  /** Count of non-overlapping occurrences of a literal `term`.
    * Pure length arithmetic => identical in any SQL engine.
    * Literal `replace` (UTF8String.replace), not a quoted
    * regexp_replace: both delete the same leftmost non-overlapping
    * literal matches, so the count is bit-identical, but the regex
    * form paid Pattern compile + Matcher allocation per row per term —
    * langScores evaluates 40 of these per document, and the swap cuts
    * the langId projection several-fold (r16 optimization round). */
  def occurrences(c: Column, term: String): Column =
    ((length(c) - length(replace(c, lit(term), lit("")))) /
      lit(term.length)).cast("int")

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^.!?,;:]", "")).cast("double") / length(c))

  /** Fraction of characters that are uppercase letters. */
  def upperRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^A-Z]", "")).cast("double") / length(c))

  /** Fraction of characters that are digits. */
  def digitRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^0-9]", "")).cast("double") / length(c))

  /** English stopword list used by [[stopwordRatio]] and the quality
    * score (a small, fixed set so the oracle SQL can replicate it). */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "that", "for", "on", "with", "as")

  /** Fraction of words that are English stopwords: normalized-word
    * membership count over the raw word count. One split + one array
    * filter — the padded-substring form this replaces embedded the
    * whole normalize chain once PER stopword (15 regex scans per doc
    * and an expression tree Catalyst re-optimized on every action),
    * and undercounted runs of consecutive identical stopwords
    * ("the the" counted once). Here every stopword word position
    * counts, which is the C4/Gopher definition. */
  def stopwordRatio(c: Column): Column = {
    val hits = size(filter(normalizedWords(c),
      w => w.isInCollection(EnglishStopwords)))
    when(wordCount(c) === 0, lit(0.0))
      .otherwise(hits.cast("double") / wordCount(c))
  }

  /** Mean word length over the normalized text. */
  def meanWordLength(c: Column): Column = {
    val norm = normalizeText(c)
    val wc = wordCount(norm)
    when(wc === 0, lit(0.0))
      .otherwise((length(norm) - (wc - 1)).cast("double") / wc)
  }

  /** Heuristic quality score in [0,1]: combines word count (saturating
    * at 50), mean word length window [3,10], and stopword presence —
    * the length/punct/stopword recipe of C4-style quality filters. */
  def qualityScore(c: Column): Column = {
    val wc = wordCount(c)
    val lenScore = least(wc.cast("double") / 50.0, lit(1.0))
    val mwl = meanWordLength(c)
    val wordLenScore =
      when(mwl >= 3.0 && mwl <= 10.0, 1.0).otherwise(0.0)
    val swScore = least(stopwordRatio(c) * 4.0, lit(1.0))
    round(lenScore * 0.4 + wordLenScore * 0.3 + swScore * 0.3, 6)
  }

  /** Whitespace token count (= wordCount; named for pipeline parity). */
  def wsTokenCount(c: Column): Column = wordCount(c)

  /** BPE-ish token count: alphabetic runs, single digits, and isolated
    * symbols each count as one token — a cheap, deterministic proxy for
    * subword tokenizers. */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Stable document fingerprint: md5 of the normalized text. Identical
    * normalization + md5 on any engine => join-able across systems. */
  def fingerprint(c: Column): Column = md5(normalizeText(c).cast("binary"))

  /** Distinct-word / total-word ratio on the normalized text — the
    * cheap repetition signal (boilerplate, keyword stuffing and
    * degenerate generations score low; Gopher-style filters threshold
    * it). 0.0 for empty docs. */
  def uniqueWordRatio(c: Column): Column = {
    val norm = normalizeText(c)
    val words = split(norm, " ")
    // guard on the NORMALIZED text: punctuation-only docs normalize to
    // "" where split yields [""] and the ratio would read 1.0
    when(length(norm) === 0, lit(0.0))
      .otherwise(size(array_distinct(words)).cast("double") / size(words))
  }

  // ---- PII redaction ----
  // Patterns restricted to the Java-regex ∩ RE2 common subset (char
  // classes, bounded quantifiers, \b — no backrefs or lookaround), so
  // Spark (java.util.regex) and the DuckDB oracle (RE2) match and
  // replace IDENTICALLY. Redaction order is fixed (email → IPv4 → SSN
  // → phone) — the later patterns cannot match inside earlier
  // placeholders, so the chain is confluent and oracle-stable.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhonePattern = "\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}"

  /** Redact common PII shapes with typed placeholders — the standard
    * scrubbing pass before training-data release. Pure regexp_replace
    * chain: codegen'd, pushdown-safe, no UDF. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        SsnPattern, "<SSN>"),
      PhonePattern, "<PHONE>")

  /** Non-overlapping match count for one PII pattern (audit metric). */
  def piiCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern))

  /** Word n-gram shingles from a words-array column (array of strings).
    * Documents with at most n words yield a single whole-text shingle.
    *
    * Built from `zip_with` over n-1 shifted copies of the array, so the
    * words expression appears only as HOF *arguments* (evaluated once
    * per row) — never inside a lambda body. That structure matters: a
    * lambda that captures the words tree re-evaluates it PER ELEMENT
    * (O(words^2) regex work — hundreds of seconds for one long doc),
    * and no projection boundary can protect it because filter pushdown
    * (e.g. the `size(...) > 0` inferred from a later explode) re-inlines
    * aliases into predicates wholesale. */
  def shinglesFromWords(words: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    // native one-pass window (the CharTrigrams pattern): the previous
    // chain of n-1 zip_with calls was a per-row interpreter pass (HOFs
    // evaluate outside whole-stage codegen) taxing every shingle
    // consumer — MinHash, SimHash, Jaccard, contamination, leakage
    // splits. Same output exactly: <= n words fold to one shingle,
    // otherwise windows of n joined by ' ' (nulls skipped, the
    // concat_ws contract).
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(WordShinglesExpr(ColumnShim.expression(words), n))
  }

  /** Normalized word array — the canonical shingling input. */
  def normalizedWords(c: Column): Column = split(normalizeText(c), " ")

  /** Consecutive `spanWords`-word windows of the normalized text —
    * the span decomposition behind [[dedupSpans]]. The tail span may
    * be shorter; empty/blank text yields an empty array (guarded:
    * Spark's `sequence(0, -1)` would DESCEND, not return empty). */
  def spanArray(c: Column, spanWords: Int): Column = {
    require(spanWords >= 1, s"spanWords must be >= 1, got $spanWords")
    val words = normalizedWords(c)
    val nSpans = ceil(size(words).cast("double") / spanWords).cast("int")
    when(length(normalizeText(c)) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nSpans - 1),
        i => array_join(slice(words, i * spanWords + 1, lit(spanWords)), " ")))
  }

  /** Intra-document span dedup (the RefinedWeb/Gopher-style "remove
    * repeated lines/paragraphs within a document" cleanup, adapted to
    * delimiter-free text): drop exact repeats of `spanWords`-word
    * windows, keeping the FIRST occurrence in document order
    * (`array_distinct` preserves first-seen order). For text with
    * natural paragraph boundaries, split on the delimiter upstream
    * and feed each paragraph as a span instead. Pure codegen'd
    * built-ins — per-row work, no shuffle, pushes down like any
    * projection. */
  def dedupSpans(c: Column, spanWords: Int): Column =
    array_join(array_distinct(spanArray(c, spanWords)), " ")

  /** DEFLATE-compressed byte count ([[DeflateSize]], codegen'd). */
  def deflateSize(c: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(DeflateSize(
      org.apache.spark.sql.graft.ColumnShim.expression(c)))

  /** Compression-ratio quality signal: DEFLATE size over raw UTF-8
    * size (the Gopher/RefinedWeb repetitiveness proxy — template and
    * keyword-stuffed text compresses far below natural prose). 0.0 for
    * empty docs by convention. */
  def compressionRatio(c: Column): Column =
    when(octet_length(c) === 0, lit(0.0))
      .otherwise(deflateSize(c).cast("double") / octet_length(c))

  /** Overlapping sliding-window chunks of the normalized words — the
    * RAG-ingestion decomposition (fixed chunk size with overlap so no
    * sentence-boundary fact is stranded at a cut). Chunk i covers
    * words [i*stride, i*stride + chunkSize) with
    * stride = chunkSize - overlap; the tail chunk may be short; a
    * chunk is emitted only while it contributes at least one new word
    * (n_chunks = 1 + ceil(max(n - chunkSize, 0) / stride)); empty
    * docs yield an empty array. Pure codegen'd built-ins — per-row
    * work, no shuffle, replayable in any SQL engine. */
  def chunkWords(c: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    val ws = normalizedWords(c)
    val n = when(length(normalizeText(c)) === 0, lit(0)).otherwise(size(ws))
    val nChunks = when(n === 0, lit(0)).otherwise(
      lit(1) + ((greatest(n - chunkSize, lit(0)) + (stride - 1)) / stride)
        .cast("int"))
    when(n === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(ws, i * stride + 1, lit(chunkSize)), " ")))
  }

  /** Stopword marker lists for the language-ID heuristic. Tiny
    * per-language function-word sets — the classic n-gram/stopword
    * profile trick at its smallest. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "no", "una", "por", "que"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4", "wo3", "you3", "ta1"))

  /** Per-language marker-hit score (ties broken by list order via a
    * tiny index epsilon, so argmax is total and deterministic). */
  def langScores(c: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), normalizeText(c), lit(" "))
    LangMarkers.map { case (lang, words) =>
      lang -> words.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
    }
  }

  /** Heuristic language ID: argmax of marker-word hits; "und"
    * (undetermined) when no marker matches. */
  def langId(c: Column): Column = {
    val scores = langScores(c)
    // max score, then first language reaching it (deterministic order)
    val mx = greatest(scores.map(_._2): _*)
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === mx && mx > 0, lit(lang)).otherwise(acc)
    }
    pick
  }
}
