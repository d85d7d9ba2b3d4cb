package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for document-scale pipelines.
  *
  * Scale design: every variant is a pure shuffle-on-key plan —
  * group-by content hash (exact), band-bucket join (MinHash LSH,
  * SimHash), or inverted-index join with document-frequency pruning
  * (n-gram Jaccard). Nothing collects to the driver; all candidate
  * generation is hash-partitioned so a 1000-executor cluster scales
  * each stage linearly, and high-frequency keys are dropped *before*
  * the self-join (the classic skew killer for LSH buckets).
  */
object Dedup {

  /** Drop over-sized (band, bucket) groups before any self-join: the
    * quadratic-skew guard shared by the LSH pair generators.
    * groupBy().count() + join rather than a windowed count — the
    * aggregate combines map-side and needs no per-key sort, where a
    * count-over-window sorts every (band, bucket) partition. */
  private def pruneBuckets(banded: org.apache.spark.sql.DataFrame,
                           maxBucket: Int): org.apache.spark.sql.DataFrame = {
    // repartition FIRST: the size-count branch, the prune join, and the
    // downstream self-join sides all hang off this one exchange
    // (ReuseExchange), so the signature computation runs ONCE — without
    // it the sketch expressions (the expensive part) evaluate once per
    // branch. The aggregate and joins after it are exchange-free: the
    // data is already hash-clustered on the key.
    val parted = banded.repartition(col("band"), col("bucket"))
    val small = parted.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBucket)
      .drop("__sz")
    parted.join(small, Seq("band", "bucket"))
  }

  /** Optional fan-out of a SMALL input before expensive per-row
    * signature work: a sub-megabyte parquet file arrives as ONE scan
    * partition, serializing all sketch computation onto a single task.
    * `parallelism = 0` (default) leaves the scan layout alone — the
    * right choice for large inputs, whose many splits already
    * parallelize the map side. Round-robin, so it only moves the raw
    * (id, text) rows, never computed signatures. */
  private def spread(df: DataFrame, parallelism: Int): DataFrame =
    if (parallelism > 0) df.repartition(parallelism) else df

  /** Exact-duplicate groups by content fingerprint: one row per
    * distinct normalized text with its cardinality and canonical
    * (minimum) id. Map-side combine via the single groupBy. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("cnt"), min("id").as("canonical_id"))

  /** Keep one representative row per normalized-text fingerprint (the
    * minimum id). No window (r10): keepers = min(id) per fingerprint —
    * map-side combined, so a megadup fingerprint collapses in the
    * combiner — then a left-semi join on (fingerprint, id). Both semi
    * keys together are unique per row, so even the megadup's members
    * hash-distribute across partitions; the row_number form shipped
    * each fingerprint's whole duplicate set into one sorted
    * partition. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // reserved temp names: an input that already carries them would make
    // the semi-join condition ambiguous (same guard family as asofJoin's
    // _asof_ prefix check)
    Seq("__kfp", "__kid").foreach { r =>
      require(!df.columns.contains(r),
        s"dropExactDuplicates: input must not contain reserved column '$r'")
    }
    val keep = df
      .select(fingerprint(col(textCol)).as("__kfp"), col(idCol).as("__kid"))
      .groupBy("__kfp").agg(min("__kid").as("__kid"))
    // <=> on the fingerprint: NULL-text rows form their own group (the
    // groupBy keeps a NULL-fp row) and must keep one representative —
    // an === here would NULL out for them and silently drop every
    // quarantine row, the defect class fixed in leakageSafeSplit
    df.join(keep, (fingerprint(col(textCol)) <=> col("__kfp")) &&
      col(idCol) === col("__kid"), "left_semi")
  }

  /** MinHash signature column over a MATERIALIZED words-array attribute
    * (see [[TextFunctions.normalizedWords]]): array of `numHashes`
    * minima over the word `n`-gram shingles; all per-row work stays in
    * projections (higher-order functions, no explode => no shuffle
    * until banding).
    *
    * Lane family: each lane applies a fixed rotate-XOR permutation to
    * the ONE xxhash64 per shingle — bitwise ops only (ANSI-safe, no
    * overflow) and ~numHashes x cheaper than salting the string per
    * lane. */
  def minhashSignature(wordsCol: Column, n: Int, numHashes: Int): Column =
    minhashFromHashes(
      transform(shinglesFromWords(wordsCol, n), s => xxhash64(s)), numHashes)

  private[graft] def minhashFromHashes(baseHashes: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(graft.functions.MinhashSig(
      ColumnShim.expression(baseHashes), numHashes))
  }

  /** Higher-order-function formulation of the signature; kept as the
    * independent semantics anchor for the bit-identity test against
    * the codegen'd [[graft.functions.MinhashSig]] kernel (same pattern
    * as VectorFunctions.dot / dotHof). */
  private[graft] def minhashFromHashesHof(baseHashes: Column,
                                          numHashes: Int): Column = {
    val (rots, masks) = graft.functions.MinhashSig.lanes(numHashes)
    array((0 until numHashes).map { k =>
      array_min(transform(baseHashes, h =>
        (shiftleft(h, rots(k)).bitwiseOR(shiftrightunsigned(h, 64 - rots(k))))
          .bitwiseXOR(lit(masks(k)))))
    }: _*)
  }

  /** HOF-anchored variant of [[minhashSignature]] (tests only). */
  private[graft] def minhashSignatureHof(wordsCol: Column, n: Int,
                                         numHashes: Int): Column =
    minhashFromHashesHof(
      transform(shinglesFromWords(wordsCol, n), s => xxhash64(s)), numHashes)

  /** Candidate near-duplicate pairs via banded MinHash LSH.
    *
    * Signature split into `bands` bands of `numHashes/bands` rows; docs
    * sharing any band bucket become candidates; candidates are then
    * verified with the estimated Jaccard (fraction of matching
    * signature slots) >= `threshold`.
    *
    * Plan shape: projection -> explode(bands) -> shuffle on (band,
    * bucket) -> within-bucket self-join -> distinct pair verify.
    * Buckets larger than `maxBucket` are dropped (boilerplate/empty
    * docs collapse into mega-buckets and would otherwise quadratically
    * skew a single reducer at 100 TB).
    */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                      threshold: Double = 0.7, maxBucket: Int = 1000,
                      parallelism: Int = 0): DataFrame =
    minhashCandidates(df, idCol, textCol, n, numHashes, bands, maxBucket,
      parallelism)
      // filter BEFORE distinct: est_jaccard is a pure function of the
      // signatures, so the threshold rejects the same rows either way —
      // but rejecting first shrinks the distinct's shuffle by the
      // reject fraction (large at high thresholds)
      .filter(col("est_jaccard") >= threshold)
      .distinct()

  /** The candidate stage of [[minhashDupPairs]] — every within-bucket
    * pair (one row per band collision, pre-verify, pre-distinct).
    * Exposed package-private so skew tests can measure the quadratic
    * volume the `maxBucket` guard admits: with each (band, bucket)
    * group capped at `maxBucket`, candidate rows are bounded by
    * bands * n * (maxBucket - 1) / 2. */
  private[graft] def minhashCandidates(df: DataFrame, idCol: String,
                                       textCol: String, n: Int,
                                       numHashes: Int, bands: Int,
                                       maxBucket: Int,
                                       parallelism: Int = 0): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val in = spread(df, parallelism)
    // two materialization boundaries: the words array FIRST (the
    // shingle lambda would otherwise re-run split+regex per element —
    // O(words^2) regex work on long docs), then the per-shingle base
    // hashes (every lane references the array, and re-inlining the
    // shingle+hash expression per lane is a numHashes-fold slowdown)
    val sig = in.select(col(idCol).as("id"),
      normalizedWords(col(textCol)).as("__w"))
      .select(col("id"),
        transform(shinglesFromWords(col("__w"), n), s => xxhash64(s)).as("__h"))
      .select(col("id"), minhashFromHashes(col("__h"), numHashes).as("sig"))

    val banded = sig.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))).as("bucket"))))
        .as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bucket"))

    val pruned = pruneBuckets(banded, maxBucket)

    val left = pruned.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val right = pruned.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) =>
          when(a === b, 1).otherwise(0)), v => v === 1)).cast("double") /
          size(col("sig_a"))).as("est_jaccard"))
  }

  /** Per-bit sign votes folded to the 64-bit fingerprint; expects an
    * already-materialized array of word hashes (see [[simhash64]]). */
  private[graft] def simhashFromHashes(hashes: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(graft.functions.SimhashFp(
      ColumnShim.expression(hashes)))
  }

  /** Higher-order-function formulation of the fingerprint; kept as the
    * independent semantics anchor for the bit-identity test against
    * the codegen'd [[graft.functions.SimhashFp]] kernel (64
    * interpreted aggregate passes — tests only). */
  private[graft] def simhashFromHashesHof(hashes: Column): Column =
    (0 until 64).map { b =>
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** 64-bit SimHash of the word stream: each word votes its hash bits
    * up/down; the sign pattern is the fingerprint. One projection per
    * row (aggregate over the words array — no shuffle). */
  def simhash64(textCol: Column): Column =
    simhashFromHashes(transform(split(normalizeText(textCol), " "), w => xxhash64(w)))

  /** SimHash near-duplicate candidate pairs: 4 bands of 16 bits — docs
    * sharing any 16-bit band are candidates; verified by full Hamming
    * distance <= `maxHamming` (bit_count of xor). */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3, maxBucket: Int = 1000,
                      parallelism: Int = 0): DataFrame =
    simhashCandidates(df, idCol, textCol, maxBucket, parallelism)
      // filter BEFORE distinct (same reasoning as minhashDupPairs):
      // hamming is a pure function of the fingerprints, so filtering
      // first shrinks the distinct's shuffle with identical output
      .filter(col("hamming") <= maxHamming)
      .distinct()

  /** Candidate stage of [[simhashDupPairs]] (one row per band
    * collision, pre-verify, pre-distinct); package-private for skew
    * tests. Bound with the guard: 4 * n * (maxBucket - 1) / 2. */
  private[graft] def simhashCandidates(df: DataFrame, idCol: String,
                                       textCol: String, maxBucket: Int,
                                       parallelism: Int = 0): DataFrame = {
    // word hashes materialized once; the 64 per-bit votes each reference
    // the array (same re-inlining hazard as the MinHash signature)
    val sh = spread(df, parallelism).select(col(idCol).as("id"),
      transform(split(normalizeText(col(textCol)), " "), w => xxhash64(w)).as("__h"))
      .select(col("id"), simhashFromHashes(col("__h")).as("fp"))
    hamming64Candidates(sh, maxBucket)
  }

  /** Near-duplicate pairs over an ARBITRARY 64-bit fingerprint column
    * (SimHash, image dHash, any perceptual hash): 4 bands of 16 bits —
    * rows sharing any band are candidates, verified by full Hamming
    * distance (bit_count of xor) <= `maxHamming`.
    *
    * Recall is pigeonhole-EXACT for `maxHamming <= 3`: a pair
    * differing in at most 3 bits cannot touch all 4 bands, so at
    * least one band collides and the pair is always generated (bands
    * a hot bucket prunes excepted). Same plan shape and skew guard
    * as [[simhashDupPairs]] — band-bucket shuffle, `maxBucket` drop
    * before the self-join, never all-pairs.
    *
    * `pairPredicate(idA, idB)` — when given — is applied INSIDE the
    * candidate join, before Hamming verification and the distinct
    * exchange, so structurally-excluded pairs (e.g. two frames of the
    * same video) never cost join output. */
  def hamming64DupPairs(df: DataFrame, idCol: String, fpCol: String,
                        maxHamming: Int = 3, maxBucket: Int = 1000,
                        pairPredicate: Option[(Column, Column) => Column] =
                          None): DataFrame =
    hamming64Candidates(
      df.select(col(idCol).as("id"), col(fpCol).as("fp")), maxBucket,
      pairPredicate)
      // filter BEFORE distinct (same reasoning as minhashDupPairs)
      .filter(col("hamming") <= maxHamming)
      .distinct()

  /** Shared banding/verify stage: expects (id, fp: Long); one output
    * row per band collision with the pair's full Hamming distance. */
  private[graft] def hamming64Candidates(fps: DataFrame,
                                         maxBucket: Int,
                                         pairPredicate: Option[
                                           (Column, Column) => Column] =
                                           None): DataFrame = {
    val banded = fps.select(col("id"), col("fp"),
      explode(array((0 until 4).map(b => struct(
        lit(b).as("band"),
        shiftright(col("fp"), b * 16).bitwiseAND(0xFFFF).as("bucket"))): _*))
        .as("bk"))
      .select(col("id"), col("fp"), col("bk.band"), col("bk.bucket"))
    val pruned = pruneBuckets(banded, maxBucket)
    val left = pruned.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("fp").as("fp_a"))
    val right = pruned.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("fp").as("fp_b"))
    val pairCond = pairPredicate.fold(col("id_a") < col("id_b"))(p =>
      col("id_a") < col("id_b") && p(col("id_a"), col("id_b")))
    left.join(right, Seq("band", "bucket"))
      .filter(pairCond)
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
  }

  /** Exact word n-gram Jaccard similarity for all pairs reaching
    * `threshold`, via an inverted shingle index.
    *
    * Shingles appearing in more than `maxDf` documents are dropped
    * before the self-join (stopword-like shingles would otherwise
    * create O(df^2) candidate pairs — the dominant skew risk at scale).
    * Exact for pairs whose overlap survives pruning; boilerplate-heavy
    * corpora should lower `maxDf`.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        maxDf: Int = 1000, parallelism: Int = 0): DataFrame =
    ngramCandidates(df, idCol, textCol, n, maxDf, parallelism)
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("common"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Candidate stage of [[ngramJaccardPairs]] — one row per shared
    * kept shingle per pair (the quadratic join output, pre-aggregation);
    * package-private for skew tests. With the `maxDf` cut every kept
    * shingle has df <= maxDf, so candidate rows are bounded by
    * keptPostings * (maxDf - 1) / 2. */
  private[graft] def ngramCandidates(df: DataFrame, idCol: String,
                                     textCol: String, n: Int, maxDf: Int,
                                     parallelism: Int = 0): DataFrame = {
    val sh = spread(df, parallelism).select(col(idCol).as("id"),
      normalizedWords(col(textCol)).as("__w")) // words materialized first
      .select(col("id"),
        array_distinct(shinglesFromWords(col("__w"), n)).as("sh"))
      .select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
    // repartition BEFORE the df-count branch: the count aggregate, the
    // prune join, and both self-join sides all reuse this one exchange
    // (ReuseExchange), so the shingle+normalize expression — the
    // dominant per-row cost — evaluates ONCE. Aggregate and joins above
    // it are exchange-free (data already hash-clustered on `s`).
    val parted = sh.repartition(col("s"))
    val pruned =
      if (maxDf == Int.MaxValue) parted // unbounded: skip the df count
      else {
        // df counts via groupBy + join (no per-key sort — a windowed
        // count would sort every shingle partition)
        val small = parted.groupBy("s").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDf).drop("__df")
        parted.join(small, "s")
      }
    val left = pruned.select(col("s"), col("id").as("id_a"), col("n_sh").as("n_a"))
    val right = pruned.select(col("s"), col("id").as("id_b"), col("n_sh").as("n_b"))
    left.join(right, "s")
      .filter(col("id_a") < col("id_b"))
  }

  /** Benchmark decontamination: training docs sharing >= `minShared`
    * distinct word n-grams with any benchmark item — the overlap check
    * run before training so eval sets are not memorized verbatim.
    * Returns (doc_id, bench_id, shared_ngrams, overlap_frac) where
    * overlap_frac = shared / |benchmark item's n-grams| (containment,
    * not jaccard: a benchmark question embedded in a long doc must
    * still flag).
    *
    * Scale shape: inverted-index join keyed on the shingle, identical
    * to [[ngramJaccardPairs]] but cross-corpus — the benchmark side is
    * tiny relative to training corpora, so its shingle index behaves
    * like a semi-broadcast filter; the training side never self-joins.
    * High-df shingles (boilerplate) are dropped from BOTH sides before
    * the join — the same skew guard, and contamination on boilerplate
    * alone is noise anyway. */
  def contamination(docs: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String,
                    benchIdCol: String, benchTextCol: String,
                    n: Int = 3, minShared: Int = 2,
                    maxDf: Int = 1000): DataFrame = {
    val d = shingleExploded(docs, idCol, textCol, "doc_id", n)
    val b = shingleExploded(bench, benchIdCol, benchTextCol, "bench_id", n)
    contaminationCore(d, b, minShared, maxDf)
  }

  /** One row per (owner id, distinct shingle): (out, n_out, s). */
  private def shingleExploded(df: DataFrame, id: String, text: String,
                              out: String, n: Int): DataFrame =
    df.select(col(id).as(out),
      normalizedWords(col(text)).as("__w"))
      .select(col(out),
        array_distinct(shinglesFromWords(col("__w"), n)).as("sh"))
      .select(col(out), size(col("sh")).as(s"n_$out"),
        explode(col("sh")).as("s"))

  /** Shared join-aggregate tail of [[contamination]] /
    * [[bloomContamination]]: df-prune the doc side, inner-join the
    * benchmark shingle index, count shared shingles per (doc, bench)
    * pair. The doc-side repartition is the single exchange all three
    * uses (df count, prune join, bench join) hang off. */
  private def contaminationCore(d: DataFrame, b: DataFrame,
                                minShared: Int, maxDf: Int): DataFrame = {
    val parted = d.repartition(col("s"))
    val keep = parted.groupBy("s").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).drop("__df")
    parted.join(keep, "s")
      .join(b.repartition(col("s")), "s")
      .groupBy("doc_id", "bench_id", "n_bench_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .select(col("doc_id"), col("bench_id"), col("shared_ngrams"),
        (col("shared_ngrams").cast("double") / col("n_bench_id"))
          .as("overlap_frac"))
  }

  /** [[contamination]] with a broadcast Bloom-filter pre-filter on the
    * training side — the 100-TB shape when the corpus dwarfs the
    * benchmark: build a Bloom filter over the benchmark's distinct
    * shingles (small by contract — eval sets are KBs-to-MBs), broadcast
    * it, and drop every training-doc shingle that cannot match BEFORE
    * the shuffle. The exchange then carries only probable hits (a few
    * per contaminated doc + fpp noise) instead of every shingle of
    * every training document — typically a 10^3-10^5x shuffle-volume
    * cut on clean corpora.
    *
    * Result is IDENTICAL to [[contamination]] (hash-equal), not
    * approximate: Bloom filters have no false negatives, false
    * positives are removed by the exact inner join against the real
    * benchmark index, and the df-prune is unaffected because a bloom
    * decision is per shingle VALUE — a surviving shingle keeps all its
    * rows, so its document frequency on the filtered stream equals its
    * true df. The probe is the codegen'd
    * [[graft.functions.BloomMightContain]] expression over the
    * broadcast filter (r12; it was a ScalaUDF through r11 — Spark's
    * own BloomFilterMightContain is not public API, so the engine
    * carries its own), keeping the map-side projection that touches
    * EVERY training shingle inside whole-stage codegen. */
  def bloomContamination(docs: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         benchIdCol: String, benchTextCol: String,
                         n: Int = 3, minShared: Int = 2,
                         maxDf: Int = 1000, fpp: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    val b = shingleExploded(bench, benchIdCol, benchTextCol, "bench_id", n)
    val distinctSh = b.select("s").distinct()
    val nItems = math.max(distinctSh.count(), 1L) // small-side job by contract
    val bloom = distinctSh.stat.bloomFilter("s", nItems, fpp)
    val bcBloom = spark.sparkContext.broadcast(bloom)
    val d = shingleExploded(docs, idCol, textCol, "doc_id", n)
      .filter(graft.functions.BloomMightContain.column(col("s"), bcBloom))
    contaminationCore(d, b, minShared, maxDf)
  }

  /** Near-duplicate clusters from a candidate-pair table (id_a, id_b):
    * connected components over the similarity graph, one row per
    * document appearing in some pair, with the cluster's canonical
    * (minimum) id. The standard step that turns pairwise near-dup hits
    * into "keep one per cluster" drop lists at corpus scale.
    *
    * Algorithm: alternating large-star / small-star connected
    * components (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", 2014) entirely in DataFrames — O(log n) rounds of two
    * shuffles each, versus GraphX Pregel's one full stage per graph
    * DIAMETER whose fixed per-superstep scheduling overhead dominated
    * small graphs (15-89 s swings on a 590-edge graph) while a deep
    * chain would need hundreds of supersteps at corpus scale. At the
    * fixpoint every non-root node carries one edge to its component
    * minimum. Ids of any orderable type work directly (integral ids
    * widen to long, anything else clusters on its string form — no
    * surrogate-id mapping needed, which the Pregel path required).
    * Lineage is truncated per round with an eager localCheckpoint (on a
    * multi-executor cluster prefer `sparkContext.setCheckpointDir` +
    * `checkpoint()` for fault tolerance; the iteration structure is
    * unchanged).
    *
    * Driver gate (same design as the solver's `localCellLimit`): a
    * near-dup pair graph is usually TINY relative to its corpus — the
    * iterative rounds' fixed scheduling cost dominates below a few
    * million edges even on a cluster. Under `localEdgeLimit` edges the
    * component labels come from a driver-side union-find (min-id root,
    * identical labels to the fixpoint) in one collect; above it the
    * O(log n) distributed loop runs unchanged. The gate is sized in
    * driver HEAP, not just edge count: integral ids collect at ~16
    * bytes/edge (4M edges ≈ 64 MB of longs), but string/uuid ids are
    * ~8x heavier with Row+String overhead, so the effective limit for
    * non-integral ids is `localEdgeLimit / 8` (default 500k edges ≈
    * same byte budget). Pass a larger `localEdgeLimit` to widen both. */
  def dupClusters(pairs: DataFrame, idColA: String = "id_a",
                  idColB: String = "id_b",
                  localEdgeLimit: Long = 4L * 1000 * 1000): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    import org.apache.spark.storage.StorageLevel
    // row ordering belongs to the caller's query, not the operator (an
    // operator-baked orderBy would force a pointless global sort when
    // composed), so no orderBy here
    val integral = Seq(idColA, idColB).forall(c =>
      pairs.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
    // a cast of arbitrary (uuid/decimal) ids to long would null or
    // collide silently, so non-integral ids cluster on their exact
    // string form; min() then picks the canonical id in the SAME
    // ordering either way
    val castT = if (integral) "long" else "string"
    // persist the (possibly expensive — shingle pairing) pair table so
    // the vertex set and the initial edge set each read it once
    val pa = pairs.select(col(idColA).cast(castT).as("a"),
      col(idColB).cast(castT).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = pa.select(col("a").as("id"))
      .union(pa.select(col("b").as("id"))).distinct()
      .localCheckpoint() // eager: pins vertices before pa unpersists
    var edges = pa.filter(col("a") =!= col("b")).distinct().localCheckpoint()
    pa.unpersist()

    // set equality proxy: row count + XOR of row hashes (order- and
    // layout-independent, overflow-free under ANSI; the sets are always
    // DISTINCT so XOR cancellation of repeated rows cannot occur)
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("a"), col("b")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // one signature job per round: the signature computed on ss at the
    // end of round r IS edges' signature in round r+1, so carry it
    // instead of recomputing (the recompute doubled the fixpoint cost)
    var curSig = signature(edges)

    // byte-aware gate: string ids cost ~8x a long per collected edge
    // (Row + String object overhead), so shrink the edge budget to keep
    // the DRIVER HEAP bound constant across id types
    val effectiveEdgeLimit = if (integral) localEdgeLimit else localEdgeLimit / 8
    if (curSig._1 > 0 && curSig._1 <= effectiveEdgeLimit) {
      // driver union-find (root = component min, so labels are
      // identical to the distributed fixpoint): one collect replaces
      // ~log(n) rounds of keyed shuffles whose fixed scheduling cost
      // dominates small pair graphs
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val lt: (Any, Any) => Boolean =
        if (integral) (a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long]
        else (a, b) => a.asInstanceOf[String] < b.asInstanceOf[String]
      val parent = new java.util.HashMap[Any, Any]()
      def find(x0: Any): Any = {
        var x = x0
        var p = parent.get(x)
        while (p != null && p != x) { x = p; p = parent.get(x) }
        var c = x0 // path compression
        while (c != x) { val n = parent.get(c); parent.put(c, x); c = n }
        x
      }
      val collected = edges.collect()
      collected.foreach { r =>
        val ra = find(r.get(0))
        val rb = find(r.get(1))
        if (ra != rb) {
          if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val labelRows = new java.util.ArrayList[Row](parent.size())
      val it = parent.keySet().iterator()
      while (it.hasNext) {
        val v = it.next()
        labelRows.add(Row(v, find(v)))
      }
      val dt = if (integral)
        org.apache.spark.sql.types.LongType else StringType
      val labels = pairs.sparkSession.createDataFrame(labelRows,
        StructType(Seq(StructField("id", dt), StructField("cluster_id", dt))))
      return verts.join(labels, Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    }

    var converged = curSig._1 == 0L
    var rounds = 0
    while (!converged && rounds < 50) {
      val prevSig = curSig
      // large-star: every node links its LARGER neighbors to the
      // minimum of its closed neighborhood — long chains contract
      // geometrically
      val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy("a").agg(min("b").as("mb"))
        .select(col("a"), least(col("a"), col("mb")).as("m"))
      val ls = sym.join(mins, "a").filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .distinct()
      // small-star: orient larger -> smaller, then link each node and
      // its smaller neighbors to their minimum — flattens local trees
      // into stars
      val oriented = ls.select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b"))
      val mins2 = oriented.groupBy("a").agg(min("b").as("m"))
      val ss = oriented.join(mins2, "a")
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .union(mins2.select(col("a"), col("m").as("b")))
        .distinct()
        .localCheckpoint()
      edges = ss
      curSig = signature(ss)
      converged = curSig == prevSig
      rounds += 1
    }
    // fixpoint edges are (member, componentMin); isolated vertices
    // (self-pairs only) label themselves
    val labels = edges.groupBy("a").agg(min("b").as("cluster_id"))
      .select(col("a").as("id"), col("cluster_id"))
    verts.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** Drop list from near-dup clusters: every non-canonical member. */
  def dupDropList(pairs: DataFrame): DataFrame =
    dupClusters(pairs).filter(col("id") =!= col("cluster_id")).select("id")

  /** Quality-aware canonical selection: keep the highest-`scoreCol`
    * member of each near-dup cluster (ties break to the smallest id) —
    * the "keep the best copy" policy training pipelines use instead of
    * [[dupDropList]]'s min-id policy. `clusters` is [[dupClusters]]
    * output; `scores` maps `idCol` -> `scoreCol` (e.g. a quality or
    * length score).
    *
    * r10 skew rewrite: keeper = `max(struct(score, -id))` — an
    * ASSOCIATIVE aggregate (the paragraphDedup pattern), so a
    * corpus-wide boilerplate MEGA-cluster collapses in the map-side
    * combiner and the exchange carries at most one row per (cluster,
    * map partition); the previous row_number window shipped each
    * cluster's whole membership into one sorted partition. The id
    * bitwise-NOT mixes the DESC score with the ASC tie-break inside one
    * lexicographic struct ordering; non-numeric ids (dupClusters
    * supports string/uuid keys) take the two-phase combiner form —
    * max score per cluster, then min id among the maxima — still
    * associative everywhere, one extra exchange, no window. */
  def keepBestPerCluster(clusters: DataFrame, scores: DataFrame,
                         idCol: String = "id",
                         clusterCol: String = "cluster_id",
                         scoreCol: String = "score"): DataFrame = {
    val joined = clusters.join(scores, Seq(idCol))
    clusters.schema(idCol).dataType match {
      // INTEGRAL ids only: the -id trick truncates fractional ids to a
      // fabricated value (Double 2.75 -> keep_id 2, matching no row),
      // so Double/Decimal ids route to the generic path below
      case it @ (org.apache.spark.sql.types.ByteType |
                 org.apache.spark.sql.types.ShortType |
                 org.apache.spark.sql.types.IntegerType |
                 org.apache.spark.sql.types.LongType) =>
        // bitwise NOT, not arithmetic negation: ~x = -x-1 is an
        // order-REVERSING bijection on the FULL Long range, so a
        // Long.MinValue id round-trips exactly (negation overflows it
        // to itself and fabricates a keep_id matching no row)
        joined
          .groupBy(clusterCol)
          .agg(max(struct(col(scoreCol).as("s"),
            bitwise_not(col(idCol).cast("long")).as("ni"))).as("k"))
          .select(col(clusterCol),
            bitwise_not(col("k.ni")).cast(it).as("keep_id"),
            col("k.s").as("keep_score"))
      case _ =>
        val best = joined.groupBy(clusterCol)
          .agg(max(col(scoreCol)).as("__bs"))
        joined.join(best, Seq(clusterCol))
          // <=>: a cluster whose scores are ALL NULL still keeps its
          // min-id representative (=== would filter every member)
          .filter(col(scoreCol) <=> col("__bs"))
          .groupBy(clusterCol)
          .agg(min(col(idCol)).as("keep_id"),
            max(col(scoreCol)).as("keep_score"))
          .select(col(clusterCol), col("keep_id"), col("keep_score"))
    }
  }

  /** Embedding near-duplicate pairs: cosine >= `threshold` among
    * candidates sharing a sign-bit LSH bucket in ANY of `bands`
    * independent bucket tables (`nBits` hyperplanes each, seeded
    * `seed + band`). Banding is the standard recall knob: a single
    * bucket table misses near-dups that straddle one bit boundary;
    * OR-ing `bands` tables recovers them at bands x one extra explode
    * row per vector — both sides still shuffle on (band, bucket) only,
    * never a full cross join. Over-sized buckets are dropped before the
    * self-join (the quadratic-skew guard). For exhaustive small-corpus
    * checks set `nBits = 0` (single bucket = brute force).
    */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, threshold: Double = 0.9,
                        nBits: Int = 8, bands: Int = 4, seed: Long = 42L,
                        maxBucket: Int = 10000, parallelism: Int = 0): DataFrame =
    embeddingCandidates(df, idCol, vecCol, dim, nBits, bands, seed,
      maxBucket, parallelism)
      .filter(col("cosine") >= threshold)
      .distinct()

  /** Candidate stage of [[embeddingDupPairs]] (one row per band
    * collision, pre-verify, pre-distinct); package-private for skew
    * tests. Bound with the guard: bands * n * (maxBucket - 1) / 2. */
  private[graft] def embeddingCandidates(df: DataFrame, idCol: String,
                                         vecCol: String, dim: Int,
                                         nBits: Int, bands: Int, seed: Long,
                                         maxBucket: Int,
                                         parallelism: Int = 0): DataFrame = {
    // pre-normalize once per vector so the pairwise kernel is a single
    // dot product instead of dot + two norms (3x fewer HOF evaluations
    // on the quadratic stage)
    val base = spread(df, parallelism).select(col(idCol).as("id"),
      VectorFunctions.normalize(col(vecCol)).as("v"),
      col(vecCol).as("__raw"))
    val banded =
      if (nBits == 0)
        base.select(col("id"), col("v"), lit(0).as("band"), lit(0L).as("bucket"))
      else
        // ONE kernel pass computes every band's bucket (array<long>
        // indexed by band), posexplode recovers the (band, bucket)
        // rows — replaces `bands * nBits` separate literal-array dot
        // expressions inside a struct-array generate (32 s of task CPU
        // at sf0.1, profiled r16; bit-identical, see HyperplaneBuckets)
        base.select(col("id"), col("v"),
          posexplode(VectorFunctions.hyperplaneBuckets(
            col("__raw"), dim, nBits, bands, seed)).as(Seq("band", "bucket")))
    val pruned = if (nBits == 0) banded else pruneBuckets(banded, maxBucket)
    val left = pruned.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("v").as("v_a"))
    val right = pruned.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("v").as("v_b"))
    left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.dot(col("v_a"), col("v_b")).as("cosine"))
  }

  /** Cross-document paragraph-level deduplication (the paragraph
    * granularity of Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better": boilerplate paragraphs — headers, license
    * blocks, navigation chrome — recur across MANY documents that are
    * not near-duplicates as wholes, so document-level dedup misses
    * them entirely).
    *
    * Input: (id, paragraphs: array<string>) — the caller owns the
    * paragraph decomposition (natural `split(text, "\n\n")`, or a
    * fixed-width span chunking for delimiter-free text). Semantics:
    * for each distinct normalized-paragraph fingerprint, the GLOBAL
    * first occurrence (minimum (id, position)) is the keeper; every
    * other occurrence is dropped. Output, one row per input document
    * that has AT LEAST ONE paragraph (empty/NULL paragraph arrays
    * carry nothing to dedup and are excluded, matching the r9 window
    * formulation and the committed oracle): paragraph count, kept
    * count, and the cleaned document rebuilt from surviving paragraphs
    * in original order.
    *
    * 100-TB shape (r10 combiner rewrite): posexplode (linear in
    * paragraphs) -> keeper per fingerprint = `min(struct(id, pos,
    * para))`, an ASSOCIATIVE aggregate that collapses the hot
    * fingerprint in the map-side combiner — the exchange carries at
    * most one row per (fp, map partition) and NO reducer ever holds a
    * posting list, so a corpus-wide boilerplate paragraph cannot
    * create a fat partition (the r9 window form shipped each
    * fingerprint's whole occurrence list into one sorted partition;
    * ~9x slower under 10% planted boilerplate, see SKEW.md). The kept
    * text rides inside the min struct, so keepers reassemble into
    * documents without ever joining back to the occurrence stream;
    * the per-doc totals join is on the UNIQUE id key — skew-free by
    * construction. Cost: the input is scanned twice (once for
    * occurrences, once for totals) — two narrow scans for skew
    * immunity is the right trade at 100 TB, where one straggler
    * partition stalls the stage. */
  def paragraphDedup(df: DataFrame, idCol: String,
                     parasCol: String): DataFrame = {
    val occ = df
      .select(col(idCol).as("id"), posexplode(col(parasCol)).as(Seq("pos", "para")))
      .select(col("id"), col("pos"), col("para"),
        fingerprint(col("para")).as("fp"))
    // keeper per paragraph = MIN (id, pos) occurrence — an ASSOCIATIVE
    // aggregate, so the hot fingerprint (corpus-wide boilerplate)
    // collapses in the map-side combiner: the exchange carries at most
    // one row per (fp, map partition), and NO reducer ever holds a
    // whole occurrence list (r10 skew certification; the previous
    // window formulation shipped the full posting list into one sorted
    // partition). The kept paragraph's text rides in the min struct,
    // so nothing ever joins back to the occurrence stream.
    val keepers = occ.groupBy("fp")
      .agg(min(struct(col("id"), col("pos"), col("para"))).as("k"))
    val kept = keepers.groupBy(col("k.id").as("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(
          collect_list(struct(col("k.pos").as("pos"),
            col("k.para").as("para")))),
          s => s.getField("para")), " ").as("clean_text"))
    // per-doc totals: a narrow projection (ids are unique), joined on
    // the unique id key — skew-free by construction
    df.select(col(idCol).as("id"),
      size(col(parasCol)).cast("long").as("n_paras"))
      // > 0 keeps the windowed-form contract: a doc with an empty or
      // NULL paragraph array has no occurrence rows, so the window
      // form omits it — the join-back must too, or the differential
      // anchor and the oracle diverge on the first blank doc
      .where(col("n_paras") > 0)
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** The round-9 window formulation of [[paragraphDedup]] — kept as the
    * differential-test anchor for the combiner rewrite (identical
    * output; the window ships each fingerprint's WHOLE occurrence list
    * into one sorted partition, which is the skew shape the rewrite
    * removes). Test scope only. */
  private[graft] def paragraphDedupWindowed(df: DataFrame, idCol: String,
                                            parasCol: String): DataFrame = {
    val occ = df
      .select(col(idCol).as("id"), posexplode(col(parasCol)).as(Seq("pos", "para")))
      .select(col("id"), col("pos"), col("para"),
        fingerprint(col("para")).as("fp"))
    val w = Window.partitionBy("fp").orderBy(col("id"), col("pos"))
    val flagged = occ
      .withColumn("keep", row_number().over(w) === 1)
    flagged.groupBy("id")
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(array_sort(
          collect_list(when(col("keep"), struct(col("pos"), col("para"))))),
          s => s.getField("para")), " ").as("clean_text"))
      .select(col("id"), col("n_paras"), col("n_kept"), col("clean_text"))
  }

  /** Semantic benchmark decontamination: flag training documents whose
    * EMBEDDING is near a benchmark item's — the representation-space
    * complement of the n-gram contamination check (paraphrased or
    * translated eval leakage shares no 3-gram but sits next to the
    * benchmark in embedding space; n-gram decontamination alone misses
    * it, which is why eval suites now run both).
    *
    * 100-TB shape: identical to the ANN scans — the benchmark side is
    * driver-sized by contract, L2-normalized and broadcast; ONE narrow
    * pass over the training corpus computes primitive-array dots and
    * emits only pairs over the threshold. The corpus never shuffles,
    * and output volume is bounded by actual contamination. Arithmetic
    * matches `list_dot_product / (sqrt*sqrt)` for the SQL oracle.
    *
    * The bench-side driver collect is ENFORCED, not assumed (r9
    * VERDICT): at most `maxBenchRows` rows are ever fetched (the limit
    * is pushed into the plan, so an oversized bench set cannot OOM the
    * driver before the check fires) and exceeding the bound fails
    * loudly — same gate discipline as the ANN query broadcasts. */
  def semanticContamination(train: DataFrame, bench: DataFrame,
                            idCol: String, vecCol: String,
                            threshold: Double,
                            maxBenchRows: Int = 200000): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val qArr = bench
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .limit(maxBenchRows + 1)
      .as[(Long, Array[Double])].collect()
    require(qArr.length <= maxBenchRows,
      s"semanticContamination: benchmark side exceeds maxBenchRows=" +
        s"$maxBenchRows — the bench set must be driver/broadcast-sized " +
        s"by contract; raise maxBenchRows deliberately or pre-filter")
    val qSorted = qArr.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(qSorted)
    train
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bc.value
        def nrm(v: Array[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < v.length) { s += v(i) * v(i); i += 1 }
          math.sqrt(s)
        }
        val qn = qs.map(q => nrm(q._2))
        it.flatMap { case (tid, tv) =>
          val tn = nrm(tv)
          qs.indices.iterator.flatMap { qi =>
            val (bid, bv) = qs(qi)
            var d = 0.0; var j = 0
            while (j < bv.length) { d += bv(j) * tv(j); j += 1 }
            val c = if (qn(qi) == 0.0 || tn == 0.0) 0.0 else d / (qn(qi) * tn)
            if (c >= threshold) Some((tid, bid, c)) else None
          }
        }
      }
      .toDF("train_id", "bench_id", "cosine")
  }

  /** Incremental exact dedup: flag an INCOMING BATCH against an
    * existing corpus — the production ingestion shape (a crawl
    * snapshot lands daily; re-deduplicating the whole corpus per batch
    * is a non-starter at 100 TB). Output, one row per batch document:
    *  - `status = "dup_of_corpus"`, canonical = the corpus's canonical
    *    (minimum) id for that content — corpus matches take priority;
    *  - `status = "dup_in_batch"`, canonical = the batch's first
    *    (minimum) id for content new to the corpus but repeated within
    *    the batch;
    *  - `status = "new"`, canonical = own id.
    *
    * 100-TB shape: the batch's distinct fingerprints BROADCAST as a
    * semi-join filter over the corpus, so the corpus-side shuffle
    * carries only fingerprints the batch actually touches (bounded by
    * batch size, not corpus size) — the corpus is scanned, never
    * reshuffled wholesale. In a deployment the corpus keeper table
    * (fp -> canonical id) is maintained incrementally across batches
    * (exactly [[exactGroups]] output unioned per batch); this operator
    * accepts the raw corpus and derives it for self-containedness. */
  def incrementalDupFlags(corpus: DataFrame, batch: DataFrame,
                          idCol: String, textCol: String): DataFrame = {
    val bfp = batch.select(col(idCol).as("id"),
      fingerprint(col(textCol)).as("fp"))
    val batchFps = bfp.select("fp").distinct()
    val corpusKeepers = corpus
      .select(col(idCol).as("__cid"), fingerprint(col(textCol)).as("fp"))
      .join(broadcast(batchFps), Seq("fp"), "left_semi")
      .groupBy("fp").agg(min("__cid").as("corpus_canonical"))
    val w = Window.partitionBy("fp") // whole-partition frame: one min
    bfp.withColumn("__batch_first", min(col("id")).over(w))
      .join(corpusKeepers, Seq("fp"), "left")
      .select(col("id"),
        when(col("corpus_canonical").isNotNull, "dup_of_corpus")
          .when(col("__batch_first") =!= col("id"), "dup_in_batch")
          .otherwise("new").as("status"),
        coalesce(col("corpus_canonical"),
          when(col("__batch_first") =!= col("id"), col("__batch_first"))
            .otherwise(col("id"))).as("canonical_id"))
  }

  /** Engine-portable MinHash signature: lane k is the min over the
    * document's shingles of the 60-bit value `md5("k:" ++ shingle)[0,15)`
    * — one independent md5 oracle per lane. Strictly slower than the
    * xxhash64 [[graft.functions.MinhashSig]] kernel (one md5 per lane
    * per shingle), but exactly replayable by any engine with md5,
    * which is what gives the incremental near-dup flags a FULL DuckDB
    * oracle over signatures, bands, and flags. Values are positive
    * (< 2^60), so signed/unsigned mins agree across engines. */
  private[graft] def portableMinhashSig(shingles: Column,
                                        numHashes: Int): Column =
    array((0 until numHashes).map { k =>
      array_min(transform(shingles, s =>
        conv(substring(md5(concat(lit(s"$k:"), s)), 1, 15), 16, 10)
          .cast("long")))
    }: _*)

  /** The maintained LSH signature/bucket KEEPER TABLE for incremental
    * near-dup (r9 VERDICT #1): one row per (doc, band) with the full
    * signature and the band's bucket key. A production pipeline
    * persists this table once for the corpus and appends each
    * accepted batch's index (`index.union(minhashSignatureIndex(
    * newDocs, ...))`) — the corpus text is never re-shingled. Bucket
    * keys are md5-derived like the lanes, so the whole index is
    * engine-portable. */
  def minhashSignatureIndex(df: DataFrame, idCol: String, textCol: String,
                            n: Int = 3, numHashes: Int = 16,
                            bands: Int = 8, parallelism: Int = 0): DataFrame = {
    val rpb = numHashes / bands
    require(bands * rpb == numHashes, "bands must divide numHashes")
    val sig = spread(df, parallelism).select(col(idCol).as("id"),
      shinglesFromWords(normalizedWords(col(textCol)), n).as("__sh"))
      .select(col("id"), portableMinhashSig(col("__sh"), numHashes).as("sig"))
    sig.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          conv(substring(md5(concat_ws(",",
            transform(slice(col("sig"), b * rpb + 1, lit(rpb)),
              x => x.cast("string")))), 1, 15), 16, 10)
            .cast("long").as("bucket")))).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bucket"))
  }

  /** Incremental NEAR-dup: flag an incoming batch against an existing
    * corpus SIGNATURE INDEX ([[minhashSignatureIndex]] output) without
    * re-bucketing the corpus — [[incrementalDupFlags]]' production
    * asymmetry extended from exact hashes to MinHash-LSH. Output, one
    * row per batch doc: `status` in {near_dup_of_corpus (priority),
    * near_dup_in_batch, new}, `canonical_id` (minimum matching corpus
    * id; else the minimum EARLIER matching batch id — single-pass
    * keep-first, the streaming-dedup convention, deliberately not
    * transitive closure; else own id), and the best matching
    * `est_jaccard` (0.0 for new docs).
    *
    * 100-TB shape: the batch's distinct (band, bucket) keys BROADCAST
    * as a semi-join filter over the index, so the corpus-side shuffle
    * carries only buckets the batch actually touches — cost tracks the
    * BATCH, not the corpus. Hot buckets (corpus-wide boilerplate) are
    * dropped by the same `maxBucket` guard as every LSH operator here,
    * on both the corpus and in-batch candidate stages. Band-collision
    * duplicates need no distinct: the per-doc min/max aggregate
    * absorbs them. */
  def incrementalMinhashFlags(corpusIndex: DataFrame, batch: DataFrame,
                              idCol: String, textCol: String,
                              n: Int = 3, numHashes: Int = 16,
                              bands: Int = 8, threshold: Double = 0.5,
                              maxBucket: Int = 1000,
                              parallelism: Int = 0): DataFrame = {
    def est(a: Column, b: Column): Column =
      size(filter(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        v => v === 1)).cast("double") / size(a)
    // the batch index feeds four plan branches (bucket set, corpus
    // candidates, in-batch candidates x2) — cache it, release via the
    // registry contract; the batch is bounded by the ingestion unit
    val bIdx = graft.CacheRegistry.register(
      minhashSignatureIndex(batch, idCol, textCol, n, numHashes, bands,
        parallelism)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val batchBuckets = bIdx.select("band", "bucket").distinct()
    val corpusHit = pruneBuckets(
      corpusIndex.join(broadcast(batchBuckets), Seq("band", "bucket"),
        "left_semi"), maxBucket)
    val corpusMatch = bIdx
      .join(corpusHit.select(col("band"), col("bucket"),
        col("id").as("cid"), col("sig").as("csig")), Seq("band", "bucket"))
      .filter(col("cid") =!= col("id"))
      .select(col("id"), col("cid"), est(col("sig"), col("csig")).as("e"))
      .filter(col("e") >= threshold)
      .groupBy("id")
      .agg(min("cid").as("corpus_canonical"), max("e").as("corpus_best"))
    val bPruned = pruneBuckets(bIdx, maxBucket)
    val batchMatch = bPruned
      .join(bPruned.select(col("band"), col("bucket"),
        col("id").as("id_b"), col("sig").as("sig_b")), Seq("band", "bucket"))
      .filter(col("id") < col("id_b"))
      .select(col("id_b").as("bid"), col("id"),
        est(col("sig"), col("sig_b")).as("e"))
      .filter(col("e") >= threshold)
      .groupBy(col("bid"))
      .agg(min("id").as("batch_first"), max("e").as("batch_best"))
      .withColumnRenamed("bid", "id")
    bIdx.select("id").distinct()
      .join(corpusMatch, Seq("id"), "left")
      .join(batchMatch, Seq("id"), "left")
      .select(col("id"),
        when(col("corpus_canonical").isNotNull, "near_dup_of_corpus")
          .when(col("batch_first").isNotNull, "near_dup_in_batch")
          .otherwise("new").as("status"),
        coalesce(col("corpus_canonical"), col("batch_first"), col("id"))
          .as("canonical_id"),
        round(coalesce(
          when(col("corpus_canonical").isNotNull, col("corpus_best")),
          col("batch_best"), lit(0.0)), 6).as("est_jaccard"))
  }

  /** Per-document n-gram NOVELTY: the fraction of a document's distinct
    * word n-grams whose corpus-wide first occurrence (minimum id) is
    * this document — "how much new content does this doc contribute",
    * the inverse view of the duplication signals ([[ngramJaccardPairs]]
    * flags how much is shared; this credits who said it first). Docs
    * are ordered by id, so "first" is deterministic corpus order.
    * Low-novelty docs are quote-heavy/boilerplate/aggregator content —
    * a standard curation down-weight signal.
    *
    * 100-TB shape (r10 skew rewrite): the first owner per shingle is
    * `min(id)` — ASSOCIATIVE, so the shingle-keyed exchange map-side
    * combines and a corpus-wide boilerplate shingle collapses to one
    * row per map partition; no reducer ever holds a posting list (the
    * previous window formulation shipped each shingle's WHOLE posting
    * list into one sorted partition). Per-doc novel counts then come
    * from grouping the OWNER table by doc — the posting stream is
    * never joined back at all. Price: the corpus is scanned twice
    * (owner pass + per-doc totals projection), both narrow and fully
    * parallel — linear work instead of a straggler partition. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 5, parallelism: Int = 0): DataFrame = {
    require(n >= 1, "ngramNovelty: n must be >= 1")
    val base = spread(df, parallelism)
      .select(col(idCol).as("id"),
        array_distinct(shinglesFromWords(
          normalizedWords(col(textCol)), n)).as("sh"))
    val owners = base
      .select(col("id"), explode(col("sh")).as("s"))
      .groupBy("s").agg(min("id").as("first"))
    val novel = owners.groupBy(col("first").as("id"))
      .agg(count(lit(1)).as("n_novel"))
    base.select(col("id"), size(col("sh")).as("n_shingles"))
      .join(novel, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_shingles"), 6).as("novelty_ratio"))
  }

  /** The round-9 window formulation of [[ngramNovelty]] — differential
    * -test anchor for the combiner rewrite (identical output, fat
    * posting-list window partitions). Test scope only. */
  private[graft] def ngramNoveltyWindowed(df: DataFrame, idCol: String,
                                          textCol: String,
                                          n: Int = 5): DataFrame = {
    val sh = df
      .select(col(idCol).as("id"),
        normalizedWords(col(textCol)).as("__w"))
      .select(col("id"),
        array_distinct(shinglesFromWords(col("__w"), n)).as("sh"))
      .select(col("id"), size(col("sh")).as("n_shingles"),
        explode(col("sh")).as("s"))
    val firstDoc = min(col("id")).over(Window.partitionBy("s"))
    sh.withColumn("__first", firstDoc)
      .groupBy("id")
      .agg(max(col("n_shingles")).as("n_shingles"),
        sum(when(col("__first") === col("id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 6)
          .as("novelty_ratio"))
  }

  /** URL-level deduplication flags (the first dedup pass of a web-crawl
    * pipeline — refetches of one page arrive under case variants,
    * default ports, tracking params, fragments, and trailing slashes,
    * and are duplicates BY IDENTITY before any content comparison).
    * One row per input row: canonical host, canonical URL
    * ([[graft.functions.UrlFunctions.canonicalizeUrl]]), the id of the
    * canonical (first-seen = minimum id) fetch of that URL, and a dup
    * flag. Unparseable URLs get NULL canonical and `is_dup = false` —
    * quarantine material, never silently grouped.
    *
    * 100-TB shape: one groupBy on the canonical URL (map-side combined
    * min) + one join back on the same key — both linear, both
    * hash-partitioned on a key with bounded group sizes (refetch
    * multiplicity), so no skew guard is needed. */
  def urlDedupFlags(df: DataFrame, idCol: String,
                    urlCol: String): DataFrame = {
    import graft.functions.UrlFunctions
    val canon = df.select(col(idCol).as("id"),
      UrlFunctions.urlHost(col(urlCol)).as("host"),
      UrlFunctions.canonicalizeUrl(col(urlCol)).as("canon_url"))
    val firsts = canon.filter(col("canon_url").isNotNull)
      .groupBy("canon_url").agg(min("id").as("first_id"))
    canon.join(firsts, Seq("canon_url"), "left")
      .select(col("id"), col("host"), col("canon_url"), col("first_id"),
        coalesce(col("id") =!= col("first_id"), lit(false)).as("is_dup"))
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): k-means partition the embedding
    * space, then EXACT cosine verification within each cluster only —
    * the quadratic stage shrinks from n^2 to sum over clusters of
    * |cluster|^2, and unlike sign-bit LSH the partition follows the
    * data's own density, so semantically-close pairs co-locate even
    * when they straddle random hyperplanes.
    *
    * Scale shape: centroids train driver-locally on a bounded
    * hash-ordered sample and broadcast (`Similarity.trainQuantizer` —
    * the IVF quantizer); assignment is a narrow map; the only shuffle
    * is the self-join keyed on cluster id. Over-sized clusters are
    * dropped before the join by the shared quadratic-skew guard
    * (`maxCluster`), bounding candidate volume at
    * n * (maxCluster - 1) / 2. At 100 TB, nClusters scales with corpus
    * size (SemDeDup uses ~110k clusters for LAION) so |cluster| stays
    * bounded; the plan is O(1) in nClusters either way.
    *
    * `nClusters = 1` degenerates to exact all-pairs cosine — the
    * differential-test oracle. Emits (id_a, id_b, cluster, cosine),
    * one row per pair (a pair lives in exactly one cluster, so no
    * distinct is needed). */
  def semanticDupPairs(df: DataFrame, idCol: String, vecCol: String,
                       nClusters: Int, threshold: Double = 0.9,
                       maxIter: Int = 10, maxCluster: Int = 100000,
                       parallelism: Int = 0): DataFrame =
    semanticCandidates(df, idCol, vecCol, nClusters, maxIter, maxCluster,
      parallelism)
      .filter(col("cosine") >= threshold)

  /** Candidate stage of [[semanticDupPairs]] (every same-cluster pair
    * with its cosine, pre-threshold); package-private for the skew
    * bound tests. Guard bound: a row meets at most `maxCluster - 1`
    * partners in its (surviving) cluster, so candidate volume is at
    * most n * (maxCluster - 1) / 2 regardless of how adversarially the
    * corpus collapses into one cell. */
  private[graft] def semanticCandidates(df: DataFrame, idCol: String,
                                        vecCol: String, nClusters: Int,
                                        maxIter: Int = 10,
                                        maxCluster: Int = 100000,
                                        parallelism: Int = 0): DataFrame = {
    val base = spread(df, parallelism)
    val centers = Similarity.trainQuantizer(base, idCol, vecCol,
      nClusters, maxIter)
    val assigned = Similarity.assignNormalized(base, idCol, vecCol, centers)
      .select(col("id"), col("v"), lit(0).as("band"),
        col("cluster").cast("long").as("bucket"))
    val pruned = pruneBuckets(assigned, maxCluster)
    val left = pruned.select(col("bucket"),
      col("id").as("id_a"), col("v").as("v_a"))
    val right = pruned.select(col("bucket"),
      col("id").as("id_b"), col("v").as("v_b"))
    left.join(right, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        col("bucket").cast("int").as("cluster"),
        VectorFunctions.dot(col("v_a"), col("v_b")).as("cosine"))
  }
}
