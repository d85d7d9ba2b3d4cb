package graft.streaming

import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `documents` shape
  * (doc_id, text, ...) — the streaming side of the batch dedup family
  * (`graft.operators.Dedup`).
  */
object DocStreams {

  case class DupMapOut(doc_id: Long, canonical_id: Long, is_duplicate: Boolean)

  /** Streaming exact-dedup MAP: for every arriving document emit
    * (doc_id, canonical_id, is_duplicate), where the canonical is the
    * first-seen id for that content fingerprint (min id within the
    * first micro-batch it appears in, so a single-batch run reproduces
    * the batch `Dedup.exactGroups` canonical exactly).
    *
    * Spark's built-in streaming `dropDuplicates` can only FILTER;
    * pipelines that tombstone or re-link duplicates need the map, which
    * requires custom state: one long per distinct fingerprint — the
    * minimum possible exact-dedup state. Keyed by the fingerprint, so
    * the state store shards evenly at any scale. A production stream
    * over an unbounded corpus would bound state with a TTL
    * (`GroupStateTimeout.EventTimeTimeout` + document timestamps, the
    * `dropDuplicatesWithinWatermark` contract); the documents fixture
    * carries no event time, so the default here is exact and unbounded.
    *
    * `stateTtlMs` bounds state for unbounded corpora: a fingerprint
    * idle longer than the TTL is evicted (processing-time timeout), so
    * a duplicate arriving after the window re-canonicalizes — the
    * standard bounded-state dedup contract. None = exact, unbounded.
    * TTL mode REQUIRES a processing-time trigger interval on the
    * query: Spark's ProcessingTimeTimeout reports
    * `shouldRunAnotherBatch = true` unconditionally, so the default
    * ASAP trigger busy-loops no-data micro-batches; an interval
    * trigger turns that into one eviction sweep per interval.
    *
    * `initialKeepers` SEEDS the state with an existing corpus keeper
    * table ((fp, canonical_id) — exactly `Dedup.exactGroups` output):
    * the streaming face of `Dedup.incrementalDupFlags`' production
    * asymmetry. A stream started against a 100-TB corpus's keeper
    * table tombstones corpus duplicates from the FIRST micro-batch,
    * without replaying the corpus through the stream; Spark
    * distributes the initial state through the state store exactly
    * like live state (one long per fingerprint). */
  def streamingDupMap(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text",
                      stateTtlMs: Option[Long] = None,
                      initialKeepers: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    keyedDupMap(docs.select(col(idCol).cast("long").as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp"))
      .as[(Long, String)], stateTtlMs, initialKeepers)
  }

  /** Streaming URL-identity dedup map: [[streamingDupMap]] keyed by the
    * CANONICAL URL ([[graft.functions.UrlFunctions.canonicalizeUrl]])
    * instead of the content fingerprint — the streaming face of
    * `Dedup.urlDedupFlags`, for crawl frontiers where refetches must be
    * tombstoned as they arrive. Unparseable URLs (NULL canonical) are
    * never grouped: they pass through as their own canonical with
    * `is_duplicate = false`, the same quarantine contract as the batch
    * operator. State = one long per distinct canonical URL. */
  def streamingUrlDupMap(docs: DataFrame, idCol: String = "doc_id",
                         urlCol: String = "url",
                         stateTtlMs: Option[Long] = None,
                         initialKeepers: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs.select(col(idCol).cast("long").as("id"),
      graft.functions.UrlFunctions.canonicalizeUrl(col(urlCol)).as("fp"))
    val quarantine = typed.filter(col("fp").isNull)
      .select(col("id").as("doc_id"), col("id").as("canonical_id"),
        lit(false).as("is_duplicate"))
    keyedDupMap(typed.filter(col("fp").isNotNull).as[(Long, String)],
      stateTtlMs, initialKeepers).unionByName(quarantine)
  }

  /** Shared stateful core of the dedup maps: first-seen-wins canonical
    * per key, one long of state per distinct key; optionally seeded
    * from a (fp, canonical_id) keeper table via Spark's initial-state
    * API (state-store-distributed, never driver-collected). */
  private def keyedDupMap(typed: org.apache.spark.sql.Dataset[(Long, String)],
                          stateTtlMs: Option[Long],
                          initialKeepers: Option[DataFrame] = None): DataFrame = {
    val spark = typed.sparkSession
    import spark.implicits._
    val timeoutConf = if (stateTtlMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    val func = (key: String, rows: Iterator[(Long, String)],
                state: GroupState[Long]) =>
      if (state.hasTimedOut) {
        // idle past TTL: evict (groups receiving data in this batch
        // are invoked with hasTimedOut = false instead)
        state.remove()
        Iterator.empty
      } else {
        // ascend by id: deterministic within a micro-batch, and the
        // canonical of a fresh fingerprint is the batch-minimum id
        val ids = rows.map(_._1).toArray.sorted
        var canon = state.getOption.getOrElse(-1L)
        val out = new Array[DupMapOut](ids.length)
        var i = 0
        while (i < ids.length) {
          if (canon < 0) {
            canon = ids(i)
            state.update(canon)
            out(i) = DupMapOut(ids(i), canon, is_duplicate = false)
          } else {
            out(i) = DupMapOut(ids(i), canon, is_duplicate = true)
          }
          i += 1
        }
        stateTtlMs.foreach(state.setTimeoutDuration)
        out.iterator
      }
    val grouped = typed.groupByKey(_._2)
    initialKeepers match {
      case Some(keepers) =>
        val init = keepers
          .select(col("fp").cast("string"),
            col("canonical_id").cast("long"))
          .as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2)
        grouped.flatMapGroupsWithState[Long, DupMapOut](
          OutputMode.Append(), timeoutConf, init)(func)
          .toDF()
      case None =>
        grouped.flatMapGroupsWithState[Long, DupMapOut](
          OutputMode.Append(), timeoutConf)(func)
          .toDF()
    }
  }

  case class PairOut(id_a: Long, id_b: Long, est_jaccard: Double)

  case class HammingPairOut(id_a: Long, id_b: Long, hamming: Int)

  /** Streaming near-dup pairs over an arbitrary 64-bit perceptual
    * fingerprint column — the streaming face of
    * `Dedup.hamming64DupPairs` (SimHash text, image dHash, audio
    * spectral hash): 4x16-bit bands key the state store; each bucket
    * holds its members as a PACKED byte blob (16 B per member:
    * [id:8][fp:8], the same zero-allocation state discipline as
    * [[streamingMinhashDupPairs]]); an arriving fingerprint scores
    * against every stored member by full Hamming distance.
    *
    * Exactly-once emission WITHOUT a dedup pass: the full fingerprints
    * are in hand, so every bucket holding a matching pair computes the
    * same LOWEST colliding band and only that band's bucket emits.
    * Recall matches the batch operator (pigeonhole-exact for
    * `maxHamming <= 3`) while every member is stored everywhere it
    * hashes; past the `maxBucket` cap a bucket stops ADMITTING members
    * (prospective prune — the batch op's retroactive prune differs
    * there, both bounded; a pair whose lowest colliding band
    * overflowed is dropped even if a higher band holds both, same
    * documented trade as the MinHash stream). `stateTtlMs` bounds
    * state for unbounded corpora exactly as in [[streamingDupMap]].
    *
    * Input must carry `id` (long) and `fp` (long) columns — callers
    * attach the fingerprint with the matching narrow pass
    * (`Multimodal.withDHash`, `withAudioDHash`, `Dedup.simhash64`). */
  def streamingHamming64DupPairs(fps: DataFrame, maxHamming: Int = 3,
                                 maxBucket: Int = 1000,
                                 stateTtlMs: Option[Long] = None): DataFrame = {
    val spark = fps.sparkSession
    import spark.implicits._
    val banded = fps.select(col("id").cast("long"), col("fp").cast("long"))
      .select(col("id"), col("fp"),
        explode(array((0 until 4).map(b => struct(
          lit(b).as("band"),
          shiftright(col("fp"), b * 16).bitwiseAND(0xFFFF).as("bucket"))): _*))
          .as("bk"))
      .select(col("id"), col("fp"), col("bk.band"), col("bk.bucket"))
      .as[(Long, Long, Int, Long)]
    val timeoutConf = if (stateTtlMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    banded.groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[Array[Byte], HammingPairOut](
        OutputMode.Append(), timeoutConf) {
        case (_, _, state: GroupState[Array[Byte]]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case (key, rows, state: GroupState[Array[Byte]]) =>
          val myBand = key._1
          val batch = rows.toArray
          // ascend by id: deterministic, and a single-batch run then
          // reproduces the batch operator's id_a < id_b pair set
          java.util.Arrays.sort(batch,
            Ordering.by[(Long, Long, Int, Long), Long](_._1))
          val stored = state.getOption.getOrElse(Array.emptyByteArray)
          var n = stored.length / 16
          val room = math.min(maxBucket, n + batch.length)
          val buf = java.nio.ByteBuffer.allocate(room * 16)
            .order(java.nio.ByteOrder.BIG_ENDIAN)
          buf.put(stored, 0, n * 16)
          buf.position(0)
          val lb = buf.asLongBuffer()
          val out = scala.collection.mutable.ArrayBuffer.empty[HammingPairOut]
          var bi = 0
          while (bi < batch.length) {
            val id = batch(bi)._1
            val fp = batch(bi)._2
            // presence pass FIRST: a re-ingested id is skipped
            // entirely — its pairs were emitted when it first arrived,
            // and scoring or storing it again would duplicate them
            var seen = false
            var i = 0
            while (i < n && !seen) {
              if (lb.get(2 * i) == id) seen = true
              i += 1
            }
            // a bucket at the cap has stopped ADMITTING members
            // (prospective prune): an arrival that cannot be STORED
            // must not score either — emitted-but-unstored pairs
            // would re-emit when the id is ever re-ingested, breaking
            // the exactly-once contract (same gate as the MinHash
            // stream's `nMembers < maxBucket` block)
            if (!seen && n < maxBucket) {
              i = 0
              while (i < n) {
                val oid = lb.get(2 * i)
                val ofp = lb.get(2 * i + 1)
                val d = java.lang.Long.bitCount(fp ^ ofp)
                if (d <= maxHamming) {
                  // lowest colliding band: exists because THIS bucket
                  // collided; every bucket holding the pair agrees
                  var low = 0
                  while (((fp >>> (low * 16)) & 0xFFFF) !=
                    ((ofp >>> (low * 16)) & 0xFFFF)) low += 1
                  if (low == myBand)
                    out += HammingPairOut(math.min(id, oid),
                      math.max(id, oid), d)
                }
                i += 1
              }
              lb.put(2 * n, id)
              lb.put(2 * n + 1, fp)
              n += 1
            }
            bi += 1
          }
          state.update(java.util.Arrays.copyOf(buf.array(), n * 16))
          stateTtlMs.foreach(state.setTimeoutDuration)
          out.iterator
      }
      .toDF()
  }

  /** Streaming perceptual image dedup: dHash each arriving payload
    * (narrow partition pass, the image bytes never reach the state
    * store) and feed [[streamingHamming64DupPairs]] — the ingest-time
    * face of `Multimodal.imageDupPairs`. Undecodable payloads drop
    * out (null fingerprint); route them separately. */
  def streamingImageDupPairs(media: DataFrame, idCol: String = "media_id",
                             payloadCol: String = "payload",
                             maxHamming: Int = 3, maxBucket: Int = 1000,
                             stateTtlMs: Option[Long] = None): DataFrame = {
    val hashed = graft.multimodal.Multimodal
      .withDHash(media.select(col(idCol), col(payloadCol)), payloadCol)
      .filter(col("dhash").isNotNull)
      .select(col(idCol).as("id"), col("dhash").as("fp"))
    streamingHamming64DupPairs(hashed, maxHamming, maxBucket, stateTtlMs)
  }

  case class TokenCountOut(token: String, n_occurrences: Long, n_docs: Long)

  /** Streaming (token, n_occurrences, n_docs) counts — the streaming
    * face of `CorpusStats.tokenCounts`, which is batch-only because
    * doc frequency needs a per-doc distinct aggregation BEFORE the
    * per-token one and chained streaming aggregations are unsupported.
    * One `flatMapGroupsWithState` keyed by token replaces the chain:
    * the group function dedups doc ids within the arriving batch
    * (documents are atomic per micro-batch and arrive once, so
    * per-batch distinct doc counts sum to the corpus doc frequency)
    * and adds to the running (occurrences, docs) state — state is two
    * longs per distinct token, the minimum for exact df.
    *
    * Emits the UPDATED cumulative row for every token that received
    * data in the batch (Update output semantics); counts are
    * monotone, so the latest row per token is the current answer and
    * `max` per token reconciles a replayed log. `stateTtlMs` bounds
    * state for unbounded vocabularies exactly as in
    * [[streamingDupMap]] (idle tokens evicted, their counts restart);
    * TTL mode requires a processing-time trigger interval. */
  def streamingTokenCounts(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text",
                           stateTtlMs: Option[Long] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val perDocToken = docs
      .select(col(idCol).cast("long").as("id"),
        explode(TextFunctions.normalizedWords(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .as[(Long, String)]
    val timeoutConf = if (stateTtlMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    perDocToken.groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Long), TokenCountOut](
        OutputMode.Update(), timeoutConf) {
        case (_, _, state: GroupState[(Long, Long)]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case (token, rows, state: GroupState[(Long, Long)]) =>
          var occ = 0L
          val docsSeen = scala.collection.mutable.HashSet.empty[Long]
          rows.foreach { r => occ += 1; docsSeen += r._1 }
          val (o0, d0) = state.getOption.getOrElse((0L, 0L))
          val next = (o0 + occ, d0 + docsSeen.size)
          state.update(next)
          stateTtlMs.foreach(state.setTimeoutDuration)
          Iterator(TokenCountOut(token, next._1, next._2))
      }.toDF()
  }

  /** Streaming MinHash-LSH near-dup pairs: the stream-side of
    * `Dedup.minhashDupPairs`, emitting each qualifying (id_a, id_b,
    * est_jaccard) exactly once as the later document arrives.
    *
    * ONE stateful stage, keyed by (band, bucket): state is the
    * bucket's member signatures; an arriving doc is scored against the
    * stored members (same matching-slots/numHashes estimate as batch)
    * and appended. Buckets are capped at `maxBucket` members — the
    * prospective analog of the batch path's retroactive mega-bucket
    * drop (boilerplate buckets stop accumulating state and stop
    * producing pairs, rather than quadratically exploding).
    *
    * Exactly-once emission WITHOUT a second stateful stage: a pair
    * colliding in k bands is scored in all k buckets, but each bucket
    * holds BOTH full signatures, so every bucket computes the same
    * "minimum colliding band" (first band whose signature slices are
    * equal) locally, and only the bucket at that band emits. This
    * replaces the previous pair-keyed first-seen filter: one stateful
    * exchange per micro-batch instead of two (the per-trigger floor
    * the round-6 bench flagged), and the state bound DROPS from
    * docs×bands + emitted-pairs to docs×bands. If no band's slices
    * truly match (the pair met the threshold only through an xxhash64
    * bucket collision), the scoring bucket emits directly — duplicate
    * emission then needs TWO such hash collisions for one pair,
    * probability ~2^-64 per band pair.
    *
    * Fed as one batch in ascending id order, the emitted pair set and
    * estimates equal `minhashDupPairs` on the same data (tested) as
    * long as no bucket overflows `maxBucket` — past the cap the two
    * prune different pairs (prospective vs retroactive), both bounded.
    *
    * `stateTtlMs` bounds state for unbounded corpora (same contract as
    * [[streamingDupMap]]): a BUCKET idle longer than the TTL is
    * evicted, so a near-dup arriving after the window pairs only with
    * members seen since — the standard bounded-state windowed-dedup
    * semantic, applied per bucket. None = exact, unbounded. TTL mode
    * REQUIRES a processing-time trigger interval on the query
    * (ProcessingTimeTimeout busy-loops under the default ASAP
    * trigger). */
  def streamingMinhashDupPairs(docs: DataFrame, idCol: String = "doc_id",
                               textCol: String = "text", n: Int = 3,
                               numHashes: Int = 32, bands: Int = 8,
                               threshold: Double = 0.7,
                               maxBucket: Int = 1000,
                               stateTtlMs: Option[Long] = None): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    // identical signature + banding expressions to the batch plan
    val sig = docs.select(col(idCol).cast("long").as("id"),
      TextFunctions.normalizedWords(col(textCol)).as("__w"))
      .select(col("id"),
        Dedup.minhashSignature(col("__w"), n, numHashes).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))).as("bucket"))))
        .as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bucket"), col("sig"))
      .as[(Long, Int, Long, Seq[Long])]

    val timeoutConf = if (stateTtlMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    // State is a PACKED byte blob per bucket: nMembers records of
    // [id:8B][sig: numHashes×8B], big-endian. The round-7 profile put
    // the residual per-trigger cost in (de)serializing the
    // BucketMembers product encoder (Seq[Seq[Long]]) for every touched
    // bucket every batch; a BinaryType state value round-trips through
    // the store as-is, and scoring reads longs at absolute offsets
    // with zero per-member allocation. State-store PROVIDER is
    // orthogonal: measured at bench scale (10^5 state rows) the
    // RocksDB provider ties the default in-memory one (r8 probe,
    // ~0.5 s/trigger both); a deployment whose docs×bands state
    // outgrows executor heap should flip to RocksDB — the packed-blob
    // value works identically there.
    val rec = 8 * (1 + numHashes)
    banded.groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[Array[Byte], PairOut](
        OutputMode.Append(), timeoutConf) {
        case (key, rows, state: GroupState[Array[Byte]])
          if state.hasTimedOut =>
          // bucket idle past TTL: evict its members (buckets receiving
          // data this batch are invoked with hasTimedOut = false)
          state.remove()
          Iterator.empty
        case (key, rows, state: GroupState[Array[Byte]]) =>
          val myBand = key._1
          val batch = rows.toArray
          // ascend by id within the micro-batch (deterministic, and a
          // single-batch run then matches the batch id_a < id_b pairs)
          java.util.Arrays.sort(batch,
            Ordering.by[(Long, Int, Long, Seq[Long]), Long](_._1))
          val stored = state.getOption.getOrElse(Array.emptyByteArray)
          var nMembers = stored.length / rec
          // one allocation per touched bucket per batch: old members +
          // room for this batch's arrivals (capped at maxBucket)
          val room = math.min(maxBucket,
            nMembers + batch.length)
          val buf = java.nio.ByteBuffer
            .allocate(room * rec).order(java.nio.ByteOrder.BIG_ENDIAN)
          buf.put(stored, 0, nMembers * rec)
          buf.position(0) // asLongBuffer views from the CURRENT position
          val lb = buf.asLongBuffer() // long view over ALL members
          val stride = 1 + numHashes
          // first band whose signature slices are equal — every bucket
          // holding both members computes the same value, so exactly
          // one (that band's bucket) emits the pair; -1 = none (pure
          // bucket-hash collision), where the scoring bucket emits
          def minCollidingBand(sg: Array[Long], base: Int): Int = {
            var j = 0
            while (j < bands) {
              var k = j * rowsPerBand
              val end = k + rowsPerBand
              var eq = true
              while (eq && k < end) {
                if (sg(k) != lb.get(base + 1 + k)) eq = false
                k += 1
              }
              if (eq) return j
              j += 1
            }
            -1
          }
          val out = scala.collection.mutable.ArrayBuffer[PairOut]()
          var appended = 0
          var bi = 0
          while (bi < batch.length) {
            if (nMembers < maxBucket) {
              val id = batch(bi)._1
              val sg = batch(bi)._4.toArray
              var m0 = 0
              while (m0 < nMembers) {
                val base = m0 * stride
                val other = lb.get(base)
                if (other != id) {
                  var m = 0
                  var k = 0
                  while (k < numHashes) {
                    if (lb.get(base + 1 + k) == sg(k)) m += 1
                    k += 1
                  }
                  val est = m.toDouble / numHashes
                  if (est >= threshold) {
                    val mb = minCollidingBand(sg, base)
                    if (mb == myBand || mb < 0)
                      out += PairOut(math.min(id, other), math.max(id, other), est)
                  }
                }
                m0 += 1
              }
              // append the arrival so later batch-mates score against it
              val base = nMembers * stride
              lb.put(base, id)
              var k = 0
              while (k < numHashes) { lb.put(base + 1 + k, sg(k)); k += 1 }
              nMembers += 1
              appended += 1
            }
            bi += 1
          }
          // skip the state rewrite when nothing was appended (bucket at
          // cap): scoring is stateless wrt stored members
          if (appended > 0) {
            val arr = new Array[Byte](nMembers * rec)
            buf.position(0); buf.get(arr)
            state.update(arr)
          }
          stateTtlMs.foreach(state.setTimeoutDuration)
          out.iterator
      }.toDF()
  }

  case class LmGateOut(doc_id: Long, n_words: Long, pseudo_ppl: Double)

  case class DsirGateOut(doc_id: Long, n_feats: Long, log_w: Double)

  case class CeDiffGateOut(doc_id: Long, n_words: Long, ce_in: Double,
                           ce_out: Double, ce_diff: Double)

  case class LangGateOut(doc_id: Long, lang_pred: String)

  case class SemGateOut(vec_id: Long, is_near_dup: Boolean,
                        canonical_id: Long, est_cosine: Double)

  /** Streaming face of the incremental SEMANTIC index: arriving
    * embeddings flagged against the static corpus keeper table
    * (`Similarity.semanticSignatureIndex` rows + the persisted
    * IVF+PQ model) via a stream-STATIC join on the coarse cell —
    * the ingestion-time near-dup gate, corpus side never re-encoded.
    *
    * Scope vs the batch operator: corpus matches only. In-batch
    * (stream-internal) near-dups are [[streamingMinhashDupPairs]]-class
    * cross-row state and deliberately out of this gate's contract —
    * production stacks this gate (vs the corpus) in front of a keyed
    * stateful pair stage when stream-internal dups matter.
    *
    * Plan: probes = nProbe (vec, cell) rows per arriving vector (pure
    * flatMap); static index joins on cell with a LEFT OUTER
    * stream-static join — an arriving vector whose probe cells contain
    * no corpus rows (a novel direction) still reaches the fold and
    * emits `(id, false, id, 0.0)` instead of being silently dropped
    * (r11 ADVICE; Structured Streaming supports stream-side outer
    * joins against static frames). The static side is broadcastable
    * when the index fits — pass it pre-`broadcast()`-hinted if so.
    * Asymmetric code scoring via the ONE shared
    * `Similarity.approxCosUdf` definition (identical scores to the
    * batch operator by construction); per-vector fold + single
    * emission via `flatMapGroupsWithState` (state never written — zero
    * retained rows; vectors are batch-atomic like every per-doc gate
    * here). Output: one row per arriving vector with is_near_dup, the
    * minimum matching corpus id (own id when new), and the best
    * approximate cosine (0.0 when new). */
  def streamingSemanticGate(vecs: DataFrame,
                            model: graft.operators.Similarity.SemanticIndexModel,
                            corpusIndex: DataFrame,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            nProbe: Int = 4,
                            threshold: Double = 0.5): DataFrame = {
    graft.operators.Similarity.requireIntegralId(vecs, idCol,
      "streamingSemanticGate")
    graft.operators.Similarity.requireIntegralId(corpusIndex, "id",
      "streamingSemanticGate(corpusIndex)")
    val spark = vecs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val probes = vecs
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val mm = bc.value
        it.flatMap { case (id, raw) =>
          graft.operators.Similarity.probeCells(mm, raw, nProbe)
            .iterator.map(cell => (id, raw, cell))
        }
      }
      .toDF("id", "qv", "cell")
    val approxCos = graft.operators.Similarity.approxCosUdf(model)
    probes.join(
        corpusIndex.select(col("cell"), col("id").cast("long").as("cid"),
          col("codes"), col("rec_norm")), Seq("cell"), "left_outer")
      .select(col("id"), col("cid"),
        // unmatched probe rows carry null cid/codes; the shared native
        // expression scores NULL inputs 0.0 itself (below any
        // threshold) — the coalesce is a belt-and-suspenders no-op
        coalesce(approxCos(col("qv"), col("codes"), col("rec_norm")),
          lit(0.0)).as("e"))
      .as[(Long, Option[Long], Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, SemGateOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (id, rows, _: GroupState[Boolean]) =>
          // fold: best cosine + min matching corpus id above threshold
          var best = 0.0
          var canon = Long.MaxValue
          rows.foreach {
            case (_, Some(cid), e) if e >= threshold =>
              if (e > best) best = e
              if (cid < canon) canon = cid
            case _ => () // no candidate in this probe cell, or below threshold
          }
          if (canon == Long.MaxValue) Iterator(SemGateOut(id, false, id, 0.0))
          else Iterator(SemGateOut(id, true, canon, best))
      }.toDF()
  }

  /** Streaming language-ID gate: the NB char-trigram classifier
    * ([[graft.operators.LangId]]) trained ONCE on a static labeled
    * reference corpus, scoring arriving docs via a broadcast
    * stream-static model join — the streaming face of
    * `LangId.classify`, exactly as [[streamingLmGate]] is for the LM
    * gates. Per-trigram quantized log-probs (integer, so the stream's
    * per-group fold is EXACT and emits the identical argmax to the
    * batch operator), per-doc fold + single emission via
    * `flatMapGroupsWithState` (state removed in the doc's own batch —
    * zero retained state; docs assumed batch-atomic like every per-doc
    * gate here). Trigram-less (empty/blank) docs flow through an
    * `explode_outer` as a single null-gram row contributing ZERO to
    * every language sum, so the fold emits the prior-only argmax —
    * exactly `LangId.classify`'s treatment; the gate loses no rows
    * (r11 ADVICE: the previous inner explode dropped them). */
  def streamingLangIdGate(docs: DataFrame, modelDocs: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          langCol: String = "lang",
                          parallelism: Int = 0): DataFrame = {
    val lid = graft.operators.LangId
    val m = lid.trainNb(modelDocs, textCol, langCol, parallelism)
    val langs = m.langs.toArray
    val priors = langs.map(m.priorQ)
    val lpArr = array(m.langs.map(l =>
      coalesce(col(s"lpq_$l"), lit(m.floorQ(l)))): _*)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        explode_outer(lid.charTrigrams(col(textCol))).as("gram"))
      .join(broadcast(m.model), Seq("gram"), "left")
      // the null-gram row of a trigram-less doc must contribute ZERO
      // (not the OOV floors): batch classify has no trigram rows for
      // such a doc, so its score is the prior alone
      .select(col("id"), when(col("gram").isNull,
          array(m.langs.map(_ => lit(0L)): _*)).otherwise(lpArr).as("lp"))
      .as[(Long, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, LangGateOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (id, rows, _: GroupState[Boolean]) =>
          // state is never WRITTEN — the typed-state API is used for
          // its per-group iterator only, so retained state is zero by
          // construction (docs are batch-atomic, one emission each)
          val sums = new Array[Long](langs.length)
          rows.foreach { case (_, lp) =>
            var i = 0
            while (i < sums.length) { sums(i) += lp(i); i += 1 }
          }
          var best = 0
          var i = 1
          while (i < sums.length) {
            // strict > keeps the FIRST (alphabetically smallest) lang
            // on ties — the batch operator's tie-break
            if (sums(i) + priors(i) > sums(best) + priors(best)) best = i
            i += 1
          }
          Iterator(LangGateOut(id, langs(best)))
      }.toDF()
  }


  /** Streaming LM quality gate — the streaming face of
    * [[graft.operators.LanguageModel.ngramPseudoPerplexity]]'s
    * external-model mode (the CCNet production shape run as an ingest
    * filter): a pretrained order-`order` Stupid-Backoff LM from the
    * STATIC `modelDocs` corpus scores every arriving document, with
    * live backoff and the `oovLogp` floor.
    *
    * Plan shape: the model frames are built once, persisted, and hit
    * as STREAM-STATIC left joins each micro-batch (the static side is
    * state-store-free — at 100 TB the model is vocab/n-gram-type-sized
    * and shuffles only against the batch's tokens, never the corpus).
    * Tokens come from the same per-row transform as batch, so the
    * stream needs no window or self-join; per-document aggregation
    * runs through `flatMapGroupsWithState` that emits and REMOVES
    * state in the same micro-batch — a document's tokens all arrive in
    * its batch, so retained streaming state is ZERO (unlike a
    * streaming groupBy().agg(), whose per-doc state never dies).
    * Output: one (doc_id, n_words, pseudo_ppl) row per scored doc,
    * Update mode. Fed the same data, results equal the batch
    * external-mode operator doc-for-doc (tested; fp addition order
    * differs, so compare at ~1e-12 relative).
    *
    * The model caches register with [[graft.CacheRegistry]]: release
    * them after the stream stops. */
  def streamingLmGate(docs: DataFrame, modelDocs: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text",
                      order: Int = 3, alpha: Double = 0.4,
                      oovLogp: Double = math.log(1e-9),
                      broadcastModels: Boolean = false): DataFrame = {
    require(order >= 2 && order <= 8, s"order must be in [2, 8], got $order")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    val lm = graft.operators.LanguageModel
    // AQE is disabled in stateful streaming queries, so the model joins
    // default to sort-merge (a per-batch token shuffle). A PRUNED
    // serving LM that fits the driver can opt into broadcast hints and
    // make every micro-batch shuffle-free up to the per-doc agg; leave
    // false for unbounded model corpora.
    val hint: DataFrame => DataFrame =
      if (broadcastModels) broadcast(_) else identity
    val models = lm.buildNgramModels(
      lm.tokenizeNgrams(modelDocs, None, textCol, order, 0), order)
      .map { case (k, df) => k -> hint(graft.CacheRegistry.register(
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))
      }
    // gram_j for a token whose class is below j concatenates fewer
    // parts (concat_ws skips the null prevs) — a guaranteed join miss,
    // and the class CASE below never reads those ls_j anyway
    var scored = lm.tokenizeNgrams(docs, Some(idCol), textCol, order, 0)
    for (j <- order to 1 by -1) {
      scored = scored.withColumn(s"gram$j", lm.gramKey(j))
        .join(models(j).withColumnRenamed("ls", s"ls$j")
          .withColumnRenamed("gram", s"gram$j"), Seq(s"gram$j"), "left")
    }
    // the alpha chain for a position-class-k token (ln(alpha) per
    // descended order; the OOV floor replaces S at order 1)
    def chain(k: Int) = {
      var e = coalesce(col("ls1"), lit(oovLogp))
      for (j <- 2 to k) e = coalesce(col(s"ls$j"), log(lit(alpha)) + e)
      e
    }
    // class selection: prev_k null (and prev_{k-1} set, guaranteed by
    // checking the most recent context first) <=> position k-1
    var ls = chain(order)
    for (k <- order - 1 to 1 by -1)
      ls = when(col(s"prev$k").isNull, chain(k)).otherwise(ls)
    val spark = docs.sparkSession
    import spark.implicits._
    scored.select(col(idCol).cast("long").as("id"), ls.as("ls"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, LmGateOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (id, rows, state: GroupState[Boolean]) =>
          var n = 0L; var s = 0.0
          rows.foreach { r => n += 1; s += r._2 }
          if (state.exists) state.remove()
          Iterator(LmGateOut(id, n, math.exp(-s / n)))
      }.toDF()
  }

  /** Streaming Moore-Lewis gate — contrastive cross-entropy-difference
    * selection ([[graft.operators.LanguageModel.crossEntropyDiff]])
    * run as an ingest filter: Stupid-Backoff model sets are trained
    * ONCE from a static IN-DOMAIN corpus and a static GENERAL-POOL
    * reference, and each arriving document is scored under BOTH in one
    * pass — ce_diff = H_in(d) − H_pool(d), low = select.
    *
    * Unlike the batch operator (where the pool model comes from the
    * scored corpus itself, making its backoff provably dead), the
    * stream is NOT the pool: backoff is LIVE ON BOTH SIDES, so each
    * side routes through the same k left joins + alpha-coalesce chain
    * as [[streamingLmGate]] — the two chains share the single
    * tokenize/gram projection and the same class CASE, so the
    * incremental cost over the one-model gate is k more model joins,
    * not a second corpus pass. Output: (doc_id, n_words, ce_in,
    * ce_out, ce_diff), one emission per doc, zero retained state.
    * Model frames are vocab-sized: `broadcastModels = true` makes
    * every micro-batch shuffle-free up to the per-doc fold (AQE is
    * off in streaming plans), leave false for unbounded corpora.
    * Caches register with [[graft.CacheRegistry]]: release after the
    * stream stops. */
  def streamingCeDiffGate(docs: DataFrame, inDomainDocs: DataFrame,
                          poolDocs: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          order: Int = 3, alpha: Double = 0.4,
                          oovLogp: Double = math.log(1e-9),
                          broadcastModels: Boolean = false): DataFrame = {
    require(order >= 2 && order <= 8, s"order must be in [2, 8], got $order")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    val lm = graft.operators.LanguageModel
    val hint: DataFrame => DataFrame =
      if (broadcastModels) broadcast(_) else identity
    def models(src: DataFrame, tag: String): Map[Int, DataFrame] =
      lm.buildNgramModels(
        lm.tokenizeNgrams(src, None, textCol, order, 0), order)
        .map { case (k, df) => k -> hint(graft.CacheRegistry.register(
          df.withColumnRenamed("ls", s"ls_$tag$k")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))
        }
    val inM = models(inDomainDocs, "in")
    val poolM = models(poolDocs, "out")
    var scored = lm.tokenizeNgrams(docs, Some(idCol), textCol, order, 0)
    for (j <- order to 1 by -1) {
      scored = scored.withColumn(s"gram$j", lm.gramKey(j))
        .join(inM(j).withColumnRenamed("gram", s"gram$j"),
          Seq(s"gram$j"), "left")
        .join(poolM(j).withColumnRenamed("gram", s"gram$j"),
          Seq(s"gram$j"), "left")
    }
    def chain(k: Int, tag: String) = {
      var e = coalesce(col(s"ls_${tag}1"), lit(oovLogp))
      for (j <- 2 to k) e = coalesce(col(s"ls_$tag$j"), log(lit(alpha)) + e)
      e
    }
    def classLs(tag: String) = {
      var ls = chain(order, tag)
      for (k <- order - 1 to 1 by -1)
        ls = when(col(s"prev$k").isNull, chain(k, tag)).otherwise(ls)
      ls
    }
    val spark = docs.sparkSession
    import spark.implicits._
    scored.select(col(idCol).cast("long").as("id"),
        classLs("in").as("lsi"), classLs("out").as("lso"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, CeDiffGateOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (id, rows, state: GroupState[Boolean]) =>
          var n = 0L; var si = 0.0; var so = 0.0
          rows.foreach { r => n += 1; si += r._2; so += r._3 }
          if (state.exists) state.remove()
          Iterator(CeDiffGateOut(id, n, -si / n, -so / n,
            (-si / n) - (-so / n)))
      }.toDF()
  }

  /** Streaming DSIR selection gate — the streaming face of
    * [[graft.operators.Sampling.dsirWeights]] (Xie et al. 2023) run
    * as an ingest filter: the hashed-feature λ table is trained ONCE
    * from STATIC raw-pool and target corpora, and every arriving
    * document is scored with its bag-of-features log importance
    * weight via a broadcast stream-static join.
    *
    * Unlike the batch operator (whose scored docs ARE the raw pool,
    * so every feature bucket is observed by construction), a stream
    * document can hash into a bucket neither static corpus saw. The
    * λ table here is therefore built over the FULL bucket domain —
    * `spark.range(buckets)` left-joined with both count frames — so
    * the stream-side join is a guaranteed-hit inner join with no
    * miss/coalesce path, and unseen buckets carry the correct
    * add-one-smoothed value ln(1)−ln(Nt+B)−ln(1)+ln(Nr+B). Exactly
    * `buckets` rows, always; `broadcast()`-hinted (AQE is off in
    * streaming plans, and Catalyst's static size estimate for the
    * count aggregates is corpus-sized).
    *
    * Per-doc fold + single emission via `flatMapGroupsWithState`
    * with state removed in the doc's own batch — zero retained
    * state, docs batch-atomic like every per-doc gate here. Output:
    * (doc_id, n_feats, log_w); matches the batch operator
    * doc-for-doc where the doc's buckets are raw-observed (fp
    * addition order differs — ~1e-12 relative, tested), and the
    * full-domain λ formula everywhere else.
    *
    * 100-TB shape: per micro-batch the work is one map-side
    * broadcast-hash probe per feature + one per-doc aggregation —
    * shuffle-free up to the fold; λ is model-sized (`buckets` rows)
    * regardless of corpus scale. The λ cache registers with
    * [[graft.CacheRegistry]]: release after the stream stops. */
  def streamingDsirGate(docs: DataFrame, rawDocs: DataFrame,
                        targetDocs: DataFrame,
                        idCol: String = "doc_id",
                        textCol: String = "text",
                        buckets: Int = 8192,
                        parallelism: Int = 0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val sm = graft.operators.Sampling
    val spark = docs.sparkSession
    import spark.implicits._
    val rawCounts = sm.dsirFeatures(rawDocs, None, textCol, buckets,
        parallelism)
      .groupBy("bucket").agg(count(lit(1)).as("cr"))
    val tCounts = sm.dsirFeatures(targetDocs, None, textCol, buckets,
        parallelism)
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    // 1-row totals; coalesce(0) keeps even an empty corpus lawful
    // (p(b) = 1/buckets for every bucket)
    val totals = broadcast(
      rawCounts.agg(coalesce(sum("cr"), lit(0L)).as("nr"))
        .crossJoin(tCounts.agg(coalesce(sum("ct"), lit(0L)).as("nt"))))
    val lam = graft.CacheRegistry.register(
      spark.range(buckets).toDF("bucket")
        .join(rawCounts, Seq("bucket"), "left")
        .join(tCounts, Seq("bucket"), "left")
        .crossJoin(totals)
        .select(col("bucket"), sm.dsirLambdaCol(col("ct"), col("cr"),
          col("nt"), col("nr"), buckets).as("lam"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    sm.dsirFeatures(docs, Some(idCol), textCol, buckets, parallelism)
      .join(broadcast(lam), Seq("bucket"))
      .select(col(idCol).cast("long").as("id"), col("lam"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, DsirGateOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (id, rows, state: GroupState[Boolean]) =>
          var n = 0L; var s = 0.0
          rows.foreach { r => n += 1; s += r._2 }
          if (state.exists) state.remove()
          Iterator(DsirGateOut(id, n, s))
      }.toDF()
  }

  /** STREAMING SEQUENCE PACKING — the last mile on a live corpus:
    * pack arriving documents into fixed-length token-id sequences,
    * carrying the partial tail across micro-batches. The canonical
    * Structured-Streaming sink composition: `foreachBatch` runs the
    * BATCH packer on each micro-batch with
    * [[graft.operators.Packing.packTokenSequences]]'s `resume`
    * continuation, emits only COMPLETED sequences (exactly `seqLen`
    * tokens — a trainer never sees a sequence twice), and keeps the
    * bounded checkpoint (total tokens, ≤ seqLen carried ids) as the
    * cross-trigger state. Because the batch packer is associative
    * under `resume` (proven by q_incremental_pack against the
    * full-pack oracle), the stream's emitted sequences equal the
    * one-shot batch pack of the concatenated arrival stream exactly —
    * asserted in StreamingSpec across multi-doc triggers.
    *
    * Sequence order within a trigger is `idCol` order (the batch
    * contract); across triggers it is arrival order — what a live
    * pipeline means by document order. `state.flush()` returns the
    * final partial sequence (pad it or drop it — trainer policy) after
    * the stream stops.
    *
    * 100-TB shape: per trigger the work is the batch packer's (one
    * range-bucketed prefix sum, ids crossing one exchange); the
    * driver-held state is TWO values — a long and one partial
    * sequence — regardless of corpus size. */
  final class PackStream(seqLen: Int) extends Serializable {
    @volatile private var st: graft.operators.Packing.PackState =
      graft.operators.Packing.FreshPack
    /** The resume checkpoint (total tokens, carried ids + spans). */
    def state: graft.operators.Packing.PackState = st
    /** The final partial sequence's ids after the stream stops;
      * empty when the stream ended exactly on a boundary. */
    def flush(): Seq[Int] = st.carryIds
    private[streaming] def advance(
        next: graft.operators.Packing.PackState): Unit = st = next
  }

  /** Attach the packer to a streaming `docs` frame: returns the
    * `DataStreamWriter` (caller picks trigger/checkpoint and starts
    * it) plus the carry-state handle. `emit` receives each trigger's
    * COMPLETED sequences (same schema as the batch packer) as an
    * EAGERLY MATERIALIZED frame (r13 ADVICE #1): the rows are
    * computed inside the trigger via `localCheckpoint`, decoupled
    * from the micro-batch plan — an emit callback that defers
    * consumption (async write, stored handle) reads the checkpointed
    * rows instead of silently recomputing a plan that is invalid
    * outside its trigger. The checkpoint's blocks are reclaimed by
    * Spark's ContextCleaner once the callback drops the frame. */
  def streamingPack(docs: DataFrame, idCol: String, textCol: String,
                    seqLen: Int,
                    tokenIds: org.apache.spark.sql.Column =>
                      org.apache.spark.sql.Column,
                    emit: DataFrame => Unit)
      : (org.apache.spark.sql.streaming.DataStreamWriter[
           org.apache.spark.sql.Row], PackStream) = {
    val ps = new PackStream(seqLen)
    val writer = docs.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // triggers are serialized by the engine; the state handle is
        // only touched here
        val packed = graft.operators.Packing.packTokenSequences(
          batch, idCol, textCol, seqLen, tokenIds,
          resume = Some(ps.state))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // eager: completed rows materialize NOW, from the persisted
          // batch frame, before the carry state advances
          emit(packed.filter(col("n_tokens") === seqLen.toLong)
            .localCheckpoint(true))
          val next = graft.operators.Packing.packState(packed, seqLen)
          // a trigger that packs NOTHING (zero-token docs, empty carry)
          // yields an empty frame -> FreshPack; keep the prior state —
          // an empty micro-batch must not restart the sequence stream
          if (next.total > 0L) ps.advance(next)
        } finally packed.unpersist()
        ()
      }
    (writer, ps)
  }
}
