package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-throughput bench: drives the two stateful streaming
  * operators with a deterministic in-memory source and reports
  * rows/sec plus the state-store row count they sustain it at.
  *
  * MemoryStream (not the wall-clock `rate` source) so batch sizes and
  * contents are exact and reproducible: each `addData` +
  * `processAllAvailable` round is one micro-batch, which is the
  * steady-state shape of a real trigger-interval deployment. Rates
  * here are single-box micro-batch machinery + state-op throughput —
  * the per-batch overhead amortizes with batch size, so the figure to
  * watch across rounds is rows/sec at FIXED batch count/size, not the
  * absolute number.
  */
object BenchStreaming {

  case class Result(name: String, rows: Long, batches: Int, sec: Double,
                    rowsPerSec: Double, stateRows: Long,
                    extra: Map[String, Double] = Map.empty)

  /** JSON body (without braces) for one Result row — shared by the
    * standalone main and graft.Bench's round-artifact embedding. */
  def jsonFields(r: Result): String = {
    val extras = r.extra.toSeq.sortBy(_._1)
      .map { case (k, v) => f""","$k":$v%.4f""" }.mkString
    f""""name":"${r.name}","rows":${r.rows},"batches":${r.batches},"sec":${r.sec}%.2f,"rows_per_sec":${r.rowsPerSec}%.0f,"state_rows":${r.stateRows}$extras"""
  }

  private def stateRowsOf(q: StreamingQuery): Long = {
    val p = q.lastProgress
    if (p == null || p.stateOperators.isEmpty) -1L
    else p.stateOperators.map(_.numRowsTotal).sum
  }

  /** Gap-sessionization throughput at a fixed user-state size:
    * `users` sessions stay open the whole run (event times advance
    * within the gap), so every event is one keyed state update. */
  def benchSessionize(spark: SparkSession, users: Int, batches: Int,
                      batchSize: Int): Result = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long, String, Double)]
    val events = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.streaming.EventStreams
      .sessionizeStream(events, gapSec = 3600)
      .writeStream.format("memory").queryName("bench_sessionize")
      .outputMode("append").start()
    try {
      var k = 0L
      val t0 = System.nanoTime()
      var b = 0
      while (b < batches) {
        val batch = Array.tabulate(batchSize) { i =>
          val g = k + i
          val user = g % users
          val sec = (g / users) * 5 // within-gap: sessions never close
          (g, sec * 1000000000L, user, "click", 1.0)
        }
        k += batchSize
        stream.addData(batch.toIndexedSeq)
        out.processAllAvailable()
        b += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = batches.toLong * batchSize
      Result("sessionize_stream", rows, batches, dt, rows / dt, stateRowsOf(out))
    } finally { out.stop(); spark.sql("DROP TABLE IF EXISTS bench_sessionize") }
  }

  /** Deterministic pseudo-text for doc id: ~`wordsPerDoc` words drawn
    * from a vocabulary small enough that LSH buckets get real members
    * but no bucket degenerates (the guards' fixtures cover that case). */
  private[graft] def docText(id: Long, wordsPerDoc: Int): String = {
    val sb = new StringBuilder
    var x = id * 0x9E3779B97F4A7C15L + 1
    var i = 0
    while (i < wordsPerDoc) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      sb.append("w").append(java.lang.Long.remainderUnsigned(x, 5000))
      sb.append(' ')
      i += 1
    }
    sb.toString
  }

  /** Token-count (occurrences + doc frequency) stream throughput: each
    * doc explodes to ~30 tokens over a 5000-word vocabulary, so state
    * converges to the vocabulary size while every batch updates most
    * of it — the steady-state shape of corpus profiling on a stream. */
  def benchTokenCounts(spark: SparkSession, batches: Int,
                       batchSize: Int): Result = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val out = graft.streaming.DocStreams
      .streamingTokenCounts(docs)
      .writeStream.format("memory").queryName("bench_tokdf")
      .outputMode("update").start()
    try {
      var k = 0L
      val t0 = System.nanoTime()
      var b = 0
      while (b < batches) {
        val batch = Array.tabulate(batchSize)(i => (k + i, docText(k + i, 30)))
        k += batchSize
        stream.addData(batch.toIndexedSeq)
        out.processAllAvailable()
        b += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = batches.toLong * batchSize
      Result("token_counts_stream", rows, batches, dt, rows / dt,
        stateRowsOf(out))
    } finally { out.stop(); spark.sql("DROP TABLE IF EXISTS bench_tokdf") }
  }

  /** Streaming pack throughput: the foreachBatch + resumable-pack
    * composition (DocStreams.streamingPack) over synthetic docs —
    * tokenize (ws), pack 512-token sequences, carry the partial tail
    * across triggers, count completed sequences. */
  def benchStreamingPack(spark: SparkSession, batches: Int,
                         batchSize: Int): Result = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val ids: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(c), " +"),
        w => org.apache.spark.sql.functions.length(w)
          .cast("int"))
    var emitted = 0L
    val (writer, _) = graft.streaming.DocStreams.streamingPack(
      docs, "doc_id", "text", 512, ids,
      emit = df => emitted += df.count())
    val out = writer.start()
    try {
      var k = 0L
      val t0 = System.nanoTime()
      var b = 0
      while (b < batches) {
        val batch = Array.tabulate(batchSize)(i => (k + i, docText(k + i, 30)))
        k += batchSize
        stream.addData(batch.toIndexedSeq)
        out.processAllAvailable()
        b += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = batches.toLong * batchSize
      Result("pack_stream", rows, batches, dt, rows / dt, stateRows = 0L,
        extra = Map("sequences_emitted" -> emitted.toDouble))
    } finally out.stop()
  }

  /** Streaming LM gate throughput: a pretrained trigram Stupid-Backoff
    * model from a 500-doc static reference corpus scores arriving docs
    * via stream-static joins (live backoff + OOV floor). State rows
    * must read ZERO — the gate emits and removes per-doc state within
    * each micro-batch. */
  def benchLmGate(spark: SparkSession, batches: Int,
                  batchSize: Int): Result = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = (0L until 500L).map(i => (i, docText(i, 30)))
      .toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val out = graft.streaming.DocStreams.streamingLmGate(docs, ref,
      broadcastModels = true)
      .writeStream.format("memory").queryName("bench_lmgate")
      .outputMode("update").start()
    try {
      var k = 100000L
      val t0 = System.nanoTime()
      var b = 0
      while (b < batches) {
        val batch = Array.tabulate(batchSize)(i => (k + i, docText(k + i, 30)))
        k += batchSize
        stream.addData(batch.toIndexedSeq)
        out.processAllAvailable()
        b += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = batches.toLong * batchSize
      Result("lm_gate_stream", rows, batches, dt, rows / dt,
        stateRowsOf(out))
    } finally {
      out.stop(); graft.CacheRegistry.releaseAll()
      spark.sql("DROP TABLE IF EXISTS bench_lmgate")
    }
  }

  /** Streaming Moore-Lewis CE-diff gate throughput: both trigram
    * model sets (in-domain + pool) from 500/250-doc static corpora,
    * arriving docs scored under both in one pass. Zero state rows. */
  def benchCeDiffGate(spark: SparkSession, batches: Int,
                      batchSize: Int): Result = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pool = (0L until 500L).map(i => (i, docText(i, 30)))
      .toDF("doc_id", "text")
    val inDomain = (0L until 250L).map(i => (i, docText(i * 2, 30)))
      .toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val out = graft.streaming.DocStreams
      .streamingCeDiffGate(docs, inDomain, pool, broadcastModels = true)
      .writeStream.format("memory").queryName("bench_cediffgate")
      .outputMode("update").start()
    try {
      var k = 100000L
      val t0 = System.nanoTime()
      var b = 0
      while (b < batches) {
        val batch = Array.tabulate(batchSize)(i => (k + i, docText(k + i, 30)))
        k += batchSize
        stream.addData(batch.toIndexedSeq)
        out.processAllAvailable()
        b += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = batches.toLong * batchSize
      Result("cediff_gate_stream", rows, batches, dt, rows / dt,
        stateRowsOf(out))
    } finally {
      out.stop(); graft.CacheRegistry.releaseAll()
      spark.sql("DROP TABLE IF EXISTS bench_cediffgate")
    }
  }

  /** Streaming DSIR gate throughput: the full-domain 8192-bucket λ
    * table trained once from 500-doc static raw/target corpora, every
    * arriving doc scored via the broadcast stream-static probe.
    * State rows must read ZERO like the LM gate. */
  def benchDsirGate(spark: SparkSession, batches: Int,
                    batchSize: Int): Result = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val raw = (0L until 500L).map(i => (i, docText(i, 30)))
      .toDF("doc_id", "text")
    val target = (0L until 100L).map(i => (i, docText(i * 3, 30)))
      .toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val out = graft.streaming.DocStreams
      .streamingDsirGate(docs, raw, target)
      .writeStream.format("memory").queryName("bench_dsirgate")
      .outputMode("update").start()
    try {
      var k = 100000L
      val t0 = System.nanoTime()
      var b = 0
      while (b < batches) {
        val batch = Array.tabulate(batchSize)(i => (k + i, docText(k + i, 30)))
        k += batchSize
        stream.addData(batch.toIndexedSeq)
        out.processAllAvailable()
        b += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = batches.toLong * batchSize
      Result("dsir_gate_stream", rows, batches, dt, rows / dt,
        stateRowsOf(out))
    } finally {
      out.stop(); graft.CacheRegistry.releaseAll()
      spark.sql("DROP TABLE IF EXISTS bench_dsirgate")
    }
  }

  /** MinHash-LSH near-dup pair stream throughput: every doc is
    * signatured (n-gram shingles -> 32 hashes), banded into 8 bucket
    * states, scored against stored members. ~6% of docs are exact
    * re-emissions of an earlier doc so the pair path does real work. */
  def benchMinhash(spark: SparkSession, batches: Int,
                   batchSize: Int): Result = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val out = graft.streaming.DocStreams
      .streamingMinhashDupPairs(docs)
      .writeStream.format("memory").queryName("bench_minhash")
      .outputMode("append").start()
    try {
      var k = 0L
      val t0 = System.nanoTime()
      var b = 0
      while (b < batches) {
        val batch = Array.tabulate(batchSize) { i =>
          val g = k + i
          // every 16th doc repeats an earlier doc's text -> near-dup hit
          val src = if (g % 16 == 15 && g >= 16) g - 16 else g
          (g, docText(src, 30))
        }
        k += batchSize
        stream.addData(batch.toIndexedSeq)
        out.processAllAvailable()
        b += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = batches.toLong * batchSize
      Result("minhash_pairs_stream", rows, batches, dt, rows / dt,
        stateRowsOf(out))
    } finally { out.stop(); spark.sql("DROP TABLE IF EXISTS bench_minhash") }
  }

  /** Per-trigger machinery floor for the SAME minhash query shape:
    * after one real batch (state init), drive `batches` EMPTY
    * micro-batches (MemoryStream.addData(Nil) still advances the
    * offset, so each processAllAvailable runs one zero-row trigger)
    * and time them. sec/batch here is pure micro-batch + state-store
    * open/commit cost — the operator does no per-doc work — so
    * (t_200doc − t_empty)/200 is the operator's marginal ms/doc at the
    * legacy trigger size. */
  def benchMinhashEmptyFloor(spark: SparkSession, batches: Int): Result = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val out = graft.streaming.DocStreams
      .streamingMinhashDupPairs(docs)
      .writeStream.format("memory").queryName("bench_minhash_empty")
      .outputMode("append").start()
    try {
      // one real batch so state partitions/providers exist before timing
      stream.addData((0L until 200L).map(g => (g, docText(g, 30))))
      out.processAllAvailable()
      val t0 = System.nanoTime()
      var b = 0
      while (b < batches) {
        stream.addData(Seq.empty[(Long, String)])
        out.processAllAvailable()
        b += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      Result("minhash_stream_empty_floor", 0L, batches, dt, 0.0,
        stateRowsOf(out))
    } finally {
      out.stop(); spark.sql("DROP TABLE IF EXISTS bench_minhash_empty")
    }
  }

  /** Run both benches (one small warm-up each, then the timed run).
    *
    * Streaming queries run with 8 state partitions instead of the
    * session's batch setting: a stateful micro-batch pays a fixed
    * state-store open/commit per partition per trigger, so partition
    * count should track STATE size, not core count — at these state
    * sizes (10^4-10^5 rows) 8 partitions halves the per-trigger floor
    * vs 32 (measured; see round-7 probe). A real deployment sizes
    * this the same way: state partitions are fixed at first checkpoint
    * and should match the state the stream will hold, not the cluster
    * width a batch scan wants. */
  def run(spark: SparkSession): Seq[Result] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    try {
      benchSessionize(spark, users = 50, batches = 2, batchSize = 500) // warm
      val s = benchSessionize(spark, users = 500, batches = 20, batchSize = 5000)
      benchMinhash(spark, batches = 2, batchSize = 50) // warm
      val m0 = benchMinhash(spark, batches = 10, batchSize = 200)
      // 200-doc triggers are pinned at the per-trigger machinery floor
      // (~0.4-0.6 s/batch regardless of operator); the 1000-doc row is
      // the amortized operator throughput a real deployment would see.
      // Kept as a SEPARATE name so the legacy row's cross-round series
      // stays comparable.
      val mBig = benchMinhash(spark, batches = 10, batchSize = 1000)
        .copy(name = "minhash_pairs_stream_1k")
      // empty-trigger floor decomposes the 200-doc figure: the
      // operator's marginal cost is (t_200/batch − t_empty/batch)/200
      val floor = benchMinhashEmptyFloor(spark, batches = 10)
      val floorPerBatch = floor.sec / floor.batches
      // two marginals, same floor: the 200-doc delta still carries
      // batch-proportional machinery an empty trigger skips (nonempty
      // shuffle map/reduce task launches), so the 1000-doc-amortized
      // figure is the operator's true per-doc cost and the 200-doc one
      // is its upper bound at the legacy trigger size
      def marginal(r: Result, docs: Int): Double = math.max(0.0,
        (r.sec / r.batches - floorPerBatch) / docs * 1000.0)
      val m = m0.copy(extra = Map(
        "empty_floor_sec_per_batch" -> floorPerBatch,
        "marginal_ms_per_doc" -> marginal(m0, 200)))
      val mBig2 = mBig.copy(extra = Map(
        "marginal_ms_per_doc" -> marginal(mBig, 1000)))
      benchTokenCounts(spark, batches = 2, batchSize = 200) // warm
      val t = benchTokenCounts(spark, batches = 10, batchSize = 1000)
      benchLmGate(spark, batches = 2, batchSize = 200) // warm
      val g = benchLmGate(spark, batches = 10, batchSize = 1000)
      benchDsirGate(spark, batches = 2, batchSize = 200) // warm
      val dg = benchDsirGate(spark, batches = 10, batchSize = 1000)
      benchCeDiffGate(spark, batches = 2, batchSize = 200) // warm
      val cg = benchCeDiffGate(spark, batches = 10, batchSize = 1000)
      benchStreamingPack(spark, batches = 2, batchSize = 200) // warm
      val pk = benchStreamingPack(spark, batches = 10, batchSize = 1000)
      Seq(s, m, floor, mBig2, t, g, dg, cg, pk)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark).foreach(r => println(s"{${jsonFields(r)}}"))
    spark.stop()
  }
}
