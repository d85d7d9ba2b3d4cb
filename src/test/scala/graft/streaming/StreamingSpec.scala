package graft.streaming

import graft.slope.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming transforms agree with their batch oracles. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def mkEvents(n: Int): Seq[(Long, Long, Long, String, Double)] = {
    val rng = new scala.util.Random(5)
    (0 until n).map { i =>
      (i.toLong, 1700000000000000000L + rng.nextInt(7200) * 1000000000L,
        rng.nextInt(10).toLong,
        Seq("click", "view", "buy")(rng.nextInt(3)), rng.nextDouble() * 10)
    }
  }

  test("windowed counts: streaming result equals batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = mkEvents(500)
    val batchDf = data.toDF("event_id", "ts", "user_id", "event_type", "value")
    val expected = EventStreams.windowedTypeCounts(batchDf)
      .orderBy("window_start", "event_type").collect()

    val stream = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.windowedTypeCounts(streamDf)
      .writeStream.format("memory").queryName("win_test")
      .outputMode(OutputModeComplete.mode).start()
    stream.addData(data: _*)
    q.processAllAvailable()
    val got = spark.table("win_test")
      .orderBy("window_start", "event_type").collect()
    q.stop()

    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g.getTimestamp(0) == e.getTimestamp(0))
      assert(g.getString(1) == e.getString(1))
      assert(g.getLong(2) == e.getLong(2))
      assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
    }
  }

  test("attribution join: stream-stream interval self-join equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = mkEvents(500)
    val batchDf = data.toDF("event_id", "ts", "user_id", "event_type", "value")
    val expected = EventStreams.attributionJoin(batchDf, windowSec = 900)
      .orderBy("click_id", "view_id").collect()
    assert(expected.nonEmpty, "fixture must exercise the join")

    val stream = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // both join sides are filtered branches of the SAME readStream —
    // the self-join case; state on both sides, bounded by watermark
    val q = EventStreams.attributionJoin(streamDf, windowSec = 900,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    stream.addData(data: _*)
    q.processAllAvailable()
    val got = spark.table("attr_test").orderBy("click_id", "view_id").collect()
    q.stop()

    assert(got.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq,
      s"stream ${got.length} rows vs batch ${expected.length}")
  }

  test("streaming sessionization: gap splits emit finalized sessions once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000000000L
    def ev(id: Long, plusSec: Long, uid: Long, v: Double) =
      (id, t0 + plusSec * 1000000000L, uid, "click", v)
    val stream = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.sessionizeStream(streamDf, gapSec = 1800)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    // batch 1: two events in one session for user 1
    stream.addData(ev(1, 0, 1, 1.0), ev(2, 600, 1, 2.0))
    q.processAllAvailable()
    assert(spark.table("sess_test").count() == 0, "session still open")
    // batch 2: event past the gap -> finalizes the first session
    stream.addData(ev(3, 5000, 1, 3.0))
    q.processAllAvailable()
    val got = spark.table("sess_test").collect()
    q.stop()
    assert(got.length == 1, s"expected one finalized session: ${got.toList}")
    val r = got(0)
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 1700000000L && r.getLong(2) == 1700000600L)
    assert(r.getInt(3) == 2 && math.abs(r.getDouble(4) - 3.0) < 1e-12)
  }

  test("windowed counts: late rows drop, the drop is surfaced, stream matches on-time batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val T0 = 1700002800L // hour-aligned epoch seconds
    def ev(id: Long, plusSec: Long, typ: String) =
      (id, (T0 + plusSec) * 1000000000L, 1L, typ, 1.0)
    val stream = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val listener = new EventStreams.LateDataListener
    spark.streams.addListener(listener)
    val q = EventStreams.windowedTypeCounts(streamDf,
      windowLen = "1 hour", watermark = "10 seconds")
      .writeStream.format("memory").queryName("late_win_test")
      .outputMode("append").start()
    try {
      // batch 1: hour-0 + hour-3 events; max event time advances the
      // watermark to 3h+90s once the batch completes
      stream.addData(ev(1, 100, "click"), ev(2, 3 * 3600 + 100, "click"))
      q.processAllAvailable()
      // batch 2: a LATE hour-0 event (its window END 1h is behind the
      // watermark -> silently dropped by the agg, surfaced by the
      // accounting) plus an hour-4 event that finalizes hours 0..3
      stream.addData(ev(3, 200, "click"), ev(4, 4 * 3600 + 100, "view"))
      q.processAllAvailable()
      // batch 3: advance the watermark past hour-4 to flush it
      stream.addData(ev(5, 5 * 3600 + 100, "view"))
      q.processAllAvailable()
      val got = spark.table("late_win_test")
        .select("window_start", "event_type", "n_events")
        .collect()
        .map(r => (r.getTimestamp(0).getTime / 1000 - T0,
          r.getString(1), r.getLong(2))).toSet
      // parity INCLUDING late arrivals: the stream result equals the
      // BATCH run over the on-time rows only, restricted to finalized
      // windows (final watermark 5h+90s -> window starts <= 4h)
      val onTime = Seq(ev(1, 100, "click"), ev(2, 3 * 3600 + 100, "click"),
        ev(4, 4 * 3600 + 100, "view"), ev(5, 5 * 3600 + 100, "view"))
      val batchAll = EventStreams.windowedTypeCounts(
        onTime.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .select("window_start", "event_type", "n_events")
        .collect()
        .map(r => (r.getTimestamp(0).getTime / 1000 - T0,
          r.getString(1), r.getLong(2))).toSet
      assert(got == batchAll.filter(_._1 <= 4 * 3600),
        s"stream $got vs on-time batch $batchAll")
      assert(!got.exists(_._3 > 1),
        s"the late hour-0 event must not be counted: $got")
      // the drop is SURFACED: progress-ring accounting is synchronous
      assert(EventStreams.rowsDroppedLate(q) == 1L,
        s"rowsDroppedLate=${EventStreams.rowsDroppedLate(q)}")
      // listener accounting arrives asynchronously -> poll
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (listener.droppedFor(q.id) < 1L && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.droppedFor(q.id) == 1L && listener.totalDropped >= 1L)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("streaming sessionization: a late event behind the watermark cannot resurrect a flushed session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000000000L
    def ev(id: Long, plusSec: Long, uid: Long, v: Double) =
      (id, t0 + plusSec * 1000000000L, uid, "click", v)
    val stream = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.sessionizeStream(streamDf, gapSec = 1800,
      watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("late_sess_test")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 0, 1, 1.0), ev(2, 600, 1, 2.0))
      q.processAllAvailable()
      // past-gap event finalizes session [0, 600] and moves the
      // watermark to 5000-10s
      stream.addData(ev(3, 5000, 1, 3.0))
      q.processAllAvailable()
      assert(spark.table("late_sess_test").count() == 1)
      // a late event inside the ALREADY-FLUSHED session's time range,
      // far behind the watermark: the event-time-timeout path drops it
      // (and the accounting surfaces the drop) — the emitted session
      // stays exactly as finalized, no duplicate/resurrected session
      stream.addData(ev(4, 300, 1, 99.0))
      q.processAllAvailable()
      stream.addData(ev(5, 20000, 1, 4.0)) // flush session {3}
      q.processAllAvailable()
      val got = spark.table("late_sess_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
          r.getDouble(4))).sortBy(_._2)
      assert(got.length == 2, s"flushed + second session only: ${got.toList}")
      assert(got(0) == ((1L, 1700000000L, 1700000600L, 2, 3.0)),
        s"finalized session must be untouched by the late event: ${got.toList}")
      assert(got(1) == ((1L, 1700005000L, 1700005000L, 1, 3.0)),
        s"${got.toList}")
      assert(EventStreams.rowsDroppedLate(q) == 1L,
        s"late session event must be dropped+counted: ${EventStreams.rowsDroppedLate(q)}")
    } finally q.stop()
  }

  test("streaming dedup map seeded with a corpus keeper table links corpus dups from batch one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the existing corpus's keeper table — built ONCE by batch
    // exactGroups, never replayed through the stream
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "corpus only delta")).toDF("doc_id", "text")
    val keepers = graft.operators.Dedup.exactGroups(corpus, "doc_id", "text")
      .select(col("fp"), col("canonical_id"))
    val stream = MemoryStream[(Long, String)]
    val streamDf = stream.toDF().toDF("doc_id", "text")
    val q = DocStreams.streamingDupMap(streamDf,
      initialKeepers = Some(keepers))
      .writeStream.format("memory").queryName("seeded_dup_test")
      .outputMode("append").start()
    try {
      // batch 1: a corpus duplicate (case/space variant) + a new doc
      stream.addData((10L, "ALPHA   beta gamma!"), (11L, "fresh content"))
      q.processAllAvailable()
      val b1 = spark.table("seeded_dup_test").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(b1(10L) == ((1L, true)),
        s"corpus dup must link to the CORPUS canonical in batch 1: $b1")
      assert(b1(11L) == ((11L, false)), s"$b1")
      // batch 2: dup of the batch-1 NEW doc + another corpus dup
      stream.addData((12L, "fresh content"), (13L, "corpus only delta"))
      q.processAllAvailable()
      val b2 = spark.table("seeded_dup_test").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(b2(12L) == ((11L, true)) && b2(13L) == ((3L, true)), s"$b2")
    } finally q.stop()
  }

  test("streaming dedup map: single batch reproduces batch exactGroups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "lorem ipsum dolor"),
      (3L, "The quick  brown FOX"), // normalizes to doc 1's fingerprint
      (4L, "lorem ipsum dolor"), (5L, "completely different text"))
    val batchDf = docs.toDF("doc_id", "text")
    val expected = graft.operators.Dedup.exactGroups(batchDf, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("canonical_id") -> r.getAs[Long]("cnt")).toMap

    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.streamingDupMap(
      stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    stream.addData(docs: _*)
    q.processAllAvailable()
    val got = spark.table("dedup_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    q.stop()

    assert(got.length == docs.length, "every document must be mapped")
    // keepers = batch canonicals; group sizes match exactGroups counts
    val keepers = got.filter(!_._3).map(_._1).toSet
    assert(keepers == expected.keySet, s"$keepers vs ${expected.keySet}")
    got.groupBy(_._2).foreach { case (canon, rows) =>
      assert(rows.length == expected(canon), s"group $canon size")
      assert(rows.forall(r => r._3 == (r._1 != canon)))
    }
  }

  test("streaming url dedup map: variants fold across batches, junk passes through") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.streamingUrlDupMap(
      stream.toDF().toDF("doc_id", "url"))
      .writeStream.format("memory").queryName("url_dedup_test")
      .outputMode("append").start()
    stream.addData(
      (1L, "http://a.example/x"),
      (2L, "not a url"))
    q.processAllAvailable()
    stream.addData(
      (3L, "HTTP://A.Example:80/x"),    // folds to doc 1's canonical
      (4L, "http://a.example/x?utm_source=t"), // same
      (5L, "http://a.example/y"),
      (6L, "also junk"))
    q.processAllAvailable()
    val got = spark.table("url_dedup_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    q.stop()
    assert(got.toSeq == Seq(
      (1L, 1L, false), (2L, 2L, false), (3L, 1L, true), (4L, 1L, true),
      (5L, 5L, false), (6L, 6L, false)), got.toList.toString)
  }

  test("streaming dedup map: later batches link to the original canonical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.streamingDupMap(
      stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_inc_test")
      .outputMode("append").start()
    stream.addData((10L, "alpha beta"), (11L, "gamma"))
    q.processAllAvailable()
    stream.addData((12L, "ALPHA   beta"), (13L, "delta")) // 12 dups 10
    q.processAllAvailable()
    val got = spark.table("dedup_inc_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    q.stop()
    assert(got.toSeq == Seq((10L, 10L, false), (11L, 11L, false),
      (12L, 10L, true), (13L, 13L, false)), got.toList.toString)
  }

  test("streaming dedup map: TTL mode links duplicates within the window") {
    // inside the TTL window the bounded-state mode must behave exactly
    // like the unbounded default (wall-clock expiry is not
    // deterministically testable in-process; the eviction branch is a
    // state.remove() on hasTimedOut)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    // ProcessingTimeTimeout makes Spark re-batch continuously under the
    // default ASAP trigger (shouldRunAnotherBatch is always true) — a
    // trigger interval is REQUIRED with TTLs, here and in production
    val q = DocStreams.streamingDupMap(
      stream.toDF().toDF("doc_id", "text"),
      stateTtlMs = Some(30L * 60 * 1000))
      .writeStream.format("memory").queryName("dedup_ttl_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L))
      .outputMode("append").start()
    // processAllAvailable never settles under ProcessingTimeTimeout
    // (the engine always has another timeout sweep pending) — poll the
    // sink instead
    def awaitRows(n: Int): Array[org.apache.spark.sql.Row] = {
      val deadline = System.currentTimeMillis + 60000
      var rows = spark.table("dedup_ttl_test").collect()
      while (rows.length < n && System.currentTimeMillis < deadline) {
        Thread.sleep(200)
        rows = spark.table("dedup_ttl_test").collect()
      }
      rows
    }
    stream.addData((1L, "alpha beta"), (2L, "gamma"))
    assert(awaitRows(2).length == 2, "first batch must commit")
    stream.addData((3L, "ALPHA   beta")) // dup of 1, within TTL
    val got = awaitRows(3)
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    q.stop()
    assert(got.toSeq == Seq((1L, 1L, false), (2L, 2L, false),
      (3L, 1L, true)), got.toList.toString)
  }

  test("streaming minhash near-dup pairs == batch minhashDupPairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while rain " +
      "falls on the quiet village and children play near the old mill"
    val docs = Seq(
      (1L, base),
      (2L, base + " tonight"), // near-dup of 1
      (3L, "completely different content about spark catalyst plans " +
        "and whole stage code generation for columnar execution"),
      (4L, base + " tonight"), // exact dup of 2, near-dup of 1
      (5L, "unrelated short text"),
      (6L, "completely different content about spark catalyst plans " +
        "and whole stage code generation for columnar execution today"))
    val params = (3, 32, 8, 0.5) // n, numHashes, bands, threshold
    val batchDf = docs.toDF("doc_id", "text")
    val expected = graft.operators.Dedup.minhashDupPairs(batchDf, "doc_id",
      "text", n = params._1, numHashes = params._2, bands = params._3,
      threshold = params._4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    assert(expected.nonEmpty, "fixture must produce near-dup pairs")

    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.streamingMinhashDupPairs(
      stream.toDF().toDF("doc_id", "text"), n = params._1,
      numHashes = params._2, bands = params._3, threshold = params._4)
      .writeStream.format("memory").queryName("mh_stream_test")
      .outputMode("append").start()
    stream.addData(docs: _*)
    q.processAllAvailable()
    val got1 = spark.table("mh_stream_test").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    assert(got1 == expected, s"single-batch parity: $got1 vs $expected")

    // incremental: a late near-dup of doc 1 links against stored state,
    // and an exact repeat of doc 3's content pairs up too
    stream.addData((7L, base + " tonight"))
    q.processAllAvailable()
    val got2 = spark.table("mh_stream_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got2.contains((2L, 7L)) && got2.contains((4L, 7L)),
      s"late arrival must pair with stored members: $got2")
  }

  test("streaming minhash: bucket state freezes at the maxBucket cap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while rain " +
      "falls on the quiet village and children play near the old mill"
    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.streamingMinhashDupPairs(
      stream.toDF().toDF("doc_id", "text"), n = 3, numHashes = 32,
      bands = 8, threshold = 0.5, maxBucket = 2)
      .writeStream.format("memory").queryName("mh_cap_test")
      .outputMode("append").start()
    // three identical docs share every (band, bucket); with cap 2 the
    // third neither pairs nor joins the bucket
    stream.addData((1L, base), (2L, base), (3L, base))
    q.processAllAvailable()
    val got1 = spark.table("mh_cap_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got1 == Set((1L, 2L)),
      s"cap=2: only the first two members may pair: $got1")
    // past the cap the bucket is frozen across batches: an identical
    // late arrival must not emit or grow state
    stream.addData((4L, base))
    q.processAllAvailable()
    val got2 = spark.table("mh_cap_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got2 == got1, s"frozen bucket must not emit new pairs: $got2")
  }

  test("batch sessionization: gap splits sessions correctly") {
    import spark.implicits._
    // user 1: two sessions (gap 3600 > 1800); user 2: one session
    val rows = Seq(
      (1L, 1700000000000000000L, 1L, "click", 1.0),
      (2L, 1700000000000000000L + 600L * 1000000000L, 1L, "view", 2.0), // +600s
      (3L, 1700000000000000000L + 5000L * 1000000000L, 1L, "buy", 3.0), // +5000s -> new
      (4L, 1700000000000000000L, 2L, "click", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.sessionizeBatch(rows, gapSec = 1800)
      .orderBy("user_id", "start_sec").collect()
    assert(out.length == 3)
    assert(out(0).getLong(0) == 1L && out(0).getLong(3) == 2) // 2 events
    assert(out(1).getLong(0) == 1L && out(1).getLong(3) == 1)
    assert(out(2).getLong(0) == 2L && out(2).getLong(3) == 1)
  }

  test("streaming minhash: TTL mode pairs within the window") {
    // within the TTL window the bounded-bucket mode must behave exactly
    // like the unbounded default (wall-clock eviction itself is not
    // deterministically testable in-process; the eviction branch is a
    // state.remove() on hasTimedOut — same contract as the dedup map)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while rain " +
      "falls on the quiet village and children play near the old mill"
    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.streamingMinhashDupPairs(
      stream.toDF().toDF("doc_id", "text"), n = 3, numHashes = 32,
      bands = 8, threshold = 0.5, stateTtlMs = Some(30L * 60 * 1000))
      .writeStream.format("memory").queryName("mh_ttl_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L))
      .outputMode("append").start()
    // ProcessingTimeTimeout: poll the sink, never processAllAvailable
    def awaitRows(n: Int): Array[org.apache.spark.sql.Row] = {
      val deadline = System.currentTimeMillis + 60000
      var rows = spark.table("mh_ttl_test").collect()
      while (rows.length < n && System.currentTimeMillis < deadline) {
        Thread.sleep(200)
        rows = spark.table("mh_ttl_test").collect()
      }
      rows
    }
    stream.addData((1L, base), (2L, "completely unrelated words entirely"))
    stream.addData((3L, base + " tonight")) // near-dup of 1, within TTL
    val got = awaitRows(1).map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got.contains((1L, 3L)),
      s"near-dup within TTL must pair against stored bucket state: $got")
  }

  test("streaming model serving: batch-trained SLOPE scores a doc stream identically") {
    // train-batch / serve-stream: SlopeServe.predictions is a pure
    // projection (broadcast-free unrolled coefficient arithmetic), so
    // the SAME serving call runs unchanged on a streaming DataFrame in
    // append mode — no state, no watermark, per-row latency. Scores
    // must be BIT-identical to the batch pass over the same rows.
    import spark.implicits._
    import graft.functions.TextFunctions
    import graft.slope.{Slope, SlopeParams, SlopeServe}
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(43)
    val texts = (0L until 80L).map { i =>
      val good = "the quick brown fox jumps over the lazy dog and runs far"
      val bad = "ZZZZ 111 @@@@ ### !!!! 2222 XXXX"
      (i, if (rng.nextBoolean()) good + s" extra$i" else bad + s" $i")
    }
    def featurize(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      array(TextFunctions.punctRatio(col("text")),
        TextFunctions.stopwordRatio(col("text")),
        TextFunctions.digitRatio(col("text")),
        TextFunctions.meanWordLength(col("text"))).as("features"),
      (TextFunctions.qualityScore(col("text")) >= lit(0.5))
        .cast("double").as("label"))
    val batch = featurize(texts.toDF("doc_id", "text"))
    val m = Slope.fit(batch.select(col("features"), col("label")),
      "features", "label", SlopeParams(family = "binomial", nSigma = 5))
    def score(df: org.apache.spark.sql.DataFrame) =
      SlopeServe.predictions(m, featurize(df), "features", Seq("response"))
        .select(col("doc_id"),
          element_at(element_at(col("response"), m.nSteps), 1).as("p"))
    val expected = score(texts.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val stream = MemoryStream[(Long, String)]
    val q = score(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("serve_test")
      .outputMode("append").start()
    stream.addData(texts.take(40): _*)
    q.processAllAvailable()
    stream.addData(texts.drop(40): _*)
    q.processAllAvailable()
    val got = spark.table("serve_test").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    q.stop()
    assert(got.size == expected.size)
    expected.foreach { case (id, p) =>
      assert(java.lang.Double.doubleToRawLongBits(p) ==
        java.lang.Double.doubleToRawLongBits(got(id)),
        s"doc $id: stream ${got(id)} != batch $p")
    }
  }

  test("streaming lang-ID gate equals batch classify across batches, each doc once") {
    // train-batch / gate-stream: the NB classifier trains once on a
    // static labeled reference; arriving docs are classified via a
    // broadcast stream-static model join + per-doc state fold.
    // Quantized log-probs are INTEGERS, so the stream's fold is exact
    // and the argmax must equal the batch operator EXACTLY.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val vocabA = Vector("aaa", "aab", "abb")
    val vocabB = Vector("zzz", "zzy", "zyy")
    val ref = (1L to 40L).map { id =>
      val v = if (id % 2 == 0) vocabA else vocabB
      (id, Seq.fill(3 + rnd.nextInt(6))(v(rnd.nextInt(v.size))).mkString(" "),
        if (id % 2 == 0) "la" else "lb")
    }
    val crawl = (100L to 140L).map { id =>
      val v = if (id % 2 == 0) vocabA else vocabB
      (id, Seq.fill(2 + rnd.nextInt(7))(v(rnd.nextInt(v.size))).mkString(" "))
    } ++ Seq((141L, ""), (142L, "   "))
    // 141/142 are trigram-less: batch classify emits the prior-only
    // argmax for them, and the gate must too (r11 ADVICE — the inner
    // explode used to drop them from the stream entirely)
    val refDf = ref.toDF("doc_id", "text", "lang")
    val m = graft.operators.LangId.trainNb(refDf, "text", "lang")
    val expected = graft.operators.LangId.classify(
      crawl.toDF("doc_id", "text"), m, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.CacheRegistry.releaseAll()

    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.streamingLangIdGate(
      stream.toDF().toDF("doc_id", "text"), refDf)
      .writeStream.format("memory").queryName("langgate_test")
      .outputMode("update").start()
    stream.addData(crawl.take(20): _*)
    q.processAllAvailable()
    stream.addData(crawl.drop(20): _*)
    q.processAllAvailable()
    val got = spark.table("langgate_test").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    q.stop()
    graft.CacheRegistry.releaseAll()
    assert(got == expected, s"stream $got vs batch $expected")
    // each doc emitted exactly once (state removed in its own batch)
    assert(spark.table("langgate_test").count() == expected.size)
  }

  test("streaming semantic gate matches batch corpus flags across batches") {
    // encode-once ingestion gate: the corpus IVF+PQ keeper table is
    // static; arriving vectors probe it via a stream-static cell join.
    // Corpus matches must equal the batch operator's corpus stage
    // exactly (shared scoring kernel); stream-internal dups are out of
    // the gate's contract (documented) and read as new.
    import spark.implicits._
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    def vec(axis: Int, scale: Double = 1.0): Array[Double] = {
      val v = new Array[Double](8); v(axis) = scale; v
    }
    val corpus = Seq((1L, vec(0)), (2L, vec(2))).toDF("vec_id", "embedding")
    val arrivals = Seq(
      (100L, vec(0, 0.9)), (101L, vec(0)), // corpus near-dups of 1
      (102L, vec(4)), (103L, vec(4)),      // stream-internal pair: new
      (104L, vec(6)))                      // unique: new
      .toDF("vec_id", "embedding")
    val model = Similarity.trainSemanticIndex(corpus.unionByName(arrivals),
      "vec_id", "embedding", nLists = 2, m = 2, nCodes = 4)
    val idx = Similarity.semanticSignatureIndex(model, corpus,
      "vec_id", "embedding")
    // batch corpus stage = the expectation for corpus matches
    val batch = Similarity.incrementalSemanticFlags(model, idx, arrivals,
      "vec_id", "embedding", nProbe = 2, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    graft.CacheRegistry.releaseAll()

    val stream = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.DocStreams.streamingSemanticGate(
      stream.toDF().toDF("vec_id", "embedding"), model, idx,
      nProbe = 2, threshold = 0.5)
      .writeStream.format("memory").queryName("semgate_test")
      .outputMode("update").start()
    val rows = Seq(100L, 101L, 102L, 103L, 104L).map(id =>
      id -> (if (id <= 101L) (if (id == 100L) vec(0, 0.9) else vec(0))
             else if (id <= 103L) vec(4) else vec(6)).toSeq)
    stream.addData(rows.take(3): _*)
    q.processAllAvailable()
    stream.addData(rows.drop(3): _*)
    q.processAllAvailable()
    val got = spark.table("semgate_test").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getDouble(3))))
      .toMap
    q.stop()
    graft.CacheRegistry.releaseAll()
    // corpus matches: identical canonical AND bit-identical score
    Seq(100L, 101L).foreach { id =>
      assert(batch(id)._1 == "near_dup_of_corpus")
      assert(got(id) == ((true, batch(id)._2, batch(id)._3)),
        s"$id: ${got(id)} vs batch ${batch(id)}")
    }
    // stream-internal pair + unique vector: new under the gate's
    // corpus-only contract (batch flags 103 near_dup_in_batch)
    Seq(102L, 103L, 104L).foreach { id =>
      assert(got(id) == ((false, id, 0.0)), s"$id: ${got(id)}")
    }
    assert(spark.table("semgate_test").count() == 5, "one emission per vector")
  }

  test("streaming semantic gate emits novel-direction vectors whose probe cells are empty") {
    // r11 ADVICE (medium): with an inner stream-static join, a vector
    // whose nProbe probe cells hold NO corpus rows produced zero joined
    // rows and was silently dropped — violating the one-row-per-vector
    // contract. The left_outer join must surface it as
    // (id, false, id, 0.0). Construction: the quantizer is trained on
    // spread-out directions so it has >2 populated cells, but only TWO
    // corpus vectors are indexed; a probe with nProbe=1 toward an
    // unindexed direction lands in a cell with no corpus rows.
    import spark.implicits._
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    def vec(axis: Int): Array[Double] = {
      val v = new Array[Double](8); v(axis) = 1.0; v
    }
    val trainAll = Seq((1L, vec(0)), (2L, vec(2)), (3L, vec(4)),
      (4L, vec(6))).toDF("vec_id", "embedding")
    val model = Similarity.trainSemanticIndex(trainAll, "vec_id",
      "embedding", nLists = 4, m = 2, nCodes = 4)
    val corpus = Seq((1L, vec(0)), (2L, vec(2))).toDF("vec_id", "embedding")
    val idx = Similarity.semanticSignatureIndex(model, corpus,
      "vec_id", "embedding")
    // pick an arrival direction whose single probe cell has no corpus
    // rows (vec(4) or vec(6) — whichever cell is unpopulated; assert
    // the construction really produced an empty probe first)
    val cells = idx.select("cell").collect().map(_.getInt(0)).toSet
    val novel = Seq(vec(4), vec(6)).find { v =>
      !cells.contains(Similarity.probeCells(model, v, 1)(0))
    }
    assert(novel.isDefined, "construction must yield an empty probe cell")
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.DocStreams.streamingSemanticGate(
      stream.toDF().toDF("vec_id", "embedding"), model, idx,
      nProbe = 1, threshold = 0.5)
      .writeStream.format("memory").queryName("semgate_novel_test")
      .outputMode("update").start()
    stream.addData(Seq(200L -> novel.get.toSeq, 201L -> vec(0).toSeq): _*)
    q.processAllAvailable()
    val got = spark.table("semgate_novel_test").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getDouble(3))))
      .toMap
    q.stop()
    graft.CacheRegistry.releaseAll()
    assert(got(200L) == ((false, 200L, 0.0)),
      s"novel vector must be emitted as new, got ${got.get(200L)}")
    assert(got(201L)._1, "the corpus near-dup still matches")
    assert(got.size == 2, "one emission per vector, none dropped")
  }

  test("streaming LM gate equals the batch external-mode gate across batches") {
    // pretrain-batch / gate-stream: the CCNet ingest filter. The LM is
    // built from a static reference corpus; arriving docs are scored
    // via stream-static joins with live backoff + OOV floor, one
    // result row per doc, zero retained state. Must equal the batch
    // external-mode operator doc-for-doc (fp addition order differs —
    // stream sums per group in iterator order, batch uses avg() —
    // so ~1e-12 relative, not bit equality).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val refVocab = Vector("alpha", "beta", "gamma", "delta", "zed", "the")
    val refDocs = (1L to 40L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(10))(refVocab(rnd.nextInt(refVocab.size)))
        .mkString(" ")
    }
    val crawlVocab = refVocab ++ Vector("qqq", "zzz9")
    val crawl = (100L to 160L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(9))(crawlVocab(rnd.nextInt(crawlVocab.size)))
        .mkString(" ")
    }
    val refDf = refDocs.toDF("doc_id", "text")
    val expected = graft.operators.LanguageModel
      .ngramPseudoPerplexity(crawl.toDF("doc_id", "text"), "doc_id",
        "text", 3, modelDocs = Some(refDf))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.streamingLmGate(
      stream.toDF().toDF("doc_id", "text"), refDf, order = 3)
      .writeStream.format("memory").queryName("lmgate_test")
      .outputMode("update").start()
    stream.addData(crawl.take(30): _*)
    q.processAllAvailable()
    stream.addData(crawl.drop(30): _*)
    q.processAllAvailable()
    val got = spark.table("lmgate_test").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    q.stop()
    graft.CacheRegistry.releaseAll()
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (n, p)) =>
      assert(got(id)._1 == n, s"doc $id n_words: ${got(id)._1} != $n")
      assert(math.abs(got(id)._2 - p) <= 1e-12 * math.max(1.0, p),
        s"doc $id: stream ${got(id)._2} != batch $p")
    }
    // each doc emitted exactly once (state removed in its own batch)
    assert(spark.table("lmgate_test").count() == expected.size)
  }

  test("streaming DSIR gate: an empty target corpus is lawful (uniform prior, finite weights)") {
    // the scaladoc claim behind the coalesce(sum, 0) totals: with no
    // target docs every bucket's target term is ln(1) - ln(0 + B),
    // so log_w = sum over features of [-ln(B) - ln(cr_b + 1) +
    // ln(Nr + B)] — finite, exactly computable, never null/NaN
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val raw = Seq(1L -> "a b", 2L -> "b a b").toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val B = 32
    def bucket(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % B
    }
    // doc1 "a b": uni a, b + bigram; doc2 "b a b": uni b, a, b +
    // two bigrams -> 8 features total
    val rawB = Seq("a", "b", "a\u0001b",
      "b", "a", "b", "b\u0001a", "a\u0001b").map(bucket)
    val cr = rawB.groupBy(identity).view.mapValues(_.size).toMap
    def lam(b: Long) = math.log(1.0) - math.log(0 + B.toDouble) -
      math.log(cr.getOrElse(b, 0) + 1.0) + math.log(rawB.size + B.toDouble)
    val doc = 7L -> "a b"
    val want = Seq("a", "b", "a\u0001b").map(g => lam(bucket(g))).sum

    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.streamingDsirGate(
      stream.toDF().toDF("doc_id", "text"), raw, empty, buckets = B)
      .writeStream.format("memory").queryName("dsir_empty_test")
      .outputMode("update").start()
    stream.addData(doc)
    q.processAllAvailable()
    val got = spark.table("dsir_empty_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    graft.CacheRegistry.releaseAll()
    assert(got.length == 1 && got(0)._1 == 7L && got(0)._2 == 3L, got.toList)
    assert(!got(0)._3.isNaN && math.abs(got(0)._3 - want) <=
      1e-12 * math.max(1.0, want.abs),
      s"empty-target weight: ${got(0)._3} vs $want")
  }

  test("streaming Moore-Lewis gate: ce_in/ce_out equal the two batch external-mode gates") {
    // Both model sets static (in-domain + general pool), the stream
    // is neither — backoff live on both sides. Each side must equal
    // ln(ppl) of the batch external-mode operator against that model
    // corpus, doc-for-doc (fp fold order differs — ~1e-12 relative).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val vocabIn = Vector("alpha", "beta", "gamma", "delta", "the")
    val vocabPool = Vector("alpha", "rocket", "engine", "pump", "the")
    def mk(id: Long, v: Vector[String], n: Int) =
      id -> Seq.fill(n)(v(rnd.nextInt(v.size))).mkString(" ")
    val inDocs = (1L to 30L).map(i => mk(i, vocabIn, 2 + rnd.nextInt(8)))
    val poolDocs = (50L to 90L).map(i => mk(i, vocabPool, 2 + rnd.nextInt(8)))
    // the crawl mixes both vocabularies plus words NEITHER corpus saw
    val crawl = (100L to 140L).map(i =>
      mk(i, vocabIn ++ vocabPool ++ Vector("qqq", "zzz9"), 2 + rnd.nextInt(8)))
    val inDf = inDocs.toDF("doc_id", "text")
    val poolDf = poolDocs.toDF("doc_id", "text")
    val crawlDf = crawl.toDF("doc_id", "text")
    val lm = graft.operators.LanguageModel
    def batchCe(model: org.apache.spark.sql.DataFrame) =
      lm.ngramPseudoPerplexity(crawlDf, "doc_id", "text", 3,
          modelDocs = Some(model))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), math.log(r.getDouble(2)))).toMap
    val wantIn = batchCe(inDf)
    val wantOut = batchCe(poolDf)

    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.streamingCeDiffGate(
      stream.toDF().toDF("doc_id", "text"), inDf, poolDf)
      .writeStream.format("memory").queryName("cediff_gate_test")
      .outputMode("update").start()
    stream.addData(crawl.take(20): _*)
    q.processAllAvailable()
    stream.addData(crawl.drop(20): _*)
    q.processAllAvailable()
    val got = spark.table("cediff_gate_test").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    q.stop()
    graft.CacheRegistry.releaseAll()
    assert(got.keySet == wantIn.keySet)
    got.foreach { case (id, (n, ceIn, ceOut, ceDiff)) =>
      assert(n == wantIn(id)._1, s"doc $id n_words")
      assert(math.abs(ceIn - wantIn(id)._2) <=
        1e-12 * math.max(1.0, wantIn(id)._2.abs),
        s"doc $id ce_in: $ceIn vs ${wantIn(id)._2}")
      assert(math.abs(ceOut - wantOut(id)._2) <=
        1e-12 * math.max(1.0, wantOut(id)._2.abs),
        s"doc $id ce_out: $ceOut vs ${wantOut(id)._2}")
      assert(math.abs(ceDiff - (ceIn - ceOut)) <= 1e-12)
    }
    // one emission per doc
    assert(spark.table("cediff_gate_test").count() == wantIn.size)
  }

  test("streaming DSIR gate equals batch weights; unseen buckets score the full-domain λ") {
    // λ trained once on static raw+target corpora; the stream scored
    // per micro-batch via the broadcast full-domain λ. Docs whose
    // buckets are raw-observed must equal Sampling.dsirWeights
    // doc-for-doc (fp order differs — ~1e-12 relative); a doc with
    // vocabulary neither corpus saw must score the add-one-smoothed
    // unseen-bucket value, not drop or NaN.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val vocabIn = Vector("alpha", "beta", "gamma", "delta", "the")
    val vocabOut = Vector("rocket", "engine", "turbo", "pump", "the")
    def mk(id: Long, v: Vector[String], n: Int) =
      id -> Seq.fill(n)(v(rnd.nextInt(v.size))).mkString(" ")
    val inDocs = (1L to 15L).map(i => mk(i, vocabIn, 2 + rnd.nextInt(8)))
    val outDocs = (100L to 114L).map(i => mk(i, vocabOut, 2 + rnd.nextInt(8)))
    val crawl = inDocs ++ outDocs
    val rawDf = crawl.toDF("doc_id", "text")
    val targetDf = inDocs.toDF("doc_id", "text")
    val B = 64
    val expected = graft.operators.Sampling
      .dsirWeights(rawDf, "doc_id", "text", targetDf, buckets = B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // the unseen-vocab doc: "qqq zzz9" -> 2 unigrams + 1 bigram; its
    // expected weight from the full-domain formula, accounting for
    // possible collisions into observed buckets at B=64
    def bucket(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % B
    }
    def gramBuckets(t: String): Seq[Long] = {
      val ws = t.split(" ").toSeq
      (ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString("\u0001")))
        .map(bucket)
    }
    def norm(s: String) = s.toLowerCase.replaceAll("[^a-z0-9]", " ")
      .replaceAll(" +", " ").trim.split(" ").toSeq.filter(_.nonEmpty)
    val poolB = crawl.flatMap(d =>
      gramBuckets(norm(d._2).mkString(" ")))
    val tgtB = inDocs.flatMap(d => gramBuckets(norm(d._2).mkString(" ")))
    val cr = poolB.groupBy(identity).view.mapValues(_.size).toMap
    val ct = tgtB.groupBy(identity).view.mapValues(_.size).toMap
    def lam(b: Long) =
      math.log(ct.getOrElse(b, 0) + 1.0) - math.log(tgtB.size + B.toDouble) -
        math.log(cr.getOrElse(b, 0) + 1.0) + math.log(poolB.size + B.toDouble)
    val novel = 999L -> "qqq zzz9"
    val novelWant = gramBuckets(novel._2).map(lam).sum

    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.streamingDsirGate(
      stream.toDF().toDF("doc_id", "text"), rawDf, targetDf, buckets = B)
      .writeStream.format("memory").queryName("dsir_gate_test")
      .outputMode("update").start()
    stream.addData(crawl.take(18): _*)
    q.processAllAvailable()
    stream.addData((crawl.drop(18) :+ novel): _*)
    q.processAllAvailable()
    val got = spark.table("dsir_gate_test").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    q.stop()
    graft.CacheRegistry.releaseAll()
    assert(got.keySet == expected.keySet + novel._1)
    expected.foreach { case (id, (n, w)) =>
      assert(got(id)._1 == n, s"doc $id n_feats: ${got(id)._1} != $n")
      assert(math.abs(got(id)._2 - w) <= 1e-12 * math.max(1.0, w.abs),
        s"doc $id: stream ${got(id)._2} != batch $w")
    }
    assert(got(novel._1)._1 == 3, "novel doc: 2 unigrams + 1 bigram")
    assert(math.abs(got(novel._1)._2 - novelWant) <=
      1e-12 * math.max(1.0, novelWant.abs),
      s"novel doc: ${got(novel._1)._2} != $novelWant")
    // each doc emitted exactly once (state removed in its own batch)
    assert(spark.table("dsir_gate_test").count() == expected.size + 1)
  }

  test("streaming token counts: complete-mode aggregation equals batch across batches") {
    // corpus heavy-hitter counting as a stream: one keyed aggregation
    // (state = one row per distinct token) in complete output mode —
    // the streaming face of CorpusStats.tokenOccurrences. Counts after
    // two micro-batches must equal one batch pass over the union.
    import spark.implicits._
    import graft.operators.CorpusStats
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "alpha beta beta gamma"), (2L, "alpha ALPHA delta"),
      (3L, "beta gamma gamma zeta"), (4L, ""), (5L, "Alpha, beta!"))
    val expected = CorpusStats.tokenOccurrences(
      docs.toDF("doc_id", "text"), "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val stream = MemoryStream[(Long, String)]
    val q = CorpusStats.tokenOccurrences(
      stream.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("tok_test")
      .outputMode(OutputModeComplete.mode).start()
    stream.addData(docs.take(2): _*)
    q.processAllAvailable()
    stream.addData(docs.drop(2): _*)
    q.processAllAvailable()
    val got = spark.table("tok_test").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(got == expected, s"stream $got vs batch $expected")
  }

  test("streaming token counts with doc frequency equal batch tokenCounts") {
    // the flatMapGroupsWithState replacement for the unsupported
    // chained streaming aggregation: per-token (occurrences, doc
    // frequency) state, batch-side per-doc dedup inside the group
    // function. Counts are monotone, so max per token over the update
    // stream equals the final state — compared against the batch
    // tokenCounts oracle over the same corpus, split across batches.
    import spark.implicits._
    import graft.operators.CorpusStats
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "alpha beta beta gamma"), (2L, "alpha ALPHA delta"),
      (3L, "beta gamma gamma zeta"), (4L, ""), (5L, "Alpha, beta!"))
    val expected = CorpusStats.tokenCounts(
      docs.toDF("doc_id", "text"), "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.streamingTokenCounts(
      stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("tokdf_test")
      .outputMode("update").start()
    stream.addData(docs.take(2): _*)
    q.processAllAvailable()
    stream.addData(docs.drop(2): _*)
    q.processAllAvailable()
    val got = spark.table("tokdf_test")
      .groupBy("token")
      .agg(org.apache.spark.sql.functions.max("n_occurrences").as("o"),
        org.apache.spark.sql.functions.max("n_docs").as("d"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    q.stop()
    assert(got == expected, s"stream $got vs batch $expected")
    // cross-batch accumulation actually happened (alpha spans batches)
    assert(got("alpha") == ((4L, 3L)))
    assert(got("beta") == ((4L, 3L)))
  }

  test("streaming image dedup: two-batch pairs equal the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mm = graft.multimodal.Multimodal
    val ids = 0L until 30L
    def png(i: Long): Array[Byte] =
      if (i >= 1000) mm.syntheticPngContrast(i - 1000) else mm.syntheticPngId(i)
    val variantIds = ids.filter(_ % 5 == 0).map(_ + 1000)
    val allIds = ids ++ variantIds
    val batchDf = allIds.map(i => (i, png(i))).toDF("media_id", "payload")
    val expected = mm.imageDupPairs(batchDf, "media_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(expected.nonEmpty)

    val stream = MemoryStream[(Long, Array[Byte])]
    val q = DocStreams.streamingImageDupPairs(
      stream.toDF().toDF("media_id", "payload"))
      .writeStream.format("memory").queryName("img_dup_stream")
      .outputMode("append").start()
    // bases in batch one, contrast variants in batch two: every
    // planted pair must link across the batch boundary via state
    stream.addData(ids.map(i => (i, png(i))): _*)
    q.processAllAvailable()
    stream.addData(variantIds.map(i => (i, png(i))): _*)
    q.processAllAvailable()
    // re-ingest one id: must be silent (pairs already emitted)
    stream.addData((0L, png(0L)))
    q.processAllAvailable()
    val got = spark.table("img_dup_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    q.stop()
    assert(got.length == got.toSet.size, s"exactly-once: ${got.length}")
    assert(got.toSet == expected,
      s"stream ${got.toSet.size} pairs vs batch ${expected.size}")
  }

  test("streaming hamming dedup: a full bucket admits nothing — no re-emission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val q = DocStreams.streamingHamming64DupPairs(
      stream.toDF().toDF("id", "fp"), maxBucket = 2)
      .writeStream.format("memory").queryName("ham_full_bucket")
      .outputMode("append").start()
    // batch 1: ids 1,2 share every band bucket -> pair (1,2); every
    // bucket of fp=42 is now at the cap
    stream.addData((1L, 42L), (2L, 42L))
    q.processAllAvailable()
    // batch 2: id 3, same fp — bucket full: must NOT emit. It cannot
    // be STORED, and an emitted-but-unstored member would re-emit its
    // pairs whenever the id is re-ingested (the exactly-once contract)
    stream.addData((3L, 42L))
    q.processAllAvailable()
    // batch 3: id 3 re-ingested — still silent
    stream.addData((3L, 42L))
    q.processAllAvailable()
    val got = spark.table("ham_full_bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    q.stop()
    assert(got == Seq((1L, 2L, 0)), s"full bucket must stay silent: $got")
  }

  test("streaming pack: emitted sequences equal the one-shot batch pack") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic per-word ids (word length) so parity is id-exact
    val ids: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => transform(split(trim(c), " +"), w => length(w).cast("int"))
    val triggers = Seq(
      Seq((1L, "a bb ccc"), (2L, "dddd e")),
      Seq((3L, "ff ggg hh i"), (4L, "jj")),
      Seq((5L, "kkkk llll m nn ooo")))
    val all = triggers.flatten.toDF("doc_id", "text")
    val expectedAll = graft.operators.Packing
      .packTokenSequences(all, "doc_id", "text", 4, ids)
      .orderBy("seq_id").collect()
      .map(r => (r.getAs[Long]("seq_id"),
        r.getAs[scala.collection.Seq[Int]]("input_ids").toSeq))
    val expectedFull = expectedAll.filter(_._2.length == 4)
    val expectedTail = expectedAll.filterNot(_._2.length == 4)

    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[Int])]
    val stream = MemoryStream[(Long, String)]
    val (writer, ps) = DocStreams.streamingPack(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", 4, ids,
      emit = df => emitted.synchronized {
        emitted ++= df.orderBy("seq_id").collect()
          .map(r => (r.getAs[Long]("seq_id"),
            r.getAs[scala.collection.Seq[Int]]("input_ids").toSeq))
      })
    val q = writer.start()
    triggers.foreach { t => stream.addData(t: _*); q.processAllAvailable() }
    q.stop()
    // completed sequences: exactly the batch pack's full rows, each
    // emitted once, in order
    assert(emitted.toSeq == expectedFull.toSeq,
      s"stream ${emitted.size} vs batch ${expectedFull.length}")
    // the flush tail is the batch pack's partial final sequence
    assert(ps.flush().toSeq == expectedTail.flatMap(_._2).toSeq)
    assert(ps.state.total == expectedAll.map(_._2.length).sum)
  }

  test("streaming pack: an empty trigger never restarts the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ids drop zero-length words, so an empty-text doc packs NOTHING
    val ids: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => filter(
        transform(split(trim(c), " +"), w => length(w).cast("int")),
        x => x > 0)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stream = MemoryStream[(Long, String)]
    val (writer, ps) = DocStreams.streamingPack(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", 4, ids,
      emit = df => emitted.synchronized {
        emitted ++= df.collect().map(_.getAs[Long]("seq_id")) })
    val q = writer.start()
    // trigger 1: exactly one full sequence -> empty carry, total 4
    stream.addData((1L, "a bb c d")); q.processAllAvailable()
    assert(ps.state.total == 4L && ps.flush().isEmpty)
    // trigger 2: zero-token doc -> packs nothing. The state must NOT
    // reset to zero (the empty-frame packState pitfall)
    stream.addData((2L, "")); q.processAllAvailable()
    assert(ps.state.total == 4L, s"state reset by empty trigger: ${ps.state}")
    // trigger 3: two more tokens -> partial seq 1, nothing emitted yet
    stream.addData((3L, "x yy")); q.processAllAvailable()
    q.stop()
    assert(ps.state.total == 6L)
    assert(ps.flush().toSeq == Seq(1, 2))
    assert(emitted.toSeq == Seq(0L))
  }

  test("streaming pack: ALL six columns equal the batch pack at every trigger, through a carry-straddling boundary (r13 ask #8)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ids: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => transform(split(trim(c), " +"), w => length(w).cast("int"))
    // seqLen 8; trigger 1 packs 5 tokens over TWO documents (no emit —
    // the carry holds two doc spans); trigger 2 completes the boundary
    // sequence, which must reassemble with THREE doc_spans (two carried
    // + the new doc) — the carry-fusion bug class as a standing
    // streaming assertion
    val triggers = Seq(
      Seq((1L, "a bb"), (2L, "c dd eee")),
      Seq((3L, "f gg hhh iiii jjjjj kkkkkk")),
      Seq((4L, "l mm nnn oooo ppppp qqqqqq rrrrrrr ssssssss ttttttttt")))
    val all = triggers.flatten.toDF("doc_id", "text")
    val expected = graft.operators.Packing
      .packTokenSequences(all, "doc_id", "text", 8, ids)
      .filter(col("n_tokens") === 8)
      .orderBy("seq_id").collect()
      .map(r => (r.getAs[Long]("seq_id"),
        r.getAs[scala.collection.Seq[Int]]("input_ids").toSeq,
        r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_docs"),
        r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("doc_spans")
          .map(s => (s.getInt(0), s.getInt(1))).toSeq,
        r.getAs[scala.collection.Seq[Int]]("loss_mask").toSeq))
    // DEFERRED consumption (r13 ADVICE #1): store the frames, collect
    // only after the stream stops — the eager localCheckpoint must
    // make that safe (no recompute of a dead micro-batch plan)
    val frames = scala.collection.mutable
      .ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    val stream = MemoryStream[(Long, String)]
    val (writer, ps) = DocStreams.streamingPack(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", 8, ids,
      emit = df => frames.synchronized { frames += df })
    val q = writer.start()
    triggers.foreach { t => stream.addData(t: _*); q.processAllAvailable() }
    q.stop()
    val got = frames.flatMap(_.orderBy("seq_id").collect())
      .map(r => (r.getAs[Long]("seq_id"),
        r.getAs[scala.collection.Seq[Int]]("input_ids").toSeq,
        r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_docs"),
        r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("doc_spans")
          .map(s => (s.getInt(0), s.getInt(1))).toSeq,
        r.getAs[scala.collection.Seq[Int]]("loss_mask").toSeq))
    assert(got.toSeq == expected.toSeq,
      s"stream\n  ${got.mkString("\n  ")}\nvs batch\n  ${expected.mkString("\n  ")}")
    // the boundary sequence really did straddle: its spans fuse two
    // carried documents plus the completing one
    val boundary = got.head
    assert(boundary._4 == 3L && boundary._5 == Seq((0, 2), (2, 5), (5, 8)),
      s"carry must splice per-document spans: $boundary")
    // flush tail = the batch pack's partial remainder
    assert(ps.state.total == 20L && ps.flush().length == 4)
  }
}

/** Small indirection so the streaming test compiles without importing
  * OutputMode at top level in multiple places. */
object OutputModeComplete {
  val mode: org.apache.spark.sql.streaming.OutputMode =
    org.apache.spark.sql.streaming.OutputMode.Complete()
}
