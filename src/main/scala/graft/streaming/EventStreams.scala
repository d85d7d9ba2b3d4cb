package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, StreamingQueryListener}

/** Structured-Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Each transform is defined once and applies to BOTH a batch
  * DataFrame and a readStream DataFrame (identical logical plans —
  * the streaming runner adds watermark-driven state cleanup). That is
  * the contract that keeps the batch oracle (`q_events_window`)
  * authoritative for the streaming path.
  */
object EventStreams {

  /** Tumbling-window per-type aggregation; on a stream, `withWatermark`
    * bounds state. `ts` may be a timestamp or long nanos
    * (nanosAsLong reads). */
  def windowedTypeCounts(events: DataFrame, windowLen: String = "1 hour",
                         watermark: String = "2 hours"): DataFrame = {
    val tsCol = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_seconds(expr("ts div 1000000000"))
      case _ => col("ts")
    }
    val base = events.withColumn("__ts", tsCol)
    val withWm =
      if (base.isStreaming) base.withWatermark("__ts", watermark) else base
    withWm
      .groupBy(window(col("__ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        avg(col("value")).as("avg_value"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("avg_value"), col("sum_value"))
  }

  case class SessionState(start: Long, last: Long, n: Int, sumValue: Double)
  case class SessionOut(userId: Long, startSec: Long, endSec: Long,
                        nEvents: Int, sumValue: Double)

  /** Gap-based sessionization with `mapGroupsWithState`-style custom
    * state (the KeyValueGroupedDataset path for stateful stream logic).
    * Batch variant: same gap semantics computed with window functions —
    * used as the oracle for the streaming run in tests. */
  def sessionizeBatch(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tsSec = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _ => unix_timestamp(col("ts"))
    }
    val w = Window.partitionBy("user_id").orderBy("sec")
    events.select(col("user_id"), tsSec.as("sec"), col("value"))
      .withColumn("prev", lag("sec", 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("sec") - col("prev") > gapSec, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("sec").as("start_sec"), max("sec").as("end_sec"),
        count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .drop("session_id")
  }

  /** Streaming sessionization via typed state
    * (`flatMapGroupsWithState` + event-time timeout): events extend or
    * split the per-user session by the same gap rule as
    * [[sessionizeBatch]]; a session is emitted exactly once — either
    * when a later event for the same user lands past the gap, or when
    * the WATERMARK passes `last + gap` (inactivity flush; state
    * removed). Event-time timeouts keep micro-batches data-driven
    * (a processing-time timeout would schedule continuous batches). */
  def sessionizeStream(events: DataFrame, gapSec: Long = 1800,
                       watermarkDelay: String = "10 seconds"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val tsSec = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _ => unix_timestamp(col("ts"))
    }
    val withTs = events.select(col("user_id").as("userId"), tsSec.as("sec"),
      col("value"), timestamp_seconds(tsSec).as("__ts"))
    val wm =
      if (withTs.isStreaming) withTs.withWatermark("__ts", watermarkDelay)
      else withTs
    // the watermark column must flow into the typed dataset — projecting
    // it away disables event-time timeouts
    val typed = wm.select(col("userId"), col("sec"), col("value"), col("__ts"))
      .as[(Long, Long, Double, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(SessionOut(uid, st.start, st.last, st.n, st.sumValue))
          } else {
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var st = state.getOption.orNull
            rows.toSeq.sortBy(_._2).foreach { case (_, sec, v, _) =>
              if (st == null) st = SessionState(sec, sec, 1, v)
              else if (sec - st.last > gapSec) {
                out += SessionOut(uid, st.start, st.last, st.n, st.sumValue)
                st = SessionState(sec, sec, 1, v)
              } else st = SessionState(st.start, math.max(st.last, sec),
                st.n + 1, st.sumValue + v)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp((st.last + gapSec) * 1000)
            }
            out.iterator
          }
      }.toDF()
  }

  /** Stream-STREAM interval join (the attribution shape: every
    * `clickType` event joined to the same user's `viewType` events in
    * the preceding `windowSec` seconds) — the one Structured-Streaming
    * join class with state on BOTH sides. Defined once for batch and
    * stream like every operator here; on a stream both branches carry
    * a watermark and the time-bound join condition, which is exactly
    * what lets the engine expire join state: a buffered view can be
    * dropped once the click-side watermark passes `v_ts + windowSec`,
    * so state is bounded by (event rate × window), never by the
    * stream's history.
    *
    * 100-TB/continuous shape: both sides shuffle ONCE on `user_id`
    * (the equi-key Spark extracts from the condition); the range
    * predicate evaluates inside the per-key state store. Self-joins
    * of one source stream are supported — the two sides are filtered
    * branches of the same `readStream`. Output: one row per
    * (click, qualifying view) pair with the attribution lag. */
  def attributionJoin(events: DataFrame, viewType: String = "view",
                      clickType: String = "click",
                      windowSec: Long = 14400,
                      watermark: String = "1 hour"): DataFrame = {
    // long-nanos reads keep MICROsecond precision (timestamp_micros,
    // not whole-second truncation): join membership at the window
    // boundary must match the native-timestamp branch and the oracle's
    // full-precision interval compare — flooring to seconds here would
    // admit pairs the raw timestamps exclude
    val tsCol = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: `/` is double division in Spark and epoch
        // nanos (~1.7e18) exceed 2^53, so the quotient could truncate
        // 1 µs low and flip window-boundary membership
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts")
    }
    val base = events.withColumn("__ts", tsCol)
    val v0 = base.filter(col("event_type") === viewType)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("__ts").as("v_ts"))
    val c0 = base.filter(col("event_type") === clickType)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("__ts").as("c_ts"), col("value").as("click_value"))
    val (v, c) =
      if (events.isStreaming)
        (v0.withWatermark("v_ts", watermark), c0.withWatermark("c_ts", watermark))
      else (v0, c0)
    c.join(v, col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("c_ts") <= col("v_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("click_id"), col("view_id"), col("c_user").as("user_id"),
        (unix_timestamp(col("c_ts")) - unix_timestamp(col("v_ts")))
          .as("lag_sec"),
        col("click_value"))
  }

  /** Late-row accounting for a watermarked query (r9 VERDICT #8):
    * total input rows the engine DROPPED for arriving behind the
    * watermark, summed across the query's stateful operators and its
    * retained progress updates. Structured Streaming drops such rows
    * silently inside the stateful operator; this surfaces the count
    * so an ingestion pipeline can alert on late-data loss instead of
    * discovering it in a reconciliation audit. Reads the query's
    * progress ring (default retention 100 updates) — correct for
    * tests and short jobs; attach a [[LateDataListener]] for
    * long-running queries whose ring rolls over. */
  def rowsDroppedLate(q: StreamingQuery): Long =
    q.recentProgress.iterator
      .flatMap(_.stateOperators.iterator.map(_.numRowsDroppedByWatermark))
      .sum

  /** Cumulative late-row accounting across a session's queries via a
    * `StreamingQueryListener` — unlike the progress ring this never
    * loses updates, the right mechanism for a production pipeline.
    * Register with `spark.streams.addListener(listener)`; progress
    * events arrive ASYNCHRONOUSLY, so tests must poll
    * [[LateDataListener.totalDropped]], not read it right after
    * `processAllAvailable()`. */
  final class LateDataListener extends StreamingQueryListener {
    private val dropped =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      // per-batch deltas: StateOperatorProgress metrics are per update
      val d = e.progress.stateOperators.iterator
        .map(_.numRowsDroppedByWatermark).sum
      if (d > 0) dropped.merge(e.progress.id, d,
        (a, b) => java.lang.Long.valueOf(a + b))
    }
    def droppedFor(id: java.util.UUID): Long =
      Option(dropped.get(id)).map(_.longValue).getOrElse(0L)
    def totalDropped: Long = {
      var s = 0L
      dropped.values.forEach(v => s += v)
      s
    }
  }
}
