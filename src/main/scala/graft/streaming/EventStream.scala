package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine. The reference is a bounded
  * batch job (SURVEY.md §2.5 — its "streaming" is lazy pipelining), so this
  * module is the forward-looking extension: the same transforms run on
  * `readStream` sources with watermarked event-time state.
  *
  * All functions accept either batch or streaming DataFrames — the logical
  * plan is identical; only the sink differs.
  */
object EventStream {

  /** Event rows as produced by the fixtures: `ts` is BIGINT nanoseconds
    * (GraftSession reads INT64 TIMESTAMP(NANOS) as long).
    */
  case class Event(event_id: Long, ts: Long, user_id: Long,
                   event_type: String, value: Double)

  case class UserRunningStats(user_id: Long, n_events: Long, total_value: Double)

  /** Nanos → TIMESTAMP for event-time semantics. Integer division: `/` on
    * longs is DOUBLE division in Spark, and epoch-nanos (~1.7e18) exceed
    * double's 2^53 exact range — a float path could mis-bucket events at
    * window boundaries relative to the pure-integer batch twin (q14).
    */
  def eventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling event-time window aggregate with a watermark: the streaming
    * twin of the batch q14 query. Late data beyond `lateness` is dropped;
    * state is bounded by the watermark — the 100 TB streaming requirement.
    */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     lateness: String = "2 hours"): DataFrame =
    eventTime(events)
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_val"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("cnt"), col("sum_val"))

  /** Windowed approximate distinct users: HLL++ as streaming state. A
    * sketch is the natural incremental aggregation state — fixed size per
    * (window, type) group no matter how many distinct users pass through,
    * and mergeable across micro-batches exactly like `sum`'s partial —
    * where exact distinct would hold every user id in state forever.
    */
  def windowedDistinctUsers(events: DataFrame,
                            windowLen: String = "1 hour",
                            lateness: String = "2 hours",
                            rsd: Double = 0.02): DataFrame =
    eventTime(events)
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(approx_count_distinct("user_id", rsd).as("approx_users"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("approx_users"))

  /** Windowed count-min frequency sketch as STREAMING state: the same
    * sparse `(window, row, bucket, cnt)` linear-counter encoding as the
    * batch [[graft.ops.Sketch.cmsBuild]], maintained incrementally —
    * per-window state is bounded by d·w counters whatever the event
    * rate, and watermark expiry drops whole windows. A reader estimates
    * any item's windowed frequency with the batch `cmsEstimate` over
    * this table; counters are linear, so windows also roll up to
    * coarser grains by re-summing (no replay).
    */
  def windowedCms(events: DataFrame, itemCol: String,
                  windowLen: String = "1 hour", lateness: String = "2 hours",
                  w: Int = 1024, d: Int = 4): DataFrame =
    eventTime(events)
      .select(col("event_time"), col(itemCol).cast("string").as("_v"))
      .where(col("_v").isNotNull)
      .withWatermark("event_time", lateness)
      .select(col("event_time"), col("_v"),
        explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("event_time"), col("row"),
        pmod(graft.ops.Dedup.md5Int(
          concat(col("row").cast("string"), lit(":"), col("_v"))), lit(w.toLong))
          .as("bucket"))
      .groupBy(window(col("event_time"), windowLen), col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("row"), col("bucket"),
        col("cnt"))

  /** Arbitrary stateful processing: running per-user counters via
    * `mapGroupsWithState` — the engine's `KeyValueGroupedDataset` custom
    * state surface (processing-time timeout clears idle users).
    */
  def runningUserStats(events: Dataset[Event]): Dataset[UserRunningStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunningStats, UserRunningStats](
        GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[UserRunningStats]) =>
          val prev = state.getOption.getOrElse(UserRunningStats(uid, 0L, 0.0))
          val evList = evs.toSeq
          val next = UserRunningStats(uid,
            prev.n_events + evList.size,
            prev.total_value + evList.map(_.value).sum)
          state.update(next)
          next
      }
  }

  /** Gap-based sessionization as STREAMING state: Spark's native
    * `session_window` merges events into per-user sessions that close
    * after `gap` of inactivity — the streaming twin of the batch q35
    * query. Watermark bounds open-session state; closed sessions emit
    * once (Append mode). Decimal value sums keep the rollup exact.
    */
  def sessionized(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "2 hours"): DataFrame =
    eventTime(events)
      .withWatermark("event_time", lateness)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("sum_val"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_val"))

  /** One buffered event inside [[SessionBufferState]]. */
  case class SessionEvent(ts_us: Long, event_id: Long, value: Double)

  /** Per-user sessionizer state: sessions closed so far (the batch
    * query's `session_seq` continuity — kept for the user's lifetime, a
    * per-user counter, O(users) total) plus the buffered not-yet-closable
    * events (bounded by the open tail: everything older than
    * watermark − gap closes and drains).
    */
  case class SessionBufferState(closed: Long, buf: Seq[SessionEvent])

  /** One emitted session — schema-matches the batch q35 rollup. */
  case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
                        dur_us: Long, sum_val: Double)

  /** Gap-based sessionization as CUSTOM state — `flatMapGroupsWithState`
    * with an event-time timeout, the canonical arbitrary-stateful-
    * streaming workload ([[sessionized]] is the native `session_window`
    * twin; this one reproduces the batch q35 rollup bit-for-bit,
    * including each session's per-user ORDINAL `session_seq`, which no
    * built-in emits).
    *
    * Close rule — watermark-only, never in-hand gaps: a session
    * (maximal run of buffered events with consecutive gaps ≤ `gapUs`)
    * closes exactly when `end + gap < watermark`. An in-hand gap between
    * two buffered runs proves nothing: a future event may still land
    * INSIDE the gap and bridge them (ts ≥ watermark is all the engine
    * guarantees), so runs wait in the buffer until the watermark passes.
    * Closing in ts order per user makes `session_seq` equal the batch
    * ordinal regardless of how arrivals split into micro-batches.
    *
    * Sum semantics mirror the batch query's
    * `round(sum(value::DECIMAL(20,6)), 2)` exactly: each double is
    * rescaled through the same shortest-repr BigDecimal path Spark's
    * cast uses, summed exactly, rounded HALF_UP at the end.
    *
    * The event-time timeout re-fires the group when the watermark
    * advances past `min(open end) + gap`, so sessions drain without new
    * arrivals (StreamingSpec pins the timeout path).
    */
  def sessionizedCustom(events: Dataset[Event],
                        gapUs: Long = 30L * 60 * 1000000L,
                        lateness: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val mc = java.math.MathContext.DECIMAL128
    def closeSessions(uid: Long, state: GroupState[SessionBufferState],
                      incoming: Iterator[Event]): Iterator[SessionOut] = {
      val prev = state.getOption.getOrElse(SessionBufferState(0L, Nil))
      val all = (prev.buf ++ incoming.map(e =>
          SessionEvent(e.ts / 1000L, e.event_id, e.value)))
        .sortBy(e => (e.ts_us, e.event_id))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // split the buffer into gap-runs, close the closable prefix
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var closed = prev.closed
      var open = scala.collection.mutable.ArrayBuffer.empty[SessionEvent]
      var keep = scala.collection.mutable.ArrayBuffer.empty[SessionEvent]
      var blocked = false // once one run stays open, all later runs stay
      def flushRun(): Unit = if (open.nonEmpty) {
        if (!blocked && open.last.ts_us + gapUs < wmUs) {
          closed += 1
          val sum = open.foldLeft(java.math.BigDecimal.ZERO) { (acc, e) =>
            acc.add(new java.math.BigDecimal(
              java.lang.Double.toString(e.value), mc)
              .setScale(6, java.math.RoundingMode.HALF_UP))
          }
          out += SessionOut(uid, closed, open.size.toLong,
            open.last.ts_us - open.head.ts_us,
            sum.setScale(2, java.math.RoundingMode.HALF_UP).doubleValue)
        } else {
          blocked = true
          keep ++= open
        }
        open.clear()
      }
      all.foreach { e =>
        if (open.nonEmpty && e.ts_us - open.last.ts_us > gapUs) flushRun()
        open += e
      }
      flushRun()
      state.update(SessionBufferState(closed, keep.toSeq))
      if (keep.nonEmpty) {
        // re-fire when the watermark can close the earliest open run —
        // i.e. at the FIRST KEPT RUN'S END + gap. Using the run's START
        // stranded sessions (r15 review): with wm ∈ (start+gap, end+gap]
        // the guard skipped re-arming, and an un-armed EventTimeTimeout
        // group is never invoked again without new data for that key —
        // the session (and its state) leaked forever. The first kept run
        // failed its close test, so end+gap ≥ wm and the timestamp is
        // always strictly future; the max() keeps the engine's
        // must-be-past-watermark contract explicit.
        var e = keep.head.ts_us
        var i = 1
        while (i < keep.length && keep(i).ts_us - e <= gapUs) {
          e = keep(i).ts_us; i += 1
        }
        state.setTimeoutTimestamp(
          math.max((e + gapUs) / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
      }
      out.iterator
    }
    eventTime(events.toDF())
      .withWatermark("event_time", lateness)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBufferState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state) =>
          closeSessions(uid, state,
            if (state.hasTimedOut) Iterator.empty else evs)
      }
  }

  /** Exactly-once event intake: drop redelivered `event_id`s. State holds
    * only ids younger than the watermark (`dropDuplicatesWithinWatermark`),
    * so dedup state is bounded by the lateness window — at-least-once
    * upstream delivery becomes exactly-once downstream without unbounded
    * id retention.
    */
  def dedupEvents(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    eventTime(events)
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: attribute each `click` to the same
    * user's `view`s in the preceding hour. Both sides carry watermarks and
    * the join condition has explicit event-time bounds, so Spark evicts
    * buffered rows once the watermark passes the interval — join state is
    * bounded by (lateness + interval) at any stream length, the
    * stream-stream requirement at scale. Works identically on batch
    * frames (the bounds become a plain range predicate).
    */
  def attributionJoin(events: DataFrame, lateness: String = "2 hours"): DataFrame = {
    val views = eventTime(events.where(col("event_type") === "view"))
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("event_time").as("view_time"))
      .withWatermark("view_time", lateness)
    val clicks = eventTime(events.where(col("event_type") === "click"))
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", lateness)
    clicks.join(views,
        col("c_user") === col("v_user") &&
          col("view_time") <= col("click_time") &&
          col("view_time") >= col("click_time") - expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("click_time"), col("view_time"))
  }

  /** Convenience: run `windowedCounts` over a memory-sink stream and block
    * until `numBatches` have been processed (test/demo harness).
    */
  def runToMemory(spark: SparkSession, stream: DataFrame, queryName: String): Unit = {
    val q = windowedCounts(stream)
      .writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
