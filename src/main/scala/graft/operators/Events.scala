package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics over the events table (batch duals of streaming
 * windowed aggregation; the reference's analog is Recon's incremental
 * aggregation over the OM change stream, OMDBUpdatesHandler.java:71-99 +
 * OmTableInsightTask.java — see graft.streaming for the incremental layer).
 *
 * Scale design: tumbling windows are a single groupBy on (window, type) —
 * map-side combinable; sessionization is one shuffle on user_id followed by
 * window functions within each user partition, the batch dual of
 * flatMapGroupsWithState. Value sums are integer cents for oracle parity.
 */
object Events {

  /** Schema of the normalized events stream (user_id is INT64 in the
    * events parquet — a mis-declared type only stays harmless while no
    * operator reads the column). One constant for every stream reader. */
  val EventsSchema = "event_id BIGINT, user_id BIGINT, event_type STRING, " +
    "value DOUBLE, ts_ms BIGINT"

  /** Tumbling hourly counts by event type — the batch dual of the streaming
    * windowed aggregation (oracle for the streaming spec). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withColumn("hour_start_ms", expr("ts_ms DIV 3600000 * 3600000"))
      .withColumn("cents", floor(col("value") * 100).cast("long"))
      .groupBy("hour_start_ms", "event_type")
      .agg(
        count(lit(1)).as("event_count"),
        sum("cents").as("value_cents"))
      .orderBy("hour_start_ms", "event_type")

  /** Native session windows (session_window(ts, gap)): the idiomatic Spark
    * form of gap-based sessionization — identical session boundaries to
    * [[sessionize]] (window end = last event + gap), and the SAME expression
    * works under Structured Streaming with a watermark. */
  def sessionWindows(events: DataFrame, gapMs: Long = 1800000L): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      // session_window's interval is half-open (an event at exactly
      // last+gap opens a NEW session) while sessionize splits only on
      // gap > gapMs — gap+1ms aligns the two semantics exactly
      .groupBy(col("user_id"), session_window(col("ts"), s"${gapMs + 1} milliseconds"))
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_ms").as("start_ms"),
        max("ts_ms").as("end_ms"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))
      .select("user_id", "n_events", "start_ms", "end_ms", "value_cents")
      .orderBy("user_id", "start_ms")

  /** One closed session (typed custom-state output). */
  final case class Session(user_id: String, n_events: Long, start_ms: Long,
                           end_ms: Long, value_cents: Long)

  /**
   * Typed sessionization as an O(1)-state ITERATOR FOLD over
   * secondary-sorted input: one shuffle on user_id, an in-partition sort by
   * (user, ts), then a lazy mapPartitions scan that closes a session when
   * the gap exceeds `gapMs` or the user changes. No per-user buffering —
   * a user with 10⁸ events streams through in constant memory (a
   * flatMapGroupsWithState batch fold would have to materialize and sort
   * the whole group, since batch group iterators are unordered; the
   * genuinely streaming gap-session path is [[sessionWindows]]'
   * session_window under a watermark). Same output as [[sessionize]] minus
   * the per-user session ordinal.
   */
  def sessionizeTyped(spark: org.apache.spark.sql.SparkSession,
                      events: DataFrame, gapMs: Long = 1800000L)
      : org.apache.spark.sql.Dataset[Session] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts_ms"),
        floor(col("value") * 100).cast("long").as("cents"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts_ms", "cents")
      .as[(String, Long, Long)]
      .mapPartitions { rows =>
        // sentinel-terminated fold: emit a session the moment it closes
        var open = false
        var user = ""
        var start, last, n, cents = 0L
        (rows.map(Some(_)) ++ Iterator(None)).flatMap {
          case Some((u, ts, c)) =>
            if (!open) {
              open = true; user = u; start = ts; last = ts; n = 1; cents = c
              Iterator.empty
            } else if (u != user || ts - last > gapMs) {
              val closed = Session(user, n, start, last, cents)
              user = u; start = ts; last = ts; n = 1; cents = c
              Iterator.single(closed)
            } else { last = ts; n += 1; cents += c; Iterator.empty }
          case None =>
            if (open) Iterator.single(Session(user, n, start, last, cents))
            else Iterator.empty
        }
      }
  }

  /** Open-session state carried across micro-batches. */
  final case class OpenSession(start_ms: Long, last_ms: Long, n: Long,
                               cents: Long)

  /**
   * STREAMING typed sessionizer via flatMapGroupsWithState — the
   * KeyValueGroupedDataset custom-state API in its proper habitat: state
   * lives ACROSS micro-batches (an open session carries over until a gap
   * or an event-time timeout closes it), and the per-invocation sort is
   * bounded by one user's events in ONE micro-batch (trigger-sized),
   * never their full history — the unbounded-buffer trap the batch
   * [[sessionizeTyped]] avoids with a secondary sort doesn't arise.
   * Drains `srcDir` (parquet events) with AvailableNow, appends CLOSED
   * sessions to `outDir`; sessions still open when the stream runs dry
   * stay in state (they'd emit on the next run's timeout).
   */
  def sessionizeStream(spark: org.apache.spark.sql.SparkSession,
                       srcDir: String, outDir: String, workDir: String,
                       gapMs: Long = 1800000L): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
    val src = spark.readStream
      .schema(EventsSchema)
      .option("maxFilesPerTrigger", 2)
      .parquet(srcDir)
    val sessions = src
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "2 hours")
      // the watermarked ts column must SURVIVE into the grouped Dataset or
      // Spark rejects the event-time timeout
      .select(col("user_id").cast("string"), col("ts_ms"),
        floor(col("value") * 100).cast("long").as("cents"), col("ts"))
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: String, rows: Iterator[(String, Long, Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: session closed
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.n, s.start_ms, s.last_ms, s.cents))
          } else {
            // ONE micro-batch's slice of this user — trigger-bounded
            val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = state.getOption
            sorted.foreach { case (_, ts, c, _) =>
              cur match {
                case Some(s) if ts - s.last_ms > gapMs =>
                  out += Session(user, s.n, s.start_ms, s.last_ms, s.cents)
                  cur = Some(OpenSession(ts, ts, 1L, c))
                case Some(s) =>
                  // monotone bounds: an out-of-order event INSIDE the open
                  // window (possible when file arrival order deviates from
                  // event time) must never move last_ms backward — that
                  // would both split the session on the next gap check and
                  // emit an end_ms before an absorbed event
                  cur = Some(OpenSession(math.min(s.start_ms, ts),
                    math.max(s.last_ms, ts), s.n + 1, s.cents + c))
                case None =>
                  cur = Some(OpenSession(ts, ts, 1L, c))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // must be strictly beyond the current watermark or Spark
              // rejects the timeout; the open session then closes as soon
              // as the watermark passes its gap horizon
              state.setTimeoutTimestamp(
                math.max(s.last_ms + gapMs, state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
        })
    val q = sessions.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$workDir/ckpt_sessions")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Gap-based sessionization (30-min inactivity): per user, a new session
    * starts when the gap to the previous event exceeds the timeout — the
    * batch dual of mapGroupsWithState session windows. */
  def sessionize(events: DataFrame, gapMs: Long = 1800000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    events
      .withColumn("prev_ts", lag("ts_ms", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_ms").as("start_ms"),
        max("ts_ms").as("end_ms"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))
      .orderBy("user_id", "session_id")
  }
}
