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
